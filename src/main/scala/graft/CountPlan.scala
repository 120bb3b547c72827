package graft

/** Bench-fidelity diagnostic: for each query, compare the operator
  * footprint of the plan a bare `count()` executes against the full
  * output plan. A count() that drops joins/aggregates the output plan
  * has means a count-driven benchmark (or fused probe) is NOT measuring
  * the real query — the semdedup verdict-join elimination found in r10.
  * Usage: runMain graft.CountPlan <comma-keys|ALL> [sfDir]
  */
object CountPlan {
  private def ops(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : Map[String, Int] =
    plan.collect { case n => n.nodeName }
      .groupBy(identity).view.mapValues(_.size).toMap

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = GraftSession.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val keys =
      if (args.isEmpty || args(0) == "ALL") SparkEntry.queries.keys.toSeq.sorted
      else args(0).split(",").toSeq
    keys.foreach { k =>
      try {
        val df = SparkEntry.queries(k)(spark, sfDir)
        val full = ops(df.queryExecution.optimizedPlan)
        val counted = ops(df.groupBy().count().queryExecution.optimizedPlan)
        val lost = (for {
          op <- Seq("Join", "Aggregate", "Window", "Generate", "CollectMetrics")
          f = full.getOrElse(op, 0)
          c = counted.getOrElse(op, 0) - (if (op == "Aggregate") 1 else 0)
          if c < f
        } yield s"$op $f->${math.max(c, 0)}").mkString(", ")
        if (lost.nonEmpty) println(s"PRUNED $k: $lost")
        else println(s"ok     $k")
      } catch { case e: Throwable => println(s"skip   $k: ${e.getClass.getSimpleName}") }
    }
    spark.stop()
  }
}
