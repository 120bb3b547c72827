package graft

/** Plan-inspection main: prints the formatted physical plan and three timed
  * runs of one query. Usage: runMain graft.Explain <queryName> [sfDir]. */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Comma-separated names: run each in sequence (reproduces Bench ordering
    // effects); single name: print the formatted plan too.
    val names = name.split(",").toSeq
    if (names.size == 1)
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    names.foreach { n =>
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        // noop terminal, NOT count(): a bare count lets Catalyst prune
        // cardinality-preserving subtrees, timing a lighter query than the
        // bench measures (guide §1.4; the Bench scaladoc has the numbers).
        Bench.exec(SparkEntry.queries(n)(spark, sfDir))
        println(f"[explain] $n run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    spark.stop()
  }
}
