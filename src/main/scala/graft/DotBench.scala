package graft

import org.apache.spark.sql.functions._

/** Micro A/B for the r17 codegen dot: times an icos projection over
  * synthetic quantized vectors in both forms (HOF aggregate(zip_with) vs
  * VecExpr.ldot) at two dims, through the noop sink.
  * Usage: runMain graft.DotBench [rows] [reps]
  */
object DotBench {
  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toLong else 3000000L
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = GraftSession.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def hof(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), _ + _)
    def icosOf(dot: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) =>
        org.apache.spark.sql.Column)(a: org.apache.spark.sql.Column,
        b: org.apache.spark.sql.Column) =
      dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
    for (dim <- Seq(8, 64)) {
      val df = spark.range(rows).select($"id",
        transform(sequence(lit(0), lit(dim - 1)),
          i => (i * 31 + $"id" % 1000).cast("bigint")).as("qv"),
        transform(sequence(lit(0), lit(dim - 1)),
          i => (i * 17 + $"id" % 997).cast("bigint")).as("cv"))
        .localCheckpoint()
      for ((name, dot) <- Seq(
          ("hof ", hof _),
          ("ldot", (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
            graft.functions.VecExpr.ldot(a, b)))) {
        val q = df.select(icosOf(dot)($"qv", $"cv").as("c"))
          .agg(sum($"c"))
        Bench.exec(q.toDF()) // warmup
        val times = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          Bench.exec(q.toDF())
          (System.nanoTime() - t0) / 1e9
        }
        println(f"dim=$dim $name min=${times.min}%.3f s all=${times.map(t => f"$t%.2f").mkString(",")}")
      }
    }
    spark.stop()
  }
}
