package graft

/** Fingerprint-path output dump: like [[Verify]] but WITHOUT the
  * coalesce(1) the pandas gate wants — multi-part parquet, so outputs in
  * the tens of millions of rows (the skew-corpus interval joins emit
  * 38 M+ matched rows at skew10, ~10× that at skew100) dump at full
  * parallelism. Graded by `tools/fingerprint_check.py`: DuckDB computes an
  * order-independent (count, hash-sum) fingerprint over this parquet AND
  * over the oracle SQL replay on the same corpus — the r15 protocol that
  * graded the 38 M-row skew10 interval joins when the driver gate's
  * canonicalization path blew its memory/time budget (PERF.md r15).
  *
  * Usage: Dump <sfDir> <outDir> <comma,separated,keys>
  */
object Dump {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: Dump <sfDir> <outDir> <comma,separated,keys>")
    val (sfDir, outDir) = (args(0), args(1))
    val keys = args(2).split(",").toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val missing = keys -- SparkEntry.queries.keySet
    require(missing.isEmpty, s"unknown keys: ${missing.mkString(",")}")
    SparkEntry.queries.filter(k => keys(k._1)).foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.mode("overwrite").parquet(s"$outDir/$name")
      System.err.println(f"[dump] $name ${(System.nanoTime() - t0) / 1e9}%.1fs")
    }
    spark.stop()
  }
}
