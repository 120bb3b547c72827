package graft

import java.nio.file.{Files, Paths}

/** Writes each named query's `.explain("formatted")` output to
  * `<outDir>/<query>_<tag>.txt` — the before/after plan evidence the
  * optimization rounds commit under plans/. No timed runs (Explain does
  * that); building the DataFrame still executes any eager sub-jobs the
  * operator runs (checkpoints, probes), so plans reflect what the bench
  * sees.
  *
  * Usage: runMain graft.PlanDump <query[,query...]> <outDir> <tag> [sfDir]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <query[,...]> <outDir> <tag> [sfDir]")
    val names = args(0).split(",").toSeq
    val outDir = args(1)
    val tag = args(2)
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"$outDir/${n}_$tag.txt"), plan)
      println(s"[plandump] wrote $outDir/${n}_$tag.txt (${plan.length} chars)")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
