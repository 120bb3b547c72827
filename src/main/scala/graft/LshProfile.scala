package graft

import org.apache.spark.sql.functions._

/** Stage-level wall profile of the minhash-banded dedup pipeline
  * (VERDICT r15 → r16 #1): BandMass measured the band-bucket candidate
  * mass LINEAR on every graded corpus (0.09 pairs/doc flat, max bucket
  * 19 at skew10), so the family's super-linear decade cannot be join
  * mass — this isolates which stage's wall actually grows: shingling,
  * banding+shuffle, candidate distinct, or the two wide shingle-array
  * verify joins. Each stage runs twice in a warm JVM; the second wall
  * is reported (first run pays codegen+page-cache).
  *
  * Usage: `runMain graft.LshProfile <sfDir>`
  */
object LshProfile {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: LshProfile <sfDir>")
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.queries.SimilarityQueries.{Perms, Bands, ShingleN}

    def timed(label: String)(mk: => org.apache.spark.sql.DataFrame): Double = {
      var last = 0.0
      var rows = 0L
      for (_ <- 1 to 2) {
        val t0 = System.nanoTime()
        rows = mk.count()
        last = (System.nanoTime() - t0) / 1e9
      }
      println(f"""{"stage":"$label","sec":$last%.2f,"rows":$rows}""")
      last
    }

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .repartition(spark.sparkContext.defaultParallelism)
    def shd = docs.select($"doc_id",
      graft.functions.Text.shingleSet($"text", ShingleN).as("sh"))
    def bands = shd.select($"doc_id",
      explode(graft.functions.Text.minhashBands($"sh", Perms, Bands)).as("band"))
    def cand = bands.as("a").hint("shuffle_hash")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    def verified = cand
      .join(shd.select($"doc_id".as("doc_a"), $"sh".as("sha")), Seq("doc_a"))
      .join(shd.select($"doc_id".as("doc_b"), $"sh".as("shb")), Seq("doc_b"))
      .withColumn("inter", size(array_intersect($"sha", $"shb")))
      .select($"doc_a", $"doc_b",
        ($"inter" / (size($"sha") + size($"shb") - $"inter")).as("jaccard"))
      .filter($"jaccard" >= 0.5)

    timed("shingle")(shd)
    timed("bands")(bands)
    timed("cand_distinct")(cand)
    timed("verified_full")(verified)
    spark.stop()
  }
}
