package graft

import org.apache.spark.sql.functions._

/** Minhash band-bucket mass probe (VERDICT r15 → r16 #1): measures, per
  * corpus, the band self-join's candidate mass Σ_b c_b(c_b−1)/2, its
  * per-doc density, the bucket-size tail, and how much of the mass sits
  * in buckets above candidate df caps — the measurements that decide the
  * `graft.maxBandJoinRows` fence default and the hot-band cap for the
  * capped twin. Also profiles full-signature groups (signature-identical
  * doc clusters), the twin's cheap recovery path on duplicate-saturated
  * corpora.
  *
  * Usage: `runMain graft.BandMass <sfDir>`
  */
object BandMass {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: BandMass <sfDir>")
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val spark = GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.queries.SimilarityQueries.{Perms, Bands, ShingleN}
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .repartition(spark.sparkContext.defaultParallelism)
    val nDocs = docs.count()
    val lenR = docs.agg(sum(length($"text")), max(length($"text"))).head()
    val shd = docs.select($"doc_id",
      graft.functions.Text.shingleSet($"text", ShingleN).as("sh"))
    val tSh0 = System.nanoTime()
    val shR = shd.agg(sum(size($"sh")), max(size($"sh"))).head()
    val tShingle = (System.nanoTime() - tSh0) / 1e9
    val tSig0 = System.nanoTime()
    val nSigRows = shd.select(graft.functions.HashExpr.minhashSig(
      graft.functions.Text.shingleHashes($"sh"), Perms).as("sig")).count()
    val tSig = (System.nanoTime() - tSig0) / 1e9
    val bands = shd.select($"doc_id",
      explode(graft.functions.Text.minhashBands($"sh", Perms, Bands)).as("band"))
    val bc = bands.groupBy($"band").agg(count(lit(1)).as("c")).persist()
    def massOver(cap: Long) =
      bc.filter($"c" > cap)
        .agg(coalesce(sum(expr("c * (c - 1) div 2")), lit(0L)),
          coalesce(sum($"c"), lit(0L)), count(lit(1)))
        .head()
    val all = massOver(0L)
    val (mass, postings, buckets) = (all.getLong(0), all.getLong(1), all.getLong(2))
    val maxC = bc.agg(max($"c")).head().getLong(0)
    val tail = Seq(16L, 64L, 256L, 1024L).map { cap =>
      val r = massOver(cap)
      f""""over$cap":{"mass":${r.getLong(0)},"postings":${r.getLong(1)},"buckets":${r.getLong(2)}}"""
    }.mkString(",")
    // full-signature groups: the twin's duplicate-cluster recovery grain
    val sigGroups = shd.select(
      graft.functions.HashExpr.minhashSig(
        graft.functions.Text.shingleHashes($"sh"), Perms).as("sig"))
      .groupBy($"sig").agg(count(lit(1)).as("k"))
      .agg(count(lit(1)).as("groups"), max($"k").as("maxk"),
        coalesce(sum(expr("k * (k - 1) div 2")), lit(0L)).as("sigpairs"))
      .head()
    bc.unpersist()
    println(
      s"""{"dir":"$dir","docs":$nDocs,"band_buckets":$buckets,"postings":$postings,""" +
        s""""mass":$mass,"mass_per_doc":${mass / math.max(nDocs, 1)},"max_bucket":$maxC,""" +
        s"""$tail,"sig_groups":${sigGroups.getLong(0)},"sig_maxk":${sigGroups.getLong(1)},""" +
        s""""sig_pairs":${sigGroups.getLong(2)},""" +
        s""""sum_len":${lenR.getLong(0)},"max_len":${lenR.get(1)},""" +
        s""""sum_sh":${shR.getLong(0)},"max_sh":${shR.get(1)},""" +
        f""""t_shingle":$tShingle%.2f,"t_sig":$tSig%.2f,"sig_rows":$nSigRows}""")
    spark.stop()
  }
}
