package graft

/** Candidate-pair scaling probe (VERDICT r9 → r10 #1): runs the banded
  * near-dup pair generators at a given sf dir and reports the fused
  * `observe()` candidate counts ([[graft.queries.SimilarityQueries
  * .observedPairCount]]) as one JSON line per key — the measurement that
  * decides whether decade-level runtime growth is candidate blowup (a
  * banding defect) or corpus saturation (a data property the fences
  * already guard).
  *
  * Usage: `runMain graft.PairScale <sfDir> [comma-keys]`
  */
object PairScale {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PairScale <sfDir> [keys]")
    val dir = args(0)
    val keys: Seq[String] =
      if (args.length > 1) args(1).split(",").toSeq
      else Seq("dedup_simhash", "dedup_substring_runs", "dedup_minhash_lsh",
        "dedup_semantic")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val spark = GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    val nVecs = spark.read.parquet(s"$dir/embeddings.parquet").count()
    keys.foreach { k =>
      val t0 = System.nanoTime()
      val df = graft.queries.SimilarityQueries.queries(k)(spark, dir)
      graft.Bench.exec(df) // full-plan terminal — count() prunes (see Bench.exec)
      val out = df.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val pairs = graft.queries.SimilarityQueries.observedPairCount(k)
      val base = if (k.startsWith("dedup_sem")) nVecs else nDocs
      val ppr = pairs.map(_.toDouble / base).getOrElse(-1.0)
      println(f"""{"key":"$k","dir":"$dir","rows":$base,"out_rows":$out,"cand_pairs":${pairs.getOrElse(-1L)},"pairs_per_row":$ppr%.2f,"sec":$sec%.2f}""")
    }
    spark.stop()
  }
}
