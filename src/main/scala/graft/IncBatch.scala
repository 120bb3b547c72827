package graft

/** Index-size-freedom measurement for the appended-batch incremental
  * family (VERDICT r15 #4): the `_batch` keys' 3n/4 split grows the batch
  * with the corpus, so their bench decade conflates batch cost with index
  * cost. This main holds the BATCH FIXED (the last `batch` ids) and swaps
  * the INDEX underneath it — run at skew1 (≈37.5 k index) and skew10
  * (≈487.5 k index): if batch-2 wall is ~flat across the decade, the
  * maintenance claim ("cost scales with the batch, not the index") is
  * measured, not argued. Build runs untimed; the probe runs twice and the
  * second wall is reported (codegen/page-cache warmup).
  *
  * Usage: `runMain graft.IncBatch <sfDir> [batchRows]`
  */
object IncBatch {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: IncBatch <sfDir> [batchRows]")
    val dir = args(0)
    val batch = if (args.length > 1) args(1).toLong else 12500L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.queries.{SimilarityQueries => SQ, TextQueries => TQ}
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    val nVecs = spark.read.parquet(s"$dir/embeddings.parquet").count()

    def timed(key: String, index: Long)(build: => Unit)(
        probe: => org.apache.spark.sql.DataFrame): Unit = {
      build
      var last = 0.0
      var rows = 0L
      for (_ <- 1 to 2) {
        val t0 = System.nanoTime()
        rows = probe.count()
        last = (System.nanoTime() - t0) / 1e9
      }
      println(f"""{"key":"$key","dir":"$dir","index_rows":$index,"batch_rows":$batch,"probe_sec":$last%.2f,"out_rows":$rows}""")
    }

    val dSplit = nDocs - batch
    val vSplit = nVecs - batch
    timed("dedup_minhash_incremental_batch", dSplit)(
      SQ.minhashBatchBuild(spark, dir, dSplit))(
      SQ.minhashBatchProbe(spark, dir, dSplit))
    timed("dedup_paragraph_incremental_batch", dSplit)(
      TQ.paragraphBatchBuild(spark, dir, dSplit))(
      TQ.paragraphBatchProbe(spark, dir, dSplit))
    timed("dedup_semantic_incremental_batch", vSplit)(
      SQ.semanticBatchBuild(spark, dir, vSplit))(
      SQ.semanticBatchProbe(spark, dir, vSplit))
    timed("ann_ivf_incremental_batch", vSplit)(
      SQ.ivfBatchBuild(spark, dir, vSplit))(
      SQ.ivfBatchProbe(spark, dir, vSplit))
    spark.stop()
  }
}
