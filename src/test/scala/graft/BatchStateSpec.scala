package graft

import graft.queries.{BatchState, ExtendedQueries, SimilarityQueries, TextQueries}

/** Appended-batch protocol contract (VERDICT r15 #4): the `_batch` twins
  * must produce the same verdicts as their single-shot siblings while
  * genuinely routing the index through PERSISTED state — build writes,
  * probe reads back. Equality pins the protocol refactor; the landed-state
  * read path is what the DuckDB oracles gate (they read the same files).
  */
class BatchStateSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("minhash batch twin ≡ single-shot incremental verdicts") {
    val a = rows(SimilarityQueries.queries("dedup_minhash_incremental")(spark, sfDir))
    val b = rows(SimilarityQueries.queries("dedup_minhash_incremental_batch")(spark, sfDir))
    assert(a == b, "persisted-index probe drifted from the single-shot verdict")
  }

  test("paragraph batch twin ≡ single-shot incremental verdicts") {
    val a = rows(TextQueries.queries("dedup_paragraph_incremental")(spark, sfDir))
    val b = rows(TextQueries.queries("dedup_paragraph_incremental_batch")(spark, sfDir))
    assert(a == b)
  }

  test("ivf batch twin ≡ single-shot incremental cell profile") {
    val a = rows(SimilarityQueries.queries("ann_ivf_incremental")(spark, sfDir))
    val b = rows(SimilarityQueries.queries("ann_ivf_incremental_batch")(spark, sfDir))
    assert(a == b, "frozen-codebook assignment from landed centroids drifted")
  }

  test("scd2 batch twin ≡ apply ≡ one-shot rebuild") {
    val a = rows(ExtendedQueries.queries("scd2_apply")(spark, sfDir))
    val b = rows(ExtendedQueries.queries("scd2_apply_batch")(spark, sfDir))
    assert(a == b, "apply over persisted standing history drifted from rebuild")
  }

  test("semantic batch twin: index-build-time bits, complete verdicts") {
    // bits freeze at lshBitsFor(split) — NOT the grown corpus — so the
    // twin's candidate set can legitimately differ from the single-shot
    // key; its own oracle pins values. Pin here: one verdict per appended
    // vector, matches only point at the index side, and a re-run over the
    // overwritten state is identical (deterministic persist).
    val out = SimilarityQueries.queries("dedup_semantic_incremental_batch")(spark, sfDir)
      .collect()
    val n = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    val split = 3L * n / 4L
    assert(out.length == (n - split).toInt, "one verdict row per appended vector")
    assert(out.forall(r => r.getLong(0) >= split), "verdicts keyed by newcomers")
    assert(out.forall(r => r.isNullAt(1) || r.getLong(1) < split),
      "a match must point at the persisted index side")
    val again = SimilarityQueries.queries("dedup_semantic_incremental_batch")(spark, sfDir)
      .collect()
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq,
      "overwrite-then-reread must be deterministic")
  }

  test("landed state is real parquet under the per-process root") {
    SimilarityQueries.queries("dedup_minhash_incremental_batch")(spark, sfDir).count()
    val hs = new java.io.File(s"${BatchState.root}/mh_hs")
    val bands = new java.io.File(s"${BatchState.root}/mh_bands")
    assert(hs.isDirectory && bands.isDirectory,
      s"index artifacts missing under ${BatchState.root}")
    assert(spark.read.parquet(hs.toString).columns.sameElements(Array("doc_id", "hs")))
  }
}
