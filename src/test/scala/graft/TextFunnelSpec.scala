package graft

import graft.queries.TextQueries

/** Branch coverage for the pipeline_doc_filter funnel: the sf corpora
  * contain no exact duplicates or boilerplate-ratio docs, so those gates
  * never fire under the DuckDB oracle — pin them on a constructed corpus,
  * including the first-fail precedence (a short duplicate must report
  * 'duplicate', the gate that fires first in the canonical order). */
class TextFunnelSpec extends SparkSpec {

  test("doc filter fires every gate with first-fail precedence") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_funnel").toString
    // 24 tokens, all from Text.stopwords → ratio 1.0 > 0.2, length ≥ 20
    val boiler = (("the and is of to in a it " * 3).trim)
    val long = (1 to 30).map(i => s"word$i").mkString(" ")
    Seq(
      (0L, long, "en", "src0", long.length.toLong),
      (1L, long, "en", "src0", long.length.toLong), // exact dup of 0
      (2L, "tiny doc", "en", "src0", 8L), // short
      (3L, boiler, "en", "src0", boiler.length.toLong), // boilerplate
      (4L, "tiny doc", "en", "src0", 8L)) // short AND dup of 2
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextQueries.queries("pipeline_doc_filter")(spark, dir)
      .collect().map(r => r.getLong(0) -> Option(r.getString(2))).toMap
    assert(out(0L) === None, "keeper of the dup group must pass")
    assert(out(1L) === Some("duplicate"))
    assert(out(2L) === Some("short"))
    assert(out(3L) === Some("boilerplate"))
    assert(out(4L) === Some("duplicate"), "first-fail: duplicate wins over short")
  }

  test("dedup_paragraph drops shared paragraphs, keeps first occurrence, reassembles in order") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_para").toString
    Seq(
      (0L, "a b c d e f g h", "en", "src0", 15L),      // 2 paragraphs, both fresh
      (1L, "a b c d x y z w", "en", "src0", 15L),      // shares para 0 with doc 0
      (2L, "a b c d e f g h", "en", "src0", 15L),      // exact dup of doc 0
      (3L, "p q r", "en", "src0", 5L))                 // one partial paragraph
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextQueries.queries("dedup_paragraph")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(0L) === ((2L, 2L, "a b c d e f g h")), "first occurrence keeps everything")
    assert(out(1L) === ((2L, 1L, "x y z w")), "shared paragraph removed, rest reassembled")
    assert(out(2L) === ((2L, 0L, "")), "full duplicate empties out")
    assert(out(3L) === ((1L, 1L, "p q r")), "short tail forms its own paragraph")
    // conservation: globally, kept paragraphs == distinct paragraphs
    val full = TextQueries.queries("dedup_paragraph")(spark, sfDir).collect()
    val kept = full.map(_.getLong(2)).sum
    import org.apache.spark.sql.functions._
    import graft.functions.Text
    val toks = Text.tokens(Text.normalized(col("text")))
    val paras = Tables(spark, sfDir, "documents").select(
      explode(transform(
        sequence(lit(0), ((size(toks) + 3) / 4).cast("int") - 1),
        g => array_join(slice(toks, g * 4 + 1, lit(4)), " "))).as("p"))
      .select(countDistinct(col("p"))).head.getLong(0)
    assert(kept === paras, s"kept $kept != distinct paragraphs $paras")
  }

  test("text_winnowing: documents sharing a k+w-1 token run share a fingerprint") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_winnow").toString
    // docs 0 and 1 share a 6-token run (k=3, w=4 → k+w−1=6) embedded in
    // otherwise-disjoint text; doc 2 is fully disjoint; doc 3 too short
    val shared = "alpha beta gamma delta epsilon zeta"
    Seq(
      (0L, s"one two three $shared four five six", "en", "s", 1L),
      (1L, s"seven eight $shared nine ten eleven twelve", "en", "s", 1L),
      (2L, "red orange yellow green blue indigo violet pink", "en", "s", 1L),
      (3L, "tiny doc", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // recompute the SELECTED fingerprint sets (the query emits digests;
    // the guarantee needs the sets, so rebuild them with the same exprs)
    import org.apache.spark.sql.functions._
    import graft.functions.{Text, Vectors}
    val toks = Text.tokens(Text.normalized(col("text")))
    val grams = when(size(toks) >= 3, transform(
      sequence(lit(1), size(toks) - 2),
      i => Vectors.hash60(concat_ws(" ", slice(toks, i, lit(3))))))
      .otherwise(expr("CAST(array() AS ARRAY<BIGINT>)"))
    val mins = when(size(col("grams")) >= 4, transform(
      sequence(lit(1), size(col("grams")) - 3),
      j => array_min(slice(col("grams"), j, lit(4)))))
      .otherwise(expr("CAST(array() AS ARRAY<BIGINT>)"))
    val fps = spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("grams", grams).withColumn("fps", array_distinct(mins))
      .select(col("doc_id"), col("fps")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert((fps(0L) & fps(1L)).nonEmpty,
      "shared 6-token run must select at least one common fingerprint")
    assert((fps(0L) & fps(2L)).isEmpty, "disjoint docs share nothing")
    assert(fps(3L).isEmpty, "too-short doc has no window")
    // and the query's digest row agrees with the recomputed set
    val out = graft.queries.TextQueries.queries("text_winnowing")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(out(0L) === fps(0L).size && out(1L) === fps(1L).size)
  }

  test("dedup_paragraph_incremental: newcomers probe only the existing index") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_parainc").toString
    // 4 docs → split = 3: docs 0-2 are the index, doc 3 is the newcomer.
    // Doc 3 repeats doc 0's first paragraph (known), repeats its OWN
    // second paragraph later (within-batch dup — must NOT count as known),
    // and has one novel paragraph.
    Seq(
      (0L, "a b c d e f g h", "en", "s", 1L),
      (1L, "i j k l", "en", "s", 1L),
      (2L, "m n o p", "en", "s", 1L),
      (3L, "a b c d w x y z w x y z q r s", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextQueries.queries("dedup_paragraph_incremental")(spark, dir).collect()
    assert(out.length === 1 && out.head.getLong(0) === 3L, "only the newcomer reports")
    val r = out.head
    assert(r.getLong(1) === 4L, "4 paragraphs")
    assert(r.getLong(2) === 1L, "only the index hit counts as known — not the self-dup")
    assert(r.getString(3) === "w x y z w x y z q r s",
      "novel text keeps within-batch repeats (the batch key's job, not this one's)")
  }

  test("text_cms_freq: estimates never undercount, and the narrow width does collide") {
    val rows = TextQueries.queries("text_cms_freq")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(3) >= 0L, s"CMS undercounted ${r.getString(0)} — impossible")
      assert(r.getLong(2) === r.getLong(1) + r.getLong(3))
    }
    assert(rows.count(_.getLong(3) > 0L) >= 1,
      "width 32 over the 31-word vocabulary must produce at least one collision")
  }
}
