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
}
