package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Vectors

/** Multimodal-column queries — the oracle-checkable face of
  * [[graft.operators.Multimodal]]. A deterministic media table is derived
  * from `documents` (content = the text's bytes as a true `binary` column,
  * kind/meta from doc_id), so the binary-column plumbing — opaque payload
  * + typed metadata + per-row feature extraction + frame fan-out — runs
  * for real while DuckDB can replay every output value from the text.
  * The codec-dependent stubs stay in Multimodal (spec-tested); what's
  * here is the part of the pipeline whose values are engine-independent.
  */
object MediaQueries {

  private type Q = (SparkSession, String) => DataFrame

  def queries: Map[String, Q] = Map(
    "mm_media_features" -> mmMediaFeatures,
    "mm_frame_sample" -> mmFrameSample
  )

  /** Deterministic media table: binary payload + kind + typed metadata. */
  private def media(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "documents").select(
      $"doc_id".as("media_id"),
      when($"doc_id" % 3 === 0, "image")
        .when($"doc_id" % 3 === 1, "audio").otherwise("video").as("kind"),
      $"text".cast("binary").as("content"),
      struct(($"doc_id" % 640 + 1).cast("int").as("width"),
        ($"doc_id" % 480 + 1).cast("int").as("height")).as("meta"))
  }

  /** Per-row feature extraction over the binary column: byte length,
    * content fingerprint, and a pseudo plane statistic. Narrow map —
    * no shuffle; at 100 TB of media this is the shape that matters
    * (payload never crosses the network, features do). */
  private val mmMediaFeatures: Q = (s, dir) => {
    import s.implicits._
    media(s, dir).select(
        $"media_id", $"kind",
        $"meta.width".as("width"), $"meta.height".as("height"),
        length($"content").as("n_bytes"),
        md5($"content").as("fingerprint"),
        pmod(Vectors.hash60(md5($"content")), lit(256L)).as("mean_luma"))
      .orderBy($"media_id")
  }

  /** Frame-sampling fan-out: one row per 500 ms frame index of each video
    * — explode(sequence(...)), the distributed equivalent of a per-file
    * frame loop. Fan-out happens executor-side after the kind filter. */
  private val mmFrameSample: Q = (s, dir) => {
    import s.implicits._
    media(s, dir).filter($"kind" === "video")
      .select($"media_id", (length($"content") * 10).as("duration_ms"))
      .select($"media_id", $"duration_ms",
        explode(sequence(lit(0), $"duration_ms", lit(500))).as("frame_ms"))
      .orderBy($"media_id", $"frame_ms")
  }

  def oracle: Map[String, String] = Map(
    "mm_media_features" ->
      """SELECT doc_id AS media_id,
        | CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        | CAST(doc_id % 640 + 1 AS INT) AS width,
        | CAST(doc_id % 480 + 1 AS INT) AS height,
        | octet_length(encode(text)) AS n_bytes,
        | md5(text) AS fingerprint,
        | CAST(CONCAT('0x', SUBSTR(md5(md5(text)), 1, 15)) AS BIGINT) % 256 AS mean_luma
        |FROM documents ORDER BY media_id""".stripMargin,

    "mm_frame_sample" ->
      """SELECT doc_id AS media_id,
        | octet_length(encode(text)) * 10 AS duration_ms,
        | unnest(generate_series(0, octet_length(encode(text)) * 10, 500)) AS frame_ms
        |FROM documents WHERE doc_id % 3 = 2
        |ORDER BY media_id, frame_ms""".stripMargin
  )
}
