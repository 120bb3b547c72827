package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract / resize /
  * frame-sample operators.
  *
  * The actual codec work is STUBBED (no image/audio libs in this
  * environment): [[fakeDecode]] derives deterministic pseudo-features from
  * the bytes so the pipeline shape — schema, partition sizing, batch
  * iteration, explode fan-out — is real and testable. Swapping in a real
  * decoder only replaces the marked function bodies.
  *
  * Scale design: media rows are large (MBs); [[repartitionForMedia]] sizes
  * partitions by byte budget, not row count, so executors never hold more
  * than ~`targetBytes` of payload per task. Feature extraction is
  * per-row/narrow — no shuffle.
  */
object Multimodal {

  /** Canonical schema for a media table at rest. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType), // image | audio | video
    StructField("content", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("duration_ms", LongType))))))

  /** Byte-budget repartition: media payloads are heavy, so partition count
    * derives from total bytes, not rows. */
  def repartitionForMedia(df: DataFrame, targetBytesPerPartition: Long = 128L << 20): DataFrame = {
    // coalesce: sum over zero rows is NULL — an empty media frame sizes to 0
    val totalBytes = df.agg(coalesce(sum(length(col("content"))), lit(0L)))
      .head().getLong(0)
    val parts = math.max(1, (totalBytes / targetBytesPerPartition).toInt)
    df.repartition(parts, col("media_id"))
  }

  /** STUB decode: deterministic pseudo-features from the raw bytes — a
    * real decoder would parse the codec here. Pure Column expressions
    * (codegen'd, no serialization boundary). */
  def fakeDecode(content: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    struct(
      length(content).as("n_bytes"),
      crc32(content).as("checksum"),
      // STUB: stand-ins for decoded plane statistics
      (pmod(xxhash64(content), lit(256L))).cast("int").as("mean_luma"),
      (pmod(xxhash64(content, lit(1)), lit(100L)).cast("double") / 100.0).as("sharpness"))

  /** Image feature extraction over the media table (schema in, schema out —
    * the declared output contract a real model/codec would fill). */
  def imageFeatures(media: DataFrame): DataFrame =
    media.filter(col("kind") === "image")
      .select(col("media_id"), col("meta.width").as("width"),
        col("meta.height").as("height"), fakeDecode(col("content")).as("f"))
      .select(col("media_id"), col("width"), col("height"),
        col("f.n_bytes"), col("f.checksum"), col("f.mean_luma"), col("f.sharpness"))

  /** "Resize": metadata transform + STUB re-encode (identity bytes). A real
    * implementation swaps the content expression for a codec call; the
    * plan shape (narrow projection) is identical. */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame =
    media.withColumn("meta",
      col("meta").withField("width", lit(w)).withField("height", lit(h)))

  /** Frame sampling for video rows: one output row per sampled frame index
    * — `explode(sequence(...))` fan-out, the distributed equivalent of a
    * per-file frame loop. Frame payload is STUB (slice of source bytes). */
  def sampleFrames(media: DataFrame, everyMs: Long): DataFrame =
    media.filter(col("kind") === "video")
      .select(col("media_id"), col("meta.duration_ms").as("duration_ms"),
        col("content"),
        explode(sequence(lit(0L), col("meta.duration_ms"), lit(everyMs))).as("frame_ms"))
      .select(col("media_id"), col("frame_ms"),
        // STUB: a real impl decodes the frame at frame_ms
        substring(col("content"), (pmod(col("frame_ms"), lit(32L)) + 1).cast("int"), lit(16))
          .as("frame_bytes"))

  final case class MediaRow(media_id: Long, kind: String, content: Array[Byte])
  final case class DecodedRow(media_id: Long, n_bytes: Int, head_sum: Long)

  /** The imperative per-partition seam — where a JNI/native decoder that
    * needs batch reuse (shared codec context per partition) would plug in.
    * Demonstrates the mapPartitions batch shape with an explicit Encoder;
    * kept off the hot path for everything expressible as Columns. */
  def decodeViaPartitions(media: Dataset[MediaRow]): Dataset[DecodedRow] = {
    implicit val enc = Encoders.product[DecodedRow]
    media.mapPartitions { rows =>
      // STUB: per-partition "codec init" happens once here
      rows.map { r =>
        DecodedRow(r.media_id, r.content.length,
          r.content.take(64).foldLeft(0L)((a, b) => a + (b & 0xff)))
      }
    }
  }
}
