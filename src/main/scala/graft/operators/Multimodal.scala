package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract / resize /
  * frame-sample operators.
  *
  * Header decoding is REAL: [[decode]] parses PNG/JPEG/GIF/WAV container
  * headers in pure JVM byte arithmetic
  * ([[graft.functions.MediaHeader]]) — format, dimensions, sample rate.
  * Only pixel/sample-level work (frame extraction, re-encode) remains a
  * marked codec seam: those need a real codec library, and the seam
  * ([[decodeViaPartitions]], [[sampleFrames]]' payload slice) is where a
  * JNI decoder plugs in without changing any plan shape.
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

  /** REAL header decode: PNG/JPEG/GIF/WAV magic bytes → format,
    * dimensions, sample rate ([[graft.functions.MediaHeader]]) plus
    * payload stats — all codegen'd, no serialization boundary. */
  def decode(content: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    struct(
      length(content).as("n_bytes"),
      crc32(content).as("checksum"),
      graft.functions.MediaHeader.mediaHeader(content).as("header"))

  /** Image feature extraction over the media table: declared metadata
    * alongside the header fields ACTUALLY parsed from the payload — the
    * ingest-time cross-check a real pipeline runs (declared w×h vs
    * container w×h). */
  def imageFeatures(media: DataFrame): DataFrame =
    media.filter(col("kind") === "image")
      .select(col("media_id"), col("meta.width").as("width"),
        col("meta.height").as("height"), decode(col("content")).as("f"))
      .select(col("media_id"), col("width"), col("height"),
        col("f.n_bytes"), col("f.checksum"),
        col("f.header.format").as("format"),
        col("f.header.width").as("decoded_width"),
        col("f.header.height").as("decoded_height"))

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
  final case class DecodedRow(media_id: Long, n_bytes: Int, format: String)
  final case class PixelStatsRow(media_id: Long, width: Int, height: Int,
      n_pixels: Long, luma_sum: Long,
      hist_0: Long, hist_1: Long, hist_2: Long, hist_3: Long)

  /** Deterministic planted test image — the MediaHeader test-vector
    * pattern lifted to PIXEL level: a w×h two-tone PNG whose left ⌊w/2⌋
    * columns are tone (r,g,b) and the rest its complement. Every pixel
    * statistic then has a closed form in (w, h, r, g, b), so an engine
    * WITHOUT a codec (the DuckDB oracle) can verify the real decode.
    * Encoded with the JVM's built-in ImageIO PNG writer — lossless 8-bit,
    * so the decode side reads back exact planted values. */
  def syntheticPng(w: Int, h: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val toneA = (r << 16) | (g << 8) | b
    val toneB = ((255 - r) << 16) | ((255 - g) << 8) | (255 - b)
    val split = w / 2
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, if (x < split) toneA else toneB); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Planted image table: one real (ImageIO-encoded) PNG per id, with
    * size and tones derived from the id so stats are oracle-computable.
    * Encoding is codec work → lives behind the same mapPartitions seam
    * as decoding. */
  def plantedImages(ids: Dataset[Long]): Dataset[MediaRow] = {
    implicit val enc = Encoders.product[MediaRow]
    ids.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false) // in-memory streams, no temp files
      it.map { id =>
        MediaRow(id, "image", syntheticPng(
          (id % 8 + 2).toInt, (id % 6 + 2).toInt,
          (id * 37 % 256).toInt, (id * 59 % 256).toInt, (id * 83 % 256).toInt))
      }
    }
  }

  final case class AudioStatsRow(media_id: Long, n_samples: Long,
      peak_abs: Long, sum_abs: Long, sum_sq: Long)

  /** Deterministic planted WAV — a square wave of amplitude A(id) over
    * L(id) 16-bit mono PCM samples (+A, −A alternating), wrapped in a
    * canonical 44-byte RIFF header. Closed forms: n_samples = L,
    * peak = A, Σ|s| = L·A, Σs² = L·A² — all exact integers an engine
    * without an audio path (the DuckDB oracle) can recompute. */
  def syntheticWav(rate: Int, amplitude: Int, nSamples: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(44 + nSamples * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("ASCII")).putInt(36 + nSamples * 2)
      .put("WAVE".getBytes("ASCII"))
    bb.put("fmt ".getBytes("ASCII")).putInt(16).putShort(1).putShort(1)
    bb.putInt(rate).putInt(rate * 2).putShort(2).putShort(16)
    bb.put("data".getBytes("ASCII")).putInt(nSamples * 2)
    var k = 0
    while (k < nSamples) {
      bb.putShort((if (k % 2 == 0) amplitude else -amplitude).toShort)
      k += 1
    }
    bb.array()
  }

  /** Planted audio table mirroring [[plantedImages]]: one real WAV per id
    * with rate/amplitude/length derived from the id. */
  def plantedWavs(ids: Dataset[Long]): Dataset[MediaRow] = {
    implicit val enc = Encoders.product[MediaRow]
    ids.mapPartitions(_.map { id =>
      MediaRow(id, "audio", syntheticWav(
        if (id % 2 == 0) 44100 else 22050,
        (id * 31 % 2000).toInt + 100,
        (id % 50).toInt + 10))
    })
  }

  /** G.711 µ-law byte → linear PCM value (the classic ulaw2linear:
    * complement, ((mant << 3) + 0x84) << exp, bias removal, sign). Pure
    * integer arithmetic, so an engine without an audio path (the DuckDB
    * oracle) replays it formula-for-formula. */
  def ulawToLinear(byte: Int): Int = {
    val u = ~byte & 0xff
    val t = (((u & 0x0f) << 3) + 0x84) << ((u & 0x70) >> 4)
    if ((u & 0x80) != 0) 0x84 - t else t - 0x84
  }

  /** REAL sample-level audio decode — PCM and G.711 µ-law need no codec
    * library, only byte arithmetic: walk the RIFF chunks to the `data`
    * payload and fold the samples into exact integer stats (count,
    * peak |s|, Σ|s|, Σs²). Two codecs share the seam — fmt code 1/16-bit
    * decodes LE shorts, fmt code 7/8-bit decodes µ-law bytes through
    * [[ulawToLinear]] — proving the seam generalizes: a third codec is a
    * new branch on (codec, bits), not a new operator. Same honesty
    * contract as [[pixelStats]]: undecodable or unsupported-codec
    * payloads drop; a sample-order or sign bug shifts exact integers and
    * fails the oracle hash. */
  def audioStats(media: Dataset[MediaRow]): Dataset[AudioStatsRow] = {
    implicit val enc = Encoders.product[AudioStatsRow]
    media.mapPartitions(_.flatMap { m =>
      val b = m.content
      def le16(i: Int) = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
      def le32(i: Int) = le16(i) | (le16(i + 2) << 16)
      if (b.length < 12 || b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F' ||
        b(8) != 'W' || b(9) != 'A' || b(10) != 'V' || b(11) != 'E') None
      else {
        // locate fmt and data; bounds-checked like MediaHeader's scanner
        // (corrupt sizes stop the walk, not the task); walk ALL chunks
        // (fmt and data in either order — MediaHeader's scanner accepts
        // both layouts, so this one must too). FIRST fmt wins, tracked by
        // its own latch (ADVICE r6): a malformed multi-fmt container must
        // read the same fmt here as MediaHeader's first-fmt-returns
        // scanner, or the two decode surfaces disagree on the codec.
        var i = 12
        var fmtSeen = false
        var codec = 0
        var sampleBits = 0
        var dataAt = -1
        var dataLen = 0
        while (i + 8 <= b.length) {
          val size = le32(i + 4)
          if (size < 0 || size > b.length - i - 8) { i = b.length } // corrupt → stop
          else {
            if (b(i) == 'f' && b(i + 1) == 'm' && b(i + 2) == 't' && b(i + 3) == ' ' &&
              !fmtSeen) {
              fmtSeen = true
              if (size >= 16) { codec = le16(i + 8); sampleBits = le16(i + 22) }
            } else if (b(i) == 'd' && b(i + 1) == 'a' && b(i + 2) == 't' &&
              b(i + 3) == 'a' && dataAt < 0) {
              dataAt = i + 8; dataLen = size
            }
            i += 8 + size + (size & 1)
          }
        }
        val pcm16 = fmtSeen && codec == 1 && sampleBits == 16
        val ulaw8 = fmtSeen && codec == 7 && sampleBits == 8
        if (dataAt < 0 || (!pcm16 && !ulaw8)) None
        else {
          val n = if (pcm16) dataLen / 2 else dataLen
          var k = 0
          var peak = 0L
          var sumAbs = 0L
          var sumSq = 0L
          while (k < n) {
            val s: Long =
              if (pcm16) le16(dataAt + 2 * k).toShort.toLong
              else ulawToLinear(b(dataAt + k) & 0xff).toLong
            val a = math.abs(s)
            if (a > peak) peak = a
            sumAbs += a
            sumSq += s * s
            k += 1
          }
          Some(AudioStatsRow(m.media_id, n, peak, sumAbs, sumSq))
        }
      }
    })
  }

  /** Deterministic planted µ-law WAV — L 8-bit µ-law samples alternating
    * two byte codes (u1, u2), wrapped in a canonical RIFF header with fmt
    * code 7. Closed forms over v = [[ulawToLinear]]: n = L,
    * peak = max(|v1|,|v2|), Σ|s| = ⌈L/2⌉|v1| + ⌊L/2⌋|v2|, Σs² likewise —
    * exact integers the oracle recomputes from the decode formula alone. */
  def syntheticUlawWav(rate: Int, u1: Int, u2: Int, nSamples: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(44 + nSamples)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("ASCII")).putInt(36 + nSamples)
      .put("WAVE".getBytes("ASCII"))
    bb.put("fmt ".getBytes("ASCII")).putInt(16).putShort(7).putShort(1)
    bb.putInt(rate).putInt(rate).putShort(1).putShort(8)
    bb.put("data".getBytes("ASCII")).putInt(nSamples)
    var k = 0
    while (k < nSamples) {
      bb.put(((if (k % 2 == 0) u1 else u2) & 0xff).toByte)
      k += 1
    }
    bb.array()
  }

  /** Planted µ-law table mirroring [[plantedWavs]]: byte codes and length
    * derived from the id. */
  def plantedUlawWavs(ids: Dataset[Long]): Dataset[MediaRow] = {
    implicit val enc = Encoders.product[MediaRow]
    ids.mapPartitions(_.map { id =>
      MediaRow(id, "audio", syntheticUlawWav(
        8000,
        (id * 29 % 256).toInt,
        ((id * 53 + 7) % 256).toInt,
        (id % 40).toInt + 8))
    })
  }

  /** REAL pixel-level decode — the codec seam FILLED with the JVM's
    * built-in ImageIO (PNG/JPEG/GIF/BMP): per image, integer BT.601 luma
    * (lum = (299r + 587g + 114b) div 1000) summed over all pixels plus a
    * 4-bucket luma histogram — exact integers, so a decoder regression
    * flips the oracle hash, not a float tolerance. Undecodable payloads
    * are dropped (the all-null-fields contract of the header parser,
    * expressed as absence here). mapPartitions, not an Expression: a
    * codec needs heap buffers and reader state that per-row codegen
    * cannot host; the one-time per-partition init (ImageIO cache off) is
    * exactly what the seam exists for. */
  def pixelStats(media: Dataset[MediaRow]): Dataset[PixelStatsRow] = {
    implicit val enc = Encoders.product[PixelStatsRow]
    media.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.flatMap { m =>
        // NonFatal, not just IOException: ImageIO.read throws runtime
        // exceptions on corrupt-but-recognized payloads (truncated GIF,
        // broken ICC profile → AIOOBE/CMMException) and one bad file must
        // not kill the task — same contract as the header scanner.
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(m.content))
          catch { case scala.util.control.NonFatal(_) => null }
        if (img == null) None
        else {
          val w = img.getWidth
          val h = img.getHeight
          var sum = 0L
          val hist = new Array[Long](4)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val lum = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
                114 * (rgb & 0xff)) / 1000
              sum += lum
              hist(lum >> 6) += 1
              x += 1
            }
            y += 1
          }
          Some(PixelStatsRow(m.media_id, w, h, w.toLong * h, sum,
            hist(0), hist(1), hist(2), hist(3)))
        }
      }
    }
  }

  /** The imperative per-partition seam — where a JNI/native decoder that
    * needs batch reuse (shared codec context per partition) would plug in.
    * Demonstrates the mapPartitions batch shape with an explicit Encoder
    * (header parse runs for real); kept off the hot path for everything
    * expressible as Columns. */
  def decodeViaPartitions(media: Dataset[MediaRow]): Dataset[DecodedRow] = {
    implicit val enc = Encoders.product[DecodedRow]
    media.mapPartitions { rows =>
      // per-partition init happens once here — a JNI codec context would
      // be created and reused across this batch
      rows.map { r =>
        val h = graft.functions.MediaHeader.decode(r.content)
        DecodedRow(r.media_id, r.content.length,
          if (h.isNullAt(0)) null else h.getUTF8String(0).toString)
      }
    }
  }
}
