package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract / resize /
  * frame-sample operators.
  *
  * Decoding is REAL across all three modalities: [[decode]] parses
  * PNG/JPEG/GIF/WAV container headers in pure JVM byte arithmetic
  * ([[graft.functions.MediaHeader]]); [[pixelStats]] decodes pixels via
  * ImageIO; [[audioStats]] decodes PCM16 and G.711 µ-law samples;
  * [[sampleFrames]]/[[frameStats]] demux AVI containers and decode
  * uncompressed BI_RGB frames. The mapPartitions seam
  * ([[decodeViaPartitions]]) is where a JNI decoder for compressed
  * codecs (H.264, MP3, …) plugs in without changing any plan shape.
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

  /** Metadata-only resize: rewrites declared dimensions without touching
    * payload — the cheap path when downstream only reads metadata (the
    * payload transform is [[resizeImages]]). Narrow projection. */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame =
    media.withColumn("meta",
      col("meta").withField("width", lit(w)).withField("height", lit(h)))

  /** REAL payload resize through the codec seam: ImageIO decode →
    * deterministic floor-sampling resample (dst pixel (x,y) reads src
    * (⌊x·sw/w⌋, ⌊y·sh/h⌋) — integer arithmetic, so every output pixel has
    * a closed form an engine without a codec can replay) → lossless PNG
    * re-encode. Undecodable payloads drop, same contract as
    * [[pixelStats]]. Per-row narrow work behind mapPartitions; payload
    * bytes never shuffle. */
  def resizeImages(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    implicit val enc = Encoders.product[MediaRow]
    media.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.flatMap { m =>
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(m.content))
          catch { case scala.util.control.NonFatal(_) => null }
        if (img == null) None
        else {
          val out = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val (sw, sh) = (img.getWidth, img.getHeight)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              out.setRGB(x, y, img.getRGB(x * sw / w, y * sh / h))
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          Some(MediaRow(m.media_id, m.kind, bos.toByteArray))
        }
      }
    }
  }

  final case class FrameRow(media_id: Long, frame_ms: Long, frame_idx: Int,
      width: Int, height: Int, frame_bytes: Array[Byte])

  /** Frame sampling for video rows — REAL container demux (the third
    * codec through the decode seam): walk the AVI/RIFF chunk tree
    * (`hdrl`→`avih` for frame timing, `strl`→`strf` for the DIB shape,
    * `movi` for the frame chunks), then emit one row per `everyMs`
    * timestamp carrying the ACTUAL raw-DIB payload of the frame covering
    * it (frame_idx = ⌊ms·1000 / µsPerFrame⌋). Only uncompressed 24-bit
    * BI_RGB video is decodable without a codec library; anything else
    * drops — the same honesty contract as [[audioStats]]/[[pixelStats]].
    * Per-file frame loops parallelize as rows; payloads never shuffle. */
  def sampleFrames(media: Dataset[MediaRow], everyMs: Long): Dataset[FrameRow] = {
    implicit val enc = Encoders.product[FrameRow]
    media.mapPartitions(_.flatMap { m =>
      aviDemux(m.content).toSeq.flatMap { avi =>
        val durationMs = avi.nFrames.toLong * avi.usPerFrame / 1000
        Iterator.range(0L, durationMs, everyMs).flatMap { ms =>
          val idx = (ms * 1000 / avi.usPerFrame).toInt
          avi.frames.lift(idx).map { case (off, len) =>
            FrameRow(m.media_id, ms, idx, avi.width, avi.height,
              java.util.Arrays.copyOfRange(m.content, off, off + len))
          }
        }
      }
    })
  }

  final case class FrameDeltaRow(media_id: Long, frame_idx: Int,
      width: Int, height: Int, n_pixels: Long, delta_sum: Long,
      changed_pixels: Long)

  /** Temporal motion signal per consecutive frame pair — the shot-boundary
    * / static-clip detector a video training pipeline runs before
    * sampling: Σ|luma_f − luma_{f−1}| and the changed-pixel count, both
    * exact integers. A video's frames live INSIDE its row's payload, so
    * the whole per-media sequential decode (one rolling previous-luma
    * buffer) happens inside mapPartitions with ZERO shuffle — media
    * parallelize as rows, payload bytes never leave the executor. A
    * non-decodable frame drops and resets the buffer (no delta bridges a
    * gap) — the seam's honest-drop contract. */
  def frameDeltas(media: Dataset[MediaRow]): Dataset[FrameDeltaRow] = {
    implicit val enc = Encoders.product[FrameDeltaRow]
    media.mapPartitions(_.flatMap { m =>
      aviDemux(m.content).toSeq.flatMap { avi =>
        // Long arithmetic: corrupt strf dims must not wrap Int and slip
        // past the length guard (after it holds, w·h ≤ len/3 < 2^31)
        val stride = ((3L * avi.width + 3) / 4) * 4
        var prev: Array[Int] = null
        avi.frames.zipWithIndex.flatMap { case ((off, len), idx) =>
          if (avi.height <= 0 || stride * avi.height != len ||
              off < 0 || off.toLong + len > m.content.length) {
            prev = null; None
          } else {
            val strideI = stride.toInt // fits: stride * height == len (Int)
            val lum = new Array[Int](avi.width * avi.height)
            var y = 0
            while (y < avi.height) {
              val row = off + (avi.height - 1 - y) * strideI
              var x = 0
              while (x < avi.width) {
                val b = m.content(row + 3 * x) & 0xff
                val g = m.content(row + 3 * x + 1) & 0xff
                val r = m.content(row + 3 * x + 2) & 0xff
                lum(y * avi.width + x) = (299 * r + 587 * g + 114 * b) / 1000
                x += 1
              }
              y += 1
            }
            val res = if (prev != null) {
              var ds = 0L
              var ch = 0L
              var i = 0
              while (i < lum.length) {
                val d = math.abs(lum(i) - prev(i))
                ds += d
                if (d != 0) ch += 1
                i += 1
              }
              Some(FrameDeltaRow(m.media_id, idx, avi.width, avi.height,
                lum.length.toLong, ds, ch))
            } else None
            prev = lum
            res
          }
        }
      }
    })
  }

  final case class FrameStatsRow(media_id: Long, frame_ms: Long, frame_idx: Int,
      width: Int, height: Int, n_bytes: Int, n_pixels: Long, luma_sum: Long,
      hist_0: Long, hist_1: Long, hist_2: Long, hist_3: Long)

  /** Pixel statistics over demuxed frames — decodes the raw-DIB layout
    * for real (bottom-up rows, BGR order, 4-byte row stride) into the
    * same integer BT.601 luma sum + 4-bucket histogram as [[pixelStats]],
    * so the video path is graded by the identical exact-integer oracle
    * contract. Narrow per-row work; a stride or channel-order bug shifts
    * integers and fails the hash compare. */
  def frameStats(frames: Dataset[FrameRow]): Dataset[FrameStatsRow] = {
    implicit val enc = Encoders.product[FrameStatsRow]
    frames.mapPartitions(_.flatMap { f =>
      val stride = ((3 * f.width + 3) / 4) * 4
      if (f.frame_bytes.length != stride * f.height) None
      else {
        var sum = 0L
        val hist = new Array[Long](4)
        var y = 0
        while (y < f.height) {
          val row = (f.height - 1 - y) * stride // bottom-up storage
          var x = 0
          while (x < f.width) {
            val b = f.frame_bytes(row + 3 * x) & 0xff
            val g = f.frame_bytes(row + 3 * x + 1) & 0xff
            val r = f.frame_bytes(row + 3 * x + 2) & 0xff
            val lum = (299 * r + 587 * g + 114 * b) / 1000
            sum += lum
            hist(lum >> 6) += 1
            x += 1
          }
          y += 1
        }
        Some(FrameStatsRow(f.media_id, f.frame_ms, f.frame_idx, f.width,
          f.height, f.frame_bytes.length, f.width.toLong * f.height, sum,
          hist(0), hist(1), hist(2), hist(3)))
      }
    })
  }

  private final case class AviInfo(usPerFrame: Int, nFrames: Int,
      width: Int, height: Int, frames: IndexedSeq[(Int, Int)])

  /** RIFF/AVI chunk walk in pure byte arithmetic — bounds-checked like
    * the WAV scanner (corrupt sizes stop the walk, not the task). Returns
    * None unless the container is AVI with one uncompressed 24-bit BI_RGB
    * 'vids' stream and at least one movi frame chunk. */
  private def aviDemux(b: Array[Byte]): Option[AviInfo] = {
    def le16(i: Int) = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    def le32(i: Int) = le16(i) | (le16(i + 2) << 16)
    def fcc(i: Int, s: String) =
      b(i) == s(0).toByte && b(i + 1) == s(1).toByte &&
        b(i + 2) == s(2).toByte && b(i + 3) == s(3).toByte
    if (b.length < 12 || !fcc(0, "RIFF") || !fcc(8, "AVI ")) None
    else {
      var usPerFrame = 0
      var nFrames = 0
      var width = 0
      var height = 0
      var bitCount = 0
      var compression = -1
      var vids = false
      // fccType of the most recent strh: the strf that follows belongs to
      // THAT stream, so on a multi-stream AVI (audio strl before video
      // strl) the WAVEFORMATEX is not misread as a BITMAPINFOHEADER
      var lastStrh = ""
      val frames = IndexedSeq.newBuilder[(Int, Int)]
      // walk [from, to) one nesting level; recurse into LIST chunks —
      // depth is bounded by the fixed hdrl/strl/movi tree, not the data
      def walk(from: Int, to: Int): Unit = {
        var i = from
        while (i + 8 <= to) {
          val size = le32(i + 4)
          if (size < 0 || size > to - i - 8) { i = to } // corrupt → stop
          else {
            if (fcc(i, "LIST") && size >= 4) walk(i + 12, i + 8 + size)
            else if (fcc(i, "avih") && size >= 24) {
              usPerFrame = le32(i + 8); nFrames = le32(i + 24)
            } else if (fcc(i, "strh") && size >= 4) {
              lastStrh = new String(b, i + 8, 4, java.nio.charset.StandardCharsets.US_ASCII)
              if (lastStrh == "vids") vids = true
            } else if (fcc(i, "strf") && size >= 20 && width == 0 &&
                lastStrh == "vids") {
              width = le32(i + 12); height = le32(i + 16)
              bitCount = le16(i + 22); compression = le32(i + 24)
            } else if ((fcc(i, "00db") || fcc(i, "00dc")) && size > 0) {
              frames += ((i + 8, size))
            }
            i += 8 + size + (size & 1)
          }
        }
      }
      walk(12, b.length)
      val fs = frames.result()
      if (vids && compression == 0 && bitCount == 24 && usPerFrame > 0 &&
        width > 0 && height > 0 && fs.nonEmpty)
        Some(AviInfo(usPerFrame, math.min(nFrames, fs.length), width, height, fs))
      else None
    }
  }

  /** Deterministic planted AVI — the video twin of [[syntheticPng]] /
    * [[syntheticWav]]: `nFrames` uncompressed 24-bit BI_RGB frames of the
    * PNG test-vector pattern (left ⌊w/2⌋ columns at toneOf(f), the rest
    * its complement), stored bottom-up BGR with 4-byte row stride in a
    * minimal RIFF tree (hdrl[avih, strl[strh,strf]], movi[00db…]). Every
    * per-frame statistic has a closed form in (w, h, toneOf(f)), so the
    * codec-less DuckDB oracle verifies the real demux + pixel decode. */
  def syntheticAvi(w: Int, h: Int, nFrames: Int, usPerFrame: Int,
      toneOf: Int => (Int, Int, Int)): Array[Byte] = {
    val stride = ((3 * w + 3) / 4) * 4
    val frameSize = stride * h
    val strlSize = 4 + (8 + 56) + (8 + 40)
    val hdrlSize = 4 + (8 + 56) + (8 + strlSize)
    val moviSize = 4 + nFrames * (8 + frameSize)
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)
    val bb = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fcc(s: String) = bb.put(s.getBytes("ASCII"))
    fcc("RIFF"); bb.putInt(riffSize); fcc("AVI ")
    fcc("LIST"); bb.putInt(hdrlSize); fcc("hdrl")
    fcc("avih"); bb.putInt(56)
    bb.putInt(usPerFrame).putInt(0).putInt(0).putInt(0).putInt(nFrames)
      .putInt(0).putInt(1).putInt(frameSize).putInt(w).putInt(h)
      .putInt(0).putInt(0).putInt(0).putInt(0)
    fcc("LIST"); bb.putInt(strlSize); fcc("strl")
    fcc("strh"); bb.putInt(56)
    fcc("vids"); fcc("DIB ")
    bb.putInt(0).putShort(0).putShort(0).putInt(0)
      .putInt(usPerFrame).putInt(1000000) // dwScale/dwRate: rate/scale = fps
      .putInt(0).putInt(nFrames).putInt(frameSize).putInt(-1).putInt(0)
    bb.putShort(0).putShort(0).putShort(w.toShort).putShort(h.toShort)
    fcc("strf"); bb.putInt(40)
    bb.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(frameSize).putInt(0).putInt(0).putInt(0).putInt(0)
    fcc("LIST"); bb.putInt(moviSize); fcc("movi")
    val split = w / 2
    var f = 0
    while (f < nFrames) {
      fcc("00db"); bb.putInt(frameSize)
      val (r, g, bl) = toneOf(f)
      var y = h - 1 // bottom-up row order
      while (y >= 0) {
        var x = 0
        while (x < w) {
          if (x < split) bb.put(bl.toByte).put(g.toByte).put(r.toByte)
          else bb.put((255 - bl).toByte).put((255 - g).toByte).put((255 - r).toByte)
          x += 1
        }
        var p = 3 * w
        while (p < stride) { bb.put(0.toByte); p += 1 }
        y -= 1
      }
      f += 1
    }
    bb.array()
  }

  /** Planted video table mirroring [[plantedImages]]: one real AVI per id
    * with shape/length/tones derived from the id (25 fps). */
  def plantedAvis(ids: Dataset[Long]): Dataset[MediaRow] = {
    implicit val enc = Encoders.product[MediaRow]
    ids.mapPartitions(_.map { id =>
      MediaRow(id, "video", syntheticAvi(
        (id % 6 + 2).toInt, (id % 4 + 2).toInt, (id % 5 + 2).toInt, 40000,
        f => (((id * 37 + f * 11) % 256).toInt, ((id * 59 + f * 13) % 256).toInt,
          ((id * 83 + f * 17) % 256).toInt)))
    })
  }

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

  /** Naive PCM decimation resample through the same codec seam: keep
    * every `factor`-th 16-bit sample and re-wrap at rate/factor — a REAL
    * payload transform (decode → subsample → re-encode), like
    * [[resizeImages]] for audio. Deliberately naive: no anti-alias
    * low-pass first, so the planted ±A square wave (Nyquist-frequency
    * content) decimates to pure DC — the aliasing a production resampler
    * filters away, made VISIBLE as a closed form the oracle checks
    * (every kept sample is +A). Non-PCM or undecodable payloads drop
    * (the seam's honesty contract); payload bytes never shuffle. */
  def resampleAudio(media: Dataset[MediaRow], factor: Int): Dataset[MediaRow] = {
    require(factor >= 1, "decimation factor must be >= 1")
    implicit val enc = Encoders.product[MediaRow]
    media.mapPartitions(_.flatMap { m =>
      val b = m.content
      def le16(i: Int) = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
      wavChunks(b).flatMap { w =>
        if (w.codec != 1 || w.bits != 16 || w.rate <= 0) None
        else {
          val n = w.dataLen / 2
          val nOut = (n + factor - 1) / factor
          val out = java.nio.ByteBuffer.allocate(44 + nOut * 2)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          val newRate = math.max(w.rate / factor, 1)
          out.put("RIFF".getBytes("ASCII")).putInt(36 + nOut * 2)
            .put("WAVE".getBytes("ASCII"))
          out.put("fmt ".getBytes("ASCII")).putInt(16).putShort(1).putShort(1)
          out.putInt(newRate).putInt(newRate * 2).putShort(2).putShort(16)
          out.put("data".getBytes("ASCII")).putInt(nOut * 2)
          var k = 0
          while (k < n) {
            if (k % factor == 0) out.putShort(le16(w.dataAt + 2 * k).toShort)
            k += 1
          }
          Some(MediaRow(m.media_id, "audio", out.array()))
        }
      }
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
  /** Parsed WAV container: (codec, bits, rate, dataAt, dataLen). */
  private final case class WavInfo(codec: Int, bits: Int, rate: Int,
      dataAt: Int, dataLen: Int)

  /** Shared RIFF/WAVE chunk walk (used by [[audioStats]] and
    * [[resampleAudio]]): bounds-checked like MediaHeader's scanner
    * (corrupt sizes stop the walk, not the task); walks ALL chunks (fmt
    * and data in either order — MediaHeader's scanner accepts both
    * layouts, so this one must too). FIRST fmt wins, tracked by its own
    * latch (ADVICE r6): a malformed multi-fmt container must read the
    * same fmt here as MediaHeader's first-fmt-returns scanner, or the
    * decode surfaces disagree on the codec. */
  private def wavChunks(b: Array[Byte]): Option[WavInfo] = {
    def le16(i: Int) = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    def le32(i: Int) = le16(i) | (le16(i + 2) << 16)
    if (b.length < 12 || b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F' ||
      b(8) != 'W' || b(9) != 'A' || b(10) != 'V' || b(11) != 'E') None
    else {
      var i = 12
      var fmtSeen = false
      var codec = 0
      var sampleBits = 0
      var rate = 0
      var dataAt = -1
      var dataLen = 0
      while (i + 8 <= b.length) {
        val size = le32(i + 4)
        if (size < 0 || size > b.length - i - 8) { i = b.length } // corrupt → stop
        else {
          if (b(i) == 'f' && b(i + 1) == 'm' && b(i + 2) == 't' && b(i + 3) == ' ' &&
            !fmtSeen) {
            fmtSeen = true
            if (size >= 16) {
              codec = le16(i + 8); sampleBits = le16(i + 22); rate = le32(i + 12)
            }
          } else if (b(i) == 'd' && b(i + 1) == 'a' && b(i + 2) == 't' &&
            b(i + 3) == 'a' && dataAt < 0) {
            dataAt = i + 8; dataLen = size
          }
          i += 8 + size + (size & 1)
        }
      }
      if (!fmtSeen || dataAt < 0) None
      else Some(WavInfo(codec, sampleBits, rate, dataAt, dataLen))
    }
  }

  def audioStats(media: Dataset[MediaRow]): Dataset[AudioStatsRow] = {
    implicit val enc = Encoders.product[AudioStatsRow]
    media.mapPartitions(_.flatMap { m =>
      val b = m.content
      def le16(i: Int) = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
      wavChunks(b).flatMap { w =>
        val (codec, sampleBits, dataAt, dataLen) = (w.codec, w.bits, w.dataAt, w.dataLen)
        val pcm16 = codec == 1 && sampleBits == 16
        val ulaw8 = codec == 7 && sampleBits == 8
        if (!pcm16 && !ulaw8) None
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

  final case class PhashRow(media_id: Long, phash_bits: String, n_set: Long)

  /** Average-hash perceptual fingerprint (aHash) — the image near-dup
    * primitive: decode, floor-sample a grid×grid luma raster (pixel at
    * (⌊j·w/g⌋, ⌊i·h/g⌋) — the same floor-sampling resampler as
    * [[resizeImages]]), threshold each cell STRICTLY above the raster
    * mean (cross-multiplied — `lum·g² > Σlum` — so no division touches
    * the bits), and emit the g² bits as a bitstring. Near-duplicate
    * images (re-encodes, minor edits) land within a small hamming
    * distance; the string form keys a grouping or LSH band join directly,
    * with none of the signed-overflow traps a 64-bit packed value has in
    * cross-engine compares. Per-image work is g² samples regardless of
    * resolution; shuffle-free scan. Undecodable payloads drop, same
    * contract as [[pixelStats]]. */
  def averageHash(media: Dataset[MediaRow], grid: Int = 8): Dataset[PhashRow] = {
    implicit val enc = Encoders.product[PhashRow]
    media.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.flatMap { m =>
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(m.content))
          catch { case scala.util.control.NonFatal(_) => null }
        if (img == null) None
        else {
          val w = img.getWidth
          val h = img.getHeight
          val cells = grid * grid
          val lum = new Array[Long](cells)
          var total = 0L
          var i = 0
          while (i < grid) {
            val y = i * h / grid
            var j = 0
            while (j < grid) {
              val rgb = img.getRGB(j * w / grid, y)
              val l = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
                114 * (rgb & 0xff)) / 1000L
              lum(i * grid + j) = l
              total += l
              j += 1
            }
            i += 1
          }
          val sb = new java.lang.StringBuilder(cells)
          var nSet = 0L
          var k = 0
          while (k < cells) {
            val bit = lum(k) * cells > total
            sb.append(if (bit) '1' else '0')
            if (bit) nSet += 1
            k += 1
          }
          Some(PhashRow(m.media_id, sb.toString, nSet))
        }
      }
    }
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
