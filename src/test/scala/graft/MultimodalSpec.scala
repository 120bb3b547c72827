package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRow

class MultimodalSpec extends SparkSpec {

  private def mediaDf = {
    val rows = Seq(
      Row(1L, "image", Array.fill[Byte](64)(1), Row("image/png", 640, 480, null, null)),
      Row(2L, "image", Array.fill[Byte](128)(2), Row("image/png", 800, 600, null, null)),
      Row(3L, "video", Array.fill[Byte](256)(3), Row("video/mp4", 1920, 1080, null, 100L)),
      Row(4L, "audio", Array.fill[Byte](32)(4), Row("audio/wav", null, null, 44100, 5000L)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => r: Row)),
      Multimodal.mediaSchema)
  }

  test("imageFeatures extracts deterministic stub features per image row") {
    val f = Multimodal.imageFeatures(mediaDf).orderBy("media_id").collect()
    assert(f.length == 2)
    assert(f(0).getAs[Int]("width") == 640)
    assert(f(0).getAs[Int]("n_bytes") == 64)
    // deterministic: same bytes → same pseudo-features on re-run
    val again = Multimodal.imageFeatures(mediaDf).orderBy("media_id").collect()
    assert(f.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("resize rewrites metadata without touching payload") {
    val out = Multimodal.resize(mediaDf, 100, 100).filter(col("media_id") === 1).head()
    val meta = out.getStruct(out.fieldIndex("meta"))
    assert(meta.getAs[Int]("width") == 100 && meta.getAs[Int]("height") == 100)
    assert(out.getAs[Array[Byte]]("content").length == 64)
  }

  test("sampleFrames fans out one row per sampled frame") {
    val frames = Multimodal.sampleFrames(mediaDf, everyMs = 40)
    assert(frames.count() == 3) // 0, 40, 80 within 100ms
    assert(frames.columns.toSeq == Seq("media_id", "frame_ms", "frame_bytes"))
  }

  test("decodeViaPartitions maps batches with an explicit Encoder") {
    import spark.implicits._
    val ds = Seq(MediaRow(1L, "image", Array[Byte](1, 2, 3))).toDS()
    val out = Multimodal.decodeViaPartitions(ds).head()
    assert(out.n_bytes == 3 && out.head_sum == 6L)
  }

  test("repartitionForMedia sizes partitions by byte budget") {
    val df = Multimodal.repartitionForMedia(mediaDf, targetBytesPerPartition = 200)
    assert(df.rdd.getNumPartitions == 2) // 480 bytes total / 200 → 2
  }

  test("repartitionForMedia handles an empty frame (sum over zero rows is null)") {
    val empty = mediaDf.filter(col("media_id") < 0)
    val df = Multimodal.repartitionForMedia(empty, targetBytesPerPartition = 200)
    assert(df.rdd.getNumPartitions == 1 && df.count() == 0)
  }
}
