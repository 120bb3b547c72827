package graft

import org.apache.spark.sql.functions._
import graft.functions.{F, Text, Vectors}

/** The injected SQL functions must produce byte-identical results to their
  * Column-API twins — they ARE the same Catalyst trees. */
class ExtensionsSpec extends SparkSpec {

  test("SQL surface matches the Column API") {
    import spark.implicits._
    val df = Seq((1L, "hello world", "O"), (2L, "a b  c", null))
      .toDF("id", "txt", "status")
    df.createOrReplaceTempView("ext_spec_t")

    val viaSql = spark.sql(
      """SELECT id,
        |  graft_surrogate_key(id, status) AS sk,
        |  graft_hash60(txt) AS h60,
        |  graft_fingerprint(txt) AS fp,
        |  graft_simhash(txt) AS sh,
        |  graft_shingles(txt, 2) AS shingles,
        |  graft_token_count(txt) AS ntok,
        |  graft_bpe_token_count(txt) AS nbpe,
        |  graft_rolling_hash(txt) AS rh,
        |  graft_array_hash60(split(txt, ' ')) AS ah
        |FROM ext_spec_t ORDER BY id""".stripMargin).collect()

    val viaCols = df.select($"id",
      F.surrogateKey($"id", $"status").as("sk"),
      Vectors.hash60($"txt").as("h60"),
      Text.fingerprint($"txt").as("fp"),
      Text.simhash60($"txt").as("sh"),
      Text.shingleSet($"txt", 2).as("shingles"),
      Text.tokenCount($"txt").as("ntok"),
      Text.bpeTokenCount($"txt").as("nbpe"),
      Text.rollingHash($"txt").as("rh"),
      graft.functions.HashExpr.arrayHash60(split($"txt", " ")).as("ah"))
      .orderBy($"id").collect()

    assert(viaSql.toSeq == viaCols.toSeq)
  }

  test("float_dot SQL function computes the fused dot product") {
    import spark.implicits._
    Seq((Array(1f, 2f, 3f), Array(4f, 5f, 6f)))
      .toDF("a", "b").createOrReplaceTempView("ext_spec_v")
    val got = spark.sql("SELECT float_dot(a, b) AS d FROM ext_spec_v")
      .head().getDouble(0)
    assert(got == 32.0)
  }

  test("graft_q8 SQL functions roundtrip within quantization error") {
    import spark.implicits._
    Seq(Tuple1(Array(0.5f, -1.0f, 0.25f, 0.0f)))
      .toDF("v").createOrReplaceTempView("ext_spec_q8")
    val r = spark.sql(
      """SELECT graft_q8_scale(v) AS s,
        |  graft_q8_quantize(v, graft_q8_scale(v)) AS q,
        |  graft_q8_dequantize(graft_q8_quantize(v, graft_q8_scale(v)),
        |                      graft_q8_scale(v)) AS d
        |FROM ext_spec_q8""".stripMargin).head()
    assert(r.getDouble(0) == 1.0)
    assert(r.getSeq[Byte](1) == Seq[Byte](64, -127, 32, 0))
    val d = r.getSeq[Double](2)
    val orig = Seq(0.5, -1.0, 0.25, 0.0)
    assert(d.zip(orig).forall { case (a, b) => math.abs(a - b) <= 0.5 / 127 })
  }

  test("graft_media_header SQL function parses container headers") {
    import spark.implicits._
    // 33-byte PNG prelude: signature + IHDR with BE32 width/height
    val png = java.nio.ByteBuffer.allocate(33)
      .put(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
      .putInt(13).put("IHDR".getBytes("ASCII")).putInt(320).putInt(200)
      .put(Array[Byte](8, 6, 0, 0, 0)).putInt(0).array()
    Seq(Tuple1(png)).toDF("content").createOrReplaceTempView("ext_spec_m")
    val r = spark.sql(
      "SELECT h.format, h.width, h.height FROM (SELECT graft_media_header(content) h FROM ext_spec_m)")
      .head()
    assert(r.getString(0) == "png" && r.getInt(1) == 320 && r.getInt(2) == 200)
  }

  test("wrong argument count fails with the function name and arity") {
    import spark.implicits._
    Seq(Tuple1(Array(1f, 2f))).toDF("a").createOrReplaceTempView("ext_spec_a")
    val e = intercept[Exception] {
      spark.sql("SELECT float_dot(a) FROM ext_spec_a").collect()
    }
    assert(e.getMessage.contains("float_dot expects 2 arguments, got 1"))
  }

  test("non-literal shingle width is rejected") {
    import spark.implicits._
    Seq(("x y z", 2)).toDF("txt", "n").createOrReplaceTempView("ext_spec_n")
    val e = intercept[Exception] {
      spark.sql("SELECT graft_shingles(txt, n) FROM ext_spec_n").collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }
}
