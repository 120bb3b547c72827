package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DedupLatest

/** Property-style checks for the deterministic kernels over seeded random
  * input: the invariants the oracle compare relies on must hold for
  * ARBITRARY text/rows, not just the driver tables. Seeded generation
  * keeps failures reproducible; cases batch into ONE DataFrame per
  * property so the whole suite costs a handful of Spark jobs. */
class PropertiesSpec extends AnyFunSuite {

  private lazy val spark = TestSession.spark
  import graft.functions.Text

  private val rnd = new scala.util.Random(42)
  private def word() = (1 to 1 + rnd.nextInt(7)).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
  private def text(maxWords: Int) = (0 until rnd.nextInt(maxWords)).map(_ => word()).mkString(" ")

  test("fingerprint is invariant under whitespace run-length and case") {
    val cases = (1 to 60).map { _ =>
      val t = text(12)
      val pad = 1 + rnd.nextInt(3)
      (t, t.toUpperCase.replace(" ", " " * pad) + " " * (pad - 1))
    }
    val bad = spark.createDataFrame(cases).toDF("a", "b")
      .filter(not(Text.fingerprint(col("a")) <=> Text.fingerprint(col("b"))))
    assert(bad.count() === 0)
  }

  test("tokenCount matches the token array length for any text") {
    val cases = (1 to 60).map(_ => Tuple1(text(15)))
    val bad = spark.createDataFrame(cases).toDF("t")
      .filter(Text.tokenCount(col("t")) =!= size(Text.tokens(col("t"))))
    assert(bad.count() === 0)
  }

  test("shingleSet size: short text collapses to 1, else bounded by n-k+1") {
    for (k <- 2 to 4) {
      val cases = (1 to 40).map { _ =>
        val words = (0 until rnd.nextInt(8)).map(_ => word())
        (words.mkString(" "), words.length)
      }
      val got = spark.createDataFrame(cases).toDF("t", "n_words")
        .select(col("n_words"), size(Text.shingleSet(col("t"), k)).as("n_sh"))
        .collect()
      got.foreach { r =>
        val (words, n) = (r.getInt(0), r.getInt(1))
        if (words < k) assert(n === 1, s"words=$words k=$k")
        else assert(n >= 1 && n <= words - k + 1, s"words=$words k=$k n=$n")
      }
    }
  }

  test("MisraGries property: for random skewed streams and any partition " +
      "count, the two-pass verified set equals the exact heavy hitters") {
    import graft.functions.SketchAgg
    // 20 seeded trials: random Zipf-ish streams, random k, random
    // partitioning — the superset guarantee must make the verified
    // two-pass result EXACT every time
    for (trial <- 1 to 20) {
      val k = 4 + rnd.nextInt(12)
      val nVals = 5 + rnd.nextInt(60)
      val data = (0 until 400 + rnd.nextInt(400)).map { _ =>
        // skew: low ids exponentially more likely
        val v = math.min((-math.log(rnd.nextDouble()) * 4).toInt, nVals - 1)
        s"v$v"
      }
      val n = data.size
      val parts = 1 + rnd.nextInt(24)
      val df = spark.createDataFrame(data.map(Tuple1(_))).toDF("v")
        .repartition(parts)
      val cand = df.agg(SketchAgg.misraGries(col("v"), k).as("c"))
        .head().getSeq[String](0)
      assert(cand.size <= k, s"trial $trial: summary exceeded k=$k")
      val verified = df.filter(col("v").isin(cand: _*))
        .groupBy("v").agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") * k > n)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val exact = data.groupBy(identity).view.mapValues(_.size.toLong)
        .filter { case (_, c) => c * k > n }.toMap
      assert(verified === exact,
        s"trial $trial (k=$k, parts=$parts, n=$n): verified $verified != exact $exact")
    }
  }

  test("DedupLatest: one row per key, and it is the max-order row") {
    val rows = (1 to 200).map(_ => (rnd.nextInt(6), rnd.nextInt(1000)))
    val df = spark.createDataFrame(rows).toDF("k", "v")
    val out = DedupLatest(df, Seq("k"), Seq(col("v")))
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    val expected = rows.groupBy(_._1).map { case (k, g) => k -> g.map(_._2).max }
    assert(out === expected)
  }
}
