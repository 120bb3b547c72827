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

  test("DedupLatest: one row per key, and it is the max-order row") {
    val rows = (1 to 200).map(_ => (rnd.nextInt(6), rnd.nextInt(1000)))
    val df = spark.createDataFrame(rows).toDF("k", "v")
    val out = DedupLatest(df, Seq("k"), Seq(col("v")))
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    val expected = rows.groupBy(_._1).map { case (k, g) => k -> g.map(_._2).max }
    assert(out === expected)
  }
}
