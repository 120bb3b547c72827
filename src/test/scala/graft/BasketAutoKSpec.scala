package graft

import org.apache.spark.sql.DataFrame
import graft.queries.AnalyticsQueries

/** VERDICT r12 #3 / r13 #4 — auto-K for the basket top-20: the MG
  * capacity is derived from the corpus's own support law (probe pass →
  * K = 4·(⌊n/s′₂₀⌋+1) clamped to [2¹², 2²⁰]) instead of hardcoding the
  * flat-corpus worst case 2²⁰. The proof obligation the oracle leans on:
  * the auto output equals the fixed-K output on EVERY corpus — certified
  * full top-20 when unclamped, literally the fixed path when clamped.
  * This spec pins both clamp edges and the certification on a flat AND a
  * Zipf-skewed constructed corpus, plus the probe-underestimate path
  * (tiny probeK misses top pairs → derived K only GROWS → still
  * certifies).
  */
class BasketAutoKSpec extends SparkSpec {
  import spark.implicits._

  /** Write a lineitem table of (orderkey, partkey) rows where pair
    * (a, b) appears in `support` distinct orders; returns its dir. */
  private def corpus(name: String, pairSupports: Seq[((Long, Long), Int)]): String = {
    val dir = java.nio.file.Files.createTempDirectory(name).toString
    var order = 0L
    val rows = pairSupports.flatMap { case ((a, b), sup) =>
      (0 until sup).flatMap { _ =>
        order += 1
        Seq((order, a), (order, b))
      }
    }
    rows.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    dir
  }

  private def exactTop20(dir: String): Seq[org.apache.spark.sql.Row] =
    AnalyticsQueries.queries("an_basket_pairs")(spark, dir).collect().toSeq

  private def fixedK(dir: String): Seq[org.apache.spark.sql.Row] =
    AnalyticsQueries.queries("an_basket_pairs_topk")(spark, dir).collect().toSeq

  test("skew corpus: the probe pass certifies the exact top-20 in ONE pass") {
    // Zipf-ish law: pair i has support ~ 600/i — 25 distinct pairs,
    // n = sum(supports) ≈ 2.3k; s20 = 30 and 30·(2¹⁴+1) ≫ n, so the
    // probe pass proves its own completeness and no escalation runs
    val sups = (1 to 25).map(i => ((i.toLong, 1000L + i), math.max(600 / i, 3)))
    val dir = corpus("basket_skew", sups)
    val (k, df) = AnalyticsQueries.basketPairsTopkAutoK(spark, dir)
    assert(k == AnalyticsQueries.BasketProbeK,
      s"the probe capacity must be accepted one-pass on this law, got $k")
    val rows = df.collect().toSeq
    assert(rows.size == 20, s"must certify the FULL top-20, got ${rows.size}")
    assert(rows == exactTop20(dir), "auto output must be the exact top-20")
    assert(rows == fixedK(dir), "auto output must equal the fixed-K output")
  }

  test("flat corpus: derived K clamps to the cap — literally the fixed-K path") {
    // the cap edge needs 4·(⌊n/s′₂₀⌋+1) > 2²⁰ — a support-1 tail under a
    // hub pair of support 300 000 gives n = 300 020, s′₂₀ = 1,
    // 4·k* = 1 200 084 > 2²⁰ → K = cap = 2²⁰ (the literal fixed path)
    val sups = ((1L, 2L), 300000) +: (10 to 29).map(i => ((i.toLong, 1000L + i), 1))
    val dir = corpus("basket_flat", sups)
    val (k, df) = AnalyticsQueries.basketPairsTopkAutoK(spark, dir)
    assert(k == (1 << 20), s"support-1 tail must clamp K to the 2^20 cap, got $k")
    assert(df.collect().toSeq == fixedK(dir),
      "clamped auto must emit exactly the fixed-K certified prefix")
  }

  test("probe underestimate (tiny probeK) escalates and still emits the exact top-20") {
    // same skew law, probeK = 32: the probe can't certify at threshold 33
    // (s₂₀·33 < n), so the escalation derives K from s′₂₀ ≤ s₂₀ — the
    // overshoot direction — and the second pass must certify the full 20
    val sups = (1 to 25).map(i => ((i.toLong, 1000L + i), math.max(600 / i, 3)))
    val dir = corpus("basket_probe32", sups)
    val (k32, df32) = AnalyticsQueries.basketPairsTopkAutoK(spark, dir, probeK = 32)
    assert(k32 > 32 && k32 < (1 << 20),
      s"must escalate past the probe capacity but stay below the cap, got $k32")
    assert(df32.collect().toSeq == exactTop20(dir),
      "escalated pass must certify the exact top-20")
    // probeK = 8 can't even surface 20 candidates — straight to the cap,
    // which is literally the fixed path
    val (k8, df8) = AnalyticsQueries.basketPairsTopkAutoK(spark, dir, probeK = 8)
    assert(k8 == (1 << 20), s"<20 probe candidates must fall back to the cap, got $k8")
    assert(df8.collect().toSeq == exactTop20(dir))
  }

  test("degenerate corpus (<20 distinct pairs): falls back to the fixed path") {
    val sups = (1 to 5).map(i => ((i.toLong, 1000L + i), 4))
    val dir = corpus("basket_tiny", sups)
    val (k, df) = AnalyticsQueries.basketPairsTopkAutoK(spark, dir)
    assert(k == (1 << 20), s"fewer than 20 probe candidates must fall back to the cap, got $k")
    assert(df.collect().toSeq == fixedK(dir))
  }

  test("driver corpus sf0.001: auto equals fixed (the oracle-shared contract)") {
    val auto = AnalyticsQueries.queries("an_basket_pairs_topk_auto")(spark, sfDir)
    assert(auto.collect().toSeq == fixedK(sfDir),
      "auto and fixed must hash-match on the driver corpus")
  }
}
