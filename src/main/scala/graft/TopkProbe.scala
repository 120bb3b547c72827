package graft

import org.apache.spark.sql.functions._

/** Measurement harness for the basket-topk certification dial (VERDICT
  * r11 #1): on the near-FLAT synthetic catalog the Misra–Gries capacity
  * had to be K = 2²⁰ for the support-2 tier to certify, so the operator's
  * whole reason to exist — a SMALL K certifying the full top-20 on
  * Zipfian co-purchase data — was argued from the MG bound, never
  * measured. ScaleGen's `skew` mode now plants Zipf(1) part popularity;
  * this main measures the support law it induces and runs
  * [[graft.queries.AnalyticsQueries.basketPairsTopkWith]] across a K
  * ladder against the exact top-20.
  *
  * Per corpus it prints one support-law line —
  * n_pairs (the MG stream length), s20 (the 20th pair's true support),
  * and k_star = ⌊n_pairs/s20⌋ + 1, the SMALLEST capacity whose bound
  * support·(K+1) > n certifies the full 20 — then one line per probed K:
  * wall seconds, certified row count, and whether the emitted rows are
  * the exact top-20 (full20) / a correct prefix of it (prefix_ok; MG's
  * refusal-by-shrinkage contract below k_star). Evidence lands in
  * PERF.md; the exact key's wall time rides along as the baseline the
  * bounded-state path is supposed to beat.
  *
  * Usage: `TopkProbe <sfDir> [K,K,...]` (default ladder 2¹⁰..2²⁰).
  */
object TopkProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: TopkProbe <sfDir> [K,K,...]")
    val dir = args(0)
    val ks: Array[Int] =
      if (args.length > 1) args(1).split(",").map(_.toInt)
      else Array(1 << 10, 1 << 12, 1 << 14, 1 << 16, 1 << 20)
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")

    val t0 = System.nanoTime()
    val exact = queries.AnalyticsQueries.queries("an_basket_pairs")(spark, dir).collect()
    val tExact = (System.nanoTime() - t0) / 1e9
    require(exact.length == 20, s"exact top-20 returned ${exact.length} rows")
    spark.catalog.clearCache()

    val li = Tables(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val nPairs = queries.AnalyticsQueries.orderPairs(li).count()
    val s20 = exact.last.getAs[Long]("support")
    val kStar = nPairs / s20 + 1
    println(s"""{"probe":"support_law","sf":"$dir","n_pairs":$nPairs,"s20":$s20,""" +
      s""""k_star":$kStar,"exact_sec":$tExact,"top_supports":[${
        exact.map(_.getAs[Long]("support")).mkString(",")}]}""")

    ks.foreach { k =>
      val t1 = System.nanoTime()
      val rows = queries.AnalyticsQueries.basketPairsTopkWith(spark, dir, k).collect()
      val sec = (System.nanoTime() - t1) / 1e9
      spark.catalog.clearCache()
      // zip over an empty certified prefix is vacuously true (ADVICE
      // r12) — a fully degenerate K must not print as a pass, so
      // prefix_ok additionally requires at least one certified row.
      val prefixOk = rows.nonEmpty && rows.zip(exact).forall { case (a, b) => a == b }
      val full20 = prefixOk && rows.length == 20
      println(s"""{"probe":"topk","k":$k,"sec":$sec,"certified_rows":${rows.length},""" +
        s""""full20":$full20,"prefix_ok":$prefixOk}""")
    }

    // AUTO-K mode (VERDICT r13 #4): the probe derives K from the corpus's
    // own support law — print the chosen capacity, wall, and whether the
    // result is exactly the fixed-K output (the proof obligation)
    val t2 = System.nanoTime()
    val (kAuto, dfAuto) = queries.AnalyticsQueries.basketPairsTopkAutoK(spark, dir)
    val rowsAuto = dfAuto.collect()
    val secAuto = (System.nanoTime() - t2) / 1e9
    spark.catalog.clearCache()
    val fixed = queries.AnalyticsQueries.queries("an_basket_pairs_topk")(spark, dir).collect()
    val sameAsFixed = rowsAuto.toSeq == fixed.toSeq
    println(s"""{"probe":"topk_auto","k_chosen":$kAuto,"sec":$secAuto,""" +
      s""""certified_rows":${rowsAuto.length},"same_as_fixed":$sameAsFixed}""")
    spark.stop()
  }
}
