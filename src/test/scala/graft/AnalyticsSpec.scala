package graft

import org.apache.spark.sql.functions._

import graft.queries.AnalyticsQueries

/** Semantic checks for the analytics pack beyond the oracle's
  * value-equality: the HLL sketch must actually ESTIMATE well, and the
  * arg-min/max picks must agree with a direct window computation. */
class AnalyticsSpec extends SparkSpec {

  test("a_hll_exact estimates distinct count within 5%") {
    val row = AnalyticsQueries.queries("a_hll_exact")(spark, sfDir).head()
    val est = row.getAs[Double]("estimate")
    val exact = Tables(spark, sfDir, "orders")
      .select(countDistinct(col("o_custkey"))).head().getLong(0).toDouble
    // 1024 buckets -> relative standard error ~1.04/sqrt(1024) = 3.25%
    assert(math.abs(est - exact) / exact < 0.05,
      s"estimate $est vs exact $exact drifts beyond 5%")
  }

  test("a_approx_distinct stays within its documented error bound") {
    // the bound itself is now an output column the oracle asserts too
    val rows = SparkEntry.queries("a_approx_distinct")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("within_5pct"),
        s"approx count for ${r.getAs[String]("o_orderstatus")} beyond 5% of exact")
    }
  }

  test("merged per-group HLL registers equal the directly-built sketch") {
    val direct = AnalyticsQueries.queries("a_hll_exact")(spark, sfDir).head()
    val merged = AnalyticsQueries.queries("a_hll_merge")(spark, sfDir).head()
    assert(merged.getAs[Long]("m_used") === direct.getAs[Long]("m_used"))
    assert(merged.getAs[Long]("reg_sum") === direct.getAs[Long]("reg_sum"))
  }

  test("an_funnel steps are monotone and latency sums are sane") {
    val rows = AnalyticsQueries.queries("an_funnel")(spark, sfDir)
      .collect().map(r => r.getAs[String]("step") ->
        (r.getAs[Long]("n_users"), Option(r.getAs[java.lang.Long]("sum_lag_us")))).toMap
    val (n1, n2, n3) =
      (rows("1_view")._1, rows("2_click")._1, rows("3_purchase")._1)
    assert(n1 >= n2 && n2 >= n3, s"funnel widened: $n1 -> $n2 -> $n3")
    val nUsers = Tables(spark, sfDir, "events")
      .select(col("user_id")).distinct().count()
    assert(n1 <= nUsers)
    // every converted user's step-lag is strictly positive (ts > prev step)
    assert(rows("1_view")._2.isEmpty, "step 1 has no predecessor lag")
    Seq("2_click", "3_purchase").foreach { s =>
      val (n, lag) = rows(s)
      if (n > 0) assert(lag.exists(_.longValue >= n),
        s"$s lag sum ${lag} below 1us per converted user")
    }
  }

  test("an_retention: offset 0 covers every user exactly once") {
    val rows = AnalyticsQueries.queries("an_retention")(spark, sfDir).collect()
    val nUsers = Tables(spark, sfDir, "events")
      .select(col("user_id")).distinct().count()
    val atZero = rows.filter(_.getAs[Int]("week_offset") == 0)
      .map(_.getAs[Long]("n_users")).sum
    assert(atZero == nUsers,
      s"offset-0 cohort total $atZero != distinct users $nUsers")
    val total = rows.map(_.getAs[Long]("n_users")).sum
    val userWeeks = Tables(spark, sfDir, "events")
      .select(col("user_id"),
        date_trunc("week", col("ts").cast("timestamp")).as("wk"))
      .distinct().count()
    assert(total == userWeeks,
      s"retention matrix total $total != distinct user-weeks $userWeeks")
  }

  test("an_markov transition counts sum to events minus users") {
    val rows = AnalyticsQueries.queries("an_markov")(spark, sfDir).collect()
    val total = rows.map(_.getAs[Long]("n_trans")).sum
    val ev = Tables(spark, sfDir, "events")
    val expected = ev.count() - ev.select(col("user_id")).distinct().count()
    assert(total == expected, s"transitions $total != |events|-|users| $expected")
    // n_from is the row total of its from_type group
    rows.groupBy(_.getAs[String]("from_type")).foreach { case (_, grp) =>
      val sumN = grp.map(_.getAs[Long]("n_trans")).sum
      grp.foreach(r => assert(r.getAs[Long]("n_from") == sumN))
      // ppm values of a row sum to <= 1e6 (floor) and > 1e6 - |group|
      val ppm = grp.map(_.getAs[Long]("ppm")).sum
      assert(ppm <= 1000000L && ppm > 1000000L - grp.length)
    }
  }

  test("a_mode picks the max count with the least-value tiebreak") {
    val got = AnalyticsQueries.queries("a_mode")(spark, sfDir).collect()
    val counts = Tables(spark, sfDir, "orders")
      .groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt")).collect()
      .groupBy(_.getAs[String]("o_orderstatus"))
    got.foreach { r =>
      val grp = counts(r.getAs[String]("o_orderstatus"))
      val maxCnt = grp.map(_.getAs[Long]("cnt")).max
      assert(r.getAs[Long]("n_mode") == maxCnt)
      val best = grp.filter(_.getAs[Long]("cnt") == maxCnt)
        .map(_.getAs[String]("o_orderpriority")).min
      assert(r.getAs[String]("mode_priority") == best)
    }
  }

  test("an_rfm: quartile labels in range and customers conserved") {
    val rows = AnalyticsQueries.queries("an_rfm")(spark, sfDir).collect()
    rows.foreach { r =>
      Seq("r_q", "f_q", "m_q").foreach { c =>
        val q = r.getAs[Int](c)
        assert(q >= 1 && q <= 4, s"$c=$q outside 1..4")
      }
    }
    val total = rows.map(_.getAs[Long]("n_customers")).sum
    val nCust = Tables(spark, sfDir, "orders")
      .select(col("o_custkey")).distinct().count()
    assert(total == nCust, s"segment matrix total $total != customers $nCust")
    // each dimension's quartiles are balanced within one customer
    Seq("r_q", "f_q", "m_q").foreach { c =>
      val byQ = rows.groupBy(_.getAs[Int](c)).view
        .mapValues(_.map(_.getAs[Long]("n_customers")).sum).values.toSeq
      assert(byQ.max - byQ.min <= 1, s"$c buckets unbalanced: $byQ")
    }
  }

  test("an_pareto: balanced deciles, monotone concentration, exact closure") {
    val rows = AnalyticsQueries.queries("an_pareto")(spark, sfDir)
      .collect().sortBy(_.getAs[Int]("decile"))
    assert(rows.map(_.getAs[Int]("decile")).toSeq == (1 to 10))
    val counts = rows.map(_.getAs[Long]("n_customers"))
    assert(counts.max - counts.min <= 1, s"deciles unbalanced: ${counts.toSeq}")
    val nCust = Tables(spark, sfDir, "orders")
      .select(col("o_custkey")).distinct().count()
    assert(counts.sum == nCust)
    val ppm = rows.map(_.getAs[Long]("cum_share_ppm"))
    assert(ppm.zip(ppm.tail).forall { case (a, b) => a <= b }, "share not monotone")
    assert(ppm.last == 1000000L, s"final cumulative share ${ppm.last} != 1e6 ppm")
    // deciles ranked by spend: per-decile revenue must be non-increasing
    val cents = rows.map(_.getAs[Long]("sum_cents"))
    assert(cents.zip(cents.tail).forall { case (a, b) => a >= b },
      "a later decile out-earned an earlier one")
  }

  test("an_cohort_ltv: offset-0 base, monotone cumulative, total closure") {
    val rows = AnalyticsQueries.queries("an_cohort_ltv")(spark, sfDir).collect()
    val totalCents = Tables(spark, sfDir, "orders")
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))).head().getLong(0)
    assert(rows.map(_.getAs[Long]("sum_cents")).sum == totalCents,
      "cohort matrix loses revenue")
    rows.groupBy(_.getAs[Any]("cohort_mo").toString).foreach { case (_, grp) =>
      val seq = grp.sortBy(_.getAs[Int]("month_offset"))
      assert(seq.head.getAs[Int]("month_offset") == 0,
        "a cohort's first offset must be its acquisition month")
      val cum = seq.map(_.getAs[Long]("cum_cents"))
      assert(cum.zip(cum.tail).forall { case (a, b) => a <= b })
      assert(cum.last == seq.map(_.getAs[Long]("sum_cents")).sum)
    }
  }

  test("an_abtest: arms partition the users and the verdict matches BigInt") {
    val r = AnalyticsQueries.queries("an_abtest")(spark, sfDir).head()
    val (n1, c1, n2, c2) = (r.getAs[Long]("n_control"), r.getAs[Long]("conv_control"),
      r.getAs[Long]("n_treat"), r.getAs[Long]("conv_treat"))
    val nUsers = Tables(spark, sfDir, "events")
      .select(col("user_id")).distinct().count()
    assert(n1 + n2 == nUsers, s"arms ${n1 + n2} != users $nUsers")
    assert(c1 <= n1 && c2 <= n2, "more conversions than users in an arm")
    assert(n1 > 0 && n2 > 0, "an empty arm makes the test vacuous")
    val (bn1, bc1, bn2, bc2) = (BigInt(n1), BigInt(c1), BigInt(n2), BigInt(c2))
    val diff = bc1 * bn2 - bc2 * bn1
    val C = bc1 + bc2; val N = bn1 + bn2
    val expected = BigInt(10000) * N * diff * diff >
      BigInt(38416) * C * (N - C) * bn1 * bn2
    assert(r.getAs[Boolean]("significant") == expected,
      s"engine verdict != exact BigInt replay ($n1,$c1,$n2,$c2)")
  }

  test("an_basket_pairs: support bounded by both sides, top-1 matches brute") {
    val rows = AnalyticsQueries.queries("an_basket_pairs")(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      assert(r.getAs[Long]("support") <=
        math.min(r.getAs[Long]("orders_a"), r.getAs[Long]("orders_b")),
        "pair support exceeds a member's own support")
    }
    val sup = rows.map(_.getAs[Long]("support"))
    assert(sup.zip(sup.tail).forall { case (a, b) => a >= b }, "not sorted by support")
    // brute-force the max support from the collected basket list
    val baskets = Tables(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .values.map(_.map(_._2).sorted)
    val counts = scala.collection.mutable.Map.empty[(Long, Long), Long].withDefaultValue(0L)
    baskets.foreach { items =>
      for (i <- items.indices; j <- (i + 1) until items.length)
        counts((items(i), items(j))) += 1L
    }
    assert(sup.head == counts.values.max, "top support != brute-force max")
  }

  test("an_rfm_hist: counting-rank segments hash-match ntile's") {
    val exact = AnalyticsQueries.queries("an_rfm")(spark, sfDir).collect()
    val hist = AnalyticsQueries.queries("an_rfm_hist")(spark, sfDir).collect()
    assert(hist.nonEmpty)
    assert(hist.toSeq == exact.toSeq,
      "histogram quartiles diverged from ntile quartiles")
  }

  test("an_basket_pairs_topk: certified prefix equals the exact top-20") {
    // At this sf the certification bound n/(K+1) < 1, so EVERY pair
    // certifies and the bounded-state path must reproduce the exact
    // key's full top-20 bit-for-bit (support ties included — MG
    // completeness covers every tie at the boundary).
    val exact = AnalyticsQueries.queries("an_basket_pairs")(spark, sfDir).collect()
    val topk = AnalyticsQueries.queries("an_basket_pairs_topk")(spark, sfDir).collect()
    assert(topk.nonEmpty, "no certified pairs at test sf")
    assert(topk.length <= exact.length)
    topk.zip(exact).foreach { case (a, b) =>
      assert(a == b, s"certified prefix diverged: $a vs $b")
    }
    // the certified set is a PREFIX of the exact ranking: if fewer than
    // 20 rows certify, they must be the first rows of the exact top-20
    assert(topk.length == exact.length || topk.length < 20)
  }

  test("an_attribution: floor-split credit conserves purchase mass") {
    val rows = AnalyticsQueries.queries("an_attribution")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val totalCredit = rows.map(_.getAs[Long]("credit_ppm_sum")).sum
    val totalPairs = rows.map(_.getAs[Long]("n_touches")).sum
    // purchases with >= 1 touch, computed independently
    val ev = Tables(spark, sfDir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("unix_micros(CAST(ts AS TIMESTAMP))").as("tus"))
    val nAttr = ev.filter(col("event_type") === "purchase").as("p")
      .join(ev.filter(col("event_type").isin("view", "click")).as("t"),
        col("p.user_id") === col("t.user_id")
          && col("t.tus") < col("p.tus")
          && col("t.tus") >= col("p.tus") - lit(7L * 86400000000L), "left_semi")
      .count()
    // each attributed purchase hands out 1e6 ppm minus a floor remainder
    // strictly below its touch count
    assert(totalCredit <= 1000000L * nAttr, "credit exceeds purchase mass")
    assert(totalCredit > 1000000L * nAttr - totalPairs,
      s"floor remainder too large: $totalCredit vs ${1000000L * nAttr} - $totalPairs")
  }

  test("an_stickiness: ppm within (0, 1e6] and month grain conserved") {
    val rows = AnalyticsQueries.queries("an_stickiness")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ppm = r.getAs[Long]("stickiness_ppm")
      assert(ppm > 0L && ppm <= 1000000L, s"stickiness $ppm outside (0, 1e6]")
      assert(r.getAs[Long]("sum_dau") >= r.getAs[Long]("mau"),
        "monthly actives exceed summed daily actives")
    }
  }

  test("an_new_vs_returning: new users sum to the user population") {
    val rows = AnalyticsQueries.queries("an_new_vs_returning")(spark, sfDir).collect()
    val nUsers = Tables(spark, sfDir, "events")
      .select(col("user_id")).distinct().count()
    assert(rows.map(_.getAs[Long]("n_new")).sum == nUsers,
      "every user must be new exactly once")
    assert(rows.head.getAs[Long]("n_returning") == 0L,
      "nobody can return on the first day of history")
    val userDays = Tables(spark, sfDir, "events")
      .select(col("user_id"), col("ts").cast("date")).distinct().count()
    assert(rows.map(r => r.getAs[Long]("n_new") + r.getAs[Long]("n_returning")).sum
      == userDays, "split must conserve user-days")
  }

  test("qa_key_skew: buckets conserve rows and the 2x-mean flag is exact") {
    val rows = AnalyticsQueries.queries("qa_key_skew")(spark, sfDir).collect()
    assert(rows.length <= 32 && rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("n_rows")).sum
    val liCount = Tables(spark, sfDir, "lineitem").count()
    assert(total == liCount, s"bucket total $total != lineitem rows $liCount")
    rows.foreach { r =>
      val expected = r.getAs[Long]("n_rows") * 32 > total * 2
      assert(r.getAs[Boolean]("hot") == expected,
        s"bucket ${r.getAs[Long]("bucket")} flag mismatch")
    }
  }

  test("an_gini matches a BigInt replay and sits in [0, 1e6)") {
    val r = AnalyticsQueries.queries("an_gini")(spark, sfDir).head()
    val gini = r.getAs[Long]("gini_ppm")
    assert(gini >= 0L && gini < 1000000L, s"gini $gini outside [0, 1e6)")
    // replay with the exact engine ordering: (cents asc, custkey asc)
    val ordered = Tables(spark, sfDir, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("c"))
      .collect().map(x => (x.getLong(1), x.getLong(0)))
      .sortBy(identity).map(_._1)
    val n = BigInt(ordered.length)
    val s2 = ordered.map(BigInt(_)).sum
    val w = ordered.zipWithIndex.map { case (x, i) =>
      (2 * BigInt(i + 1) - 1 - n) * x }.sum
    val expected = (w * 1000000) / (n * s2)
    assert(BigInt(gini) == expected, s"engine $gini != replay $expected")
  }

  test("qa_null_profile: distinct+null bounds hold and the PK profile is exact") {
    val rows = AnalyticsQueries.queries("qa_null_profile")(spark, sfDir).collect()
    assert(rows.length == 6)
    val nRows = rows.head.getAs[Long]("n_rows")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_null") + r.getAs[Long]("n_distinct") <= nRows + 1,
        s"${r.getAs[String]("column_name")}: impossible null/distinct profile")
    }
    val pk = rows.find(_.getAs[String]("column_name") == "o_orderkey").get
    assert(pk.getAs[Long]("n_null") == 0L && pk.getAs[Long]("n_distinct") == nRows,
      "order key is not a clean primary key in the profile")
  }

  test("a_approx_quantile: the GK summary's rank stays within epsilon") {
    import graft.queries.ExtendedQueries
    val rows = ExtendedQueries.queries("a_approx_quantile")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Boolean]("within_eps"),
      s"approx median for ${r.getString(0)} drifted beyond n/1000 in rank"))
  }

  test("w5_range_interval equals a per-row recomputation of the 30-day frame") {
    import graft.queries.ExtendedQueries
    val got = ExtendedQueries.queries("w5_range_interval")(spark, sfDir).collect()
    val orders = Tables(spark, sfDir, "orders")
      .filter(col("o_custkey") % 100 === 7)
      .select(col("o_custkey"), col("o_orderkey"),
        unix_timestamp(col("o_orderdate")).as("es"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byCust = orders.groupBy(_._1)
    got.foreach { r =>
      val (ck, ok) = (r.getLong(0), r.getLong(1))
      val me = orders.find(o => o._1 == ck && o._2 == ok).get
      val frame = byCust(ck).filter(o =>
        o._3 >= me._3 - 30L * 86400 && o._3 <= me._3)
      assert(r.getLong(3) === frame.map(_._4).sum, s"cents_30d wrong for $ok")
      assert(r.getLong(4) === frame.length.toLong, s"n_30d wrong for $ok")
    }
  }

  test("g_gap_fill: contiguous daily spine, zero-filled, conserves totals") {
    import graft.queries.ExtendedQueries
    val rows = ExtendedQueries.queries("g_gap_fill")(spark, sfDir).collect()
    val days = rows.map(_.getDate(0).toLocalDate)
    days.sliding(2).foreach { case Array(a, b) =>
      assert(b === a.plusDays(1), s"spine gap between $a and $b")
    case _ => }
    val ev = Tables(spark, sfDir, "events")
      .agg(count(lit(1)), sum(expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")))
      .head()
    assert(rows.map(_.getLong(1)).sum === ev.getLong(0), "event count not conserved")
    assert(rows.map(_.getLong(2)).sum === ev.getLong(1), "cents not conserved")
  }

  test("qa_freshness: lag is watermark-relative, statuses cover the thresholds") {
    import graft.queries.RelationalQueries
    val rows = RelationalQueries.queries("qa_freshness")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(2)).min === 0L,
      "the freshest source defines the watermark, so its lag must be exactly 0")
    rows.foreach { r =>
      val (lag, status) = (r.getLong(2), r.getString(3))
      val expect = if (lag <= 2L * 3600 * 1000) "fresh"
        else if (lag <= 12L * 3600 * 1000) "warn" else "stale"
      assert(status === expect, s"${r.getString(0)}: lag $lag classified $status")
    }
  }

  test("a_arg_minmax matches a direct per-group sort") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey").desc)
    val expected = Tables(spark, sfDir, "customer")
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("c_nationkey"), col("c_custkey").as("richest_custkey"))
    val got = AnalyticsQueries.queries("a_arg_minmax")(spark, sfDir)
      .select(col("c_nationkey"), col("richest_custkey"))
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
  }

  test("p_percentile fence: tiny budget refuses loudly, naming the hist twin") {
    // same governance as a_median (r15: percentile() is the same
    // value-buffering aggregate class, caught by the skew10 full suite)
    val s2 = spark.newSession()
    s2.conf.set("graft.maxMedianStateRows", "10")
    val e = intercept[IllegalArgumentException] {
      AnalyticsQueries.queries("p_percentile")(s2, sfDir).collect()
    }
    assert(e.getMessage.contains("p_percentile_hist"),
      s"fence message must name the bounded-state twin: ${e.getMessage}")
    assert(e.getMessage.contains("graft.maxMedianStateRows"),
      s"fence message must name the override knob: ${e.getMessage}")
    // the default budget passes the test corpus
    assert(AnalyticsQueries.queries("p_percentile")(spark, sfDir).collect().nonEmpty)
  }

  test("p_percentile_hist equals an exact driver-side quartile replay") {
    // brute-force the interpolating quantile in exact integer quarter-cent
    // units from the sorted cent values — the hist path's two-level prefix
    // sum and rank pick must reproduce it bit-for-bit
    val byStatus = Tables(spark, sfDir, "orders")
      .select(col("o_orderstatus"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("v"))
      .collect().groupBy(_.getString(0))
      .map { case (k, rs) => k -> rs.map(_.getLong(1)).sorted }
    def q4(vs: Array[Long], k: Int): Long = {
      val pos4 = (vs.length - 1L) * k
      val lo = (pos4 / 4).toInt
      val rem = pos4 % 4
      if (rem == 0) 4 * vs(lo) else 4 * vs(lo) + rem * (vs(lo + 1) - vs(lo))
    }
    val got = AnalyticsQueries.queries("p_percentile_hist")(spark, sfDir).collect()
    assert(got.nonEmpty && got.length == byStatus.size)
    got.foreach { r =>
      val vs = byStatus(r.getString(0))
      assert(r.getLong(1) == vs.length, s"${r.getString(0)}: n mismatch")
      assert(r.getLong(2) == q4(vs, 1), s"${r.getString(0)}: p25 mismatch")
      assert(r.getLong(3) == q4(vs, 2), s"${r.getString(0)}: median mismatch")
      assert(r.getLong(4) == q4(vs, 3), s"${r.getString(0)}: p75 mismatch")
    }
  }
}
