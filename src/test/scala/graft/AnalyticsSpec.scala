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
}
