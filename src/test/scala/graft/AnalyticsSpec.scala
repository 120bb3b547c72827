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
