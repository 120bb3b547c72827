package graft

import org.apache.spark.sql.functions._

import graft.operators.Bucketing

/** Bucketed layout must actually eliminate the join shuffle — asserted on
  * the physical plan, not assumed. */
class BucketingSpec extends SparkSpec {

  test("bucketed tables sort-merge join with no Exchange on either side") {
    Bucketing.writeBucketed(Tables(spark, sfDir, "orders"), "b_orders", "o_custkey", 8)
    Bucketing.writeBucketed(Tables(spark, sfDir, "customer"), "b_customer", "c_custkey", 8)
    try {
      // hint("merge") pins SMJ so the test proves bucket co-location, not
      // broadcast, removed the exchanges.
      val joined = spark.table("b_orders").hint("merge")
        .join(spark.table("b_customer"), col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      // And the layout is not just cosmetic — results match the plain join.
      val plain = Tables(spark, sfDir, "orders")
        .join(Tables(spark, sfDir, "customer"), col("o_custkey") === col("c_custkey"))
      assert(joined.count() === plain.count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }

  test("groupBy on the bucket key is also exchange-free") {
    Bucketing.writeBucketed(Tables(spark, sfDir, "orders"), "b_orders2", "o_custkey", 8)
    try {
      val agg = spark.table("b_orders2")
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed groupBy still shuffles:\n$plan")
      assert(agg.count() > 0)
    } finally spark.sql("DROP TABLE IF EXISTS b_orders2")
  }
}
