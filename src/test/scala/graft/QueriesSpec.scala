package graft

/** Every SparkEntry query must run end-to-end on sf0.001 and return rows.
  * Value-level correctness is checked against DuckDB by the driver (and
  * tools/oracle_check.py locally); this suite is the fast structural gate. */
class QueriesSpec extends SparkSpec {

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs and returns rows on sf0.001") {
      val df = fn(spark, sfDir)
      assert(df.columns.nonEmpty)
      assert(df.count() > 0, s"$name returned 0 rows")
    }
  }

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key exists in queries") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("scd2_apply genuinely exercises the incremental path (non-vacuous split)") {
    import org.apache.spark.sql.functions._
    // The oracle for scd2_apply is the one-shot rebuild, so the hash gate
    // proves apply ≡ rebuild — but only if BOTH slices of the cutoff are
    // non-empty. Pin that here so a data change can't silently turn the
    // equivalence proof into a tautology.
    val o = Tables(spark, sfDir, "orders")
      .select(col("o_orderdate").cast("date").as("d"))
    val cut = o.agg(date_sub(max(col("d")), 180)).head().getDate(0)
    val standing = o.filter(col("d") < lit(cut)).count()
    val incoming = o.filter(col("d") >= lit(cut)).count()
    assert(standing > 0, "standing slice empty: apply degenerates to a fresh build")
    assert(incoming > 0, "incoming slice empty: apply degenerates to a no-op")
    // and the applied history closes exactly the touched customers
    val hist = graft.queries.ExtendedQueries.queries("scd2_apply")(spark, sfDir)
    val openPerCust = hist.filter(col("is_current"))
      .groupBy(col("o_custkey")).count().filter(col("count") =!= 1).count()
    assert(openPerCust == 0, "a customer has zero or multiple current rows")
  }
}
