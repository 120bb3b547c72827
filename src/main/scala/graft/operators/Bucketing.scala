package graft.operators

import org.apache.spark.sql.DataFrame

/** Bucketed-table layout — the shuffle-elimination tool for joins that
  * repeat on the same key (fact⟗dim snapshots, incremental upserts,
  * repeated fact-fact joins on order keys).
  *
  * Writing both sides bucketed by the join key with the same bucket count
  * lets Spark plan a sort-merge join with NO Exchange on either side: each
  * bucket pair is joined task-local. At 100 TB the one-time bucketed write
  * costs a shuffle, and every subsequent join of the two tables saves one —
  * the break-even is a single reuse, and a daily pipeline reuses the layout
  * hundreds of times. (The same layout also makes per-key windows and
  * groupBys exchange-free when the grouping key prefixes the bucket key.)
  *
  * The reference's DuckDB single-file layout has no analogue — this is
  * Spark-native physical design, the piece a migration to a cluster engine
  * buys.
  */
object Bucketing {

  /** Write `df` as a managed parquet table bucketed and sorted by `key`.
    * Bucket counts must match across tables that will join. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)
}
