package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keep-latest-per-key dedup — the reference's P8/W1 operator
  * (pandas sort+drop_duplicates at ingest_latest_synthetic_data.py:163-194;
  * FIRST_VALUE window at transactions/order_items.sql:28-37).
  *
  * Implemented as a rank-1 window, NOT `dropDuplicates`: dropDuplicates keeps
  * an arbitrary row per key, which is nondeterministic under retries and
  * shuffles. The window form shuffles once on the key (same cost as any
  * groupBy on that key) and is deterministic given a total tiebreak order.
  *
  * Scale: one hash-partition shuffle on `keys`; skewed keys are handled by
  * AQE. No driver-side state.
  */
object DedupLatest {
  def apply(df: DataFrame, keys: Seq[String], orderDesc: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderDesc.map(_.desc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
