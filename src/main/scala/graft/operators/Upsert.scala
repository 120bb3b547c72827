package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Keyed delete-then-insert upsert — the reference's signature stateful op
  * (ingest_latest_synthetic_data.py:505-589 local, :610-703 MotherDuck).
  *
  * Logical form: target ⟕anti updates ∪ updates. On plain parquet the write
  * is temp-dir + atomic rename (no MERGE primitive); on Delta/Iceberg the
  * same plan maps to MERGE. Updates are assumed already deduped to one row
  * per key (compose with [[DedupLatest]] first, as the reference does).
  *
  * Scale: the anti-join shuffles both sides on the key unless `updates` is
  * small enough to broadcast — which is the common case (daily increment vs
  * full history), and Catalyst/AQE picks the broadcast automatically.
  */
object Upsert {

  /** Pure merge of two DataFrames (no IO) — unit-testable core.
    * allowMissingColumns: updates may carry new columns (schema evolution);
    * surviving target rows get NULL there — pandas concat alignment parity
    * (ingest_latest:811-821). */
  def merge(target: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame =
    target.join(updates, keys, "left_anti")
      .unionByName(updates, allowMissingColumns = true)

  /** Merge into a parquet path with atomic swap semantics. */
  def intoParquet(path: String, updates: DataFrame, keys: Seq[String]): Unit = {
    val spark = updates.sparkSession
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val target = new org.apache.hadoop.fs.Path(path)
    val tmp = new org.apache.hadoop.fs.Path(path + ".__tmp_upsert")
    val merged =
      if (fs.exists(target)) merge(spark.read.parquet(path), updates, keys)
      else updates
    merged.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val bak = new org.apache.hadoop.fs.Path(path + ".__bak_upsert")
    if (fs.exists(target)) fs.rename(target, bak)
    fs.rename(tmp, target)
    fs.delete(bak, true)
  }
}
