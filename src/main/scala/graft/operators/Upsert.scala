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

  /** Merge into a parquet path via backup-then-swap.
    *
    * NOT atomic for concurrent readers: between rename(target→bak) and
    * rename(tmp→target) the target path briefly does not exist, so a reader
    * racing the swap can observe path-not-found and must retry. (True
    * read-atomicity needs a versioned-directory + pointer-file scheme, or a
    * table format with a transaction log — Delta/Iceberg's MERGE is the
    * drop-in at that point.) What IS guaranteed is crash-safety:
    *
    * Crash-safety contract: at every point either `target` or
    * `target.__bak_upsert` holds a complete copy of the pre-merge data, and
    * the backup is deleted only after the new target is verified in place.
    * A leftover `.__bak_upsert` with no target means a crash happened
    * between the two renames — the next call restores it before merging.
    * Each rename's boolean result is checked (HDFS-style FileSystems report
    * failure by returning false, not by throwing). */
  def intoParquet(path: String, updates: DataFrame, keys: Seq[String]): Unit = {
    import org.apache.hadoop.fs.Path
    val spark = updates.sparkSession
    val target = new Path(path)
    // Resolve the FS from the target's own URI — FileSystem.get(conf) would
    // return the *default* FS, which is wrong for s3a:// or cross-scheme paths.
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(path + ".__tmp_upsert")
    val bak = new Path(path + ".__bak_upsert")

    // Recover from a previous failed run: stale tmp is garbage; a stale bak
    // is the only surviving copy iff target is missing — restore it.
    if (fs.exists(tmp)) fs.delete(tmp, true)
    if (fs.exists(bak)) {
      if (!fs.exists(target)) {
        require(fs.rename(bak, target), s"failed to restore backup $bak to $target")
      } else fs.delete(bak, true)
    }

    val hadTarget = fs.exists(target)
    val merged =
      if (hadTarget) merge(spark.read.parquet(path), updates, keys)
      else updates
    merged.write.mode(SaveMode.Overwrite).parquet(tmp.toString)

    if (hadTarget) {
      require(fs.rename(target, bak), s"failed to move $target aside to $bak; aborting — data untouched")
    }
    if (!fs.rename(tmp, target)) {
      // Roll the backup straight back so the reader-visible path survives.
      if (hadTarget && !fs.rename(bak, target)) {
        throw new IllegalStateException(
          s"swap failed AND rollback failed: data preserved at $bak, target $target missing")
      }
      throw new IllegalStateException(s"failed to rename $tmp to $target; previous data restored")
    }
    if (hadTarget && fs.exists(target)) fs.delete(bak, true)
  }
}
