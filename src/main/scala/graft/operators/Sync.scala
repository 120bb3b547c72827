package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Warehouse→warehouse table sync — the reference's "push local tables to
  * the remote warehouse" step (ingest_latest_synthetic_data.py:610-703,
  * local DuckDB → MotherDuck) re-expressed locally and Spark-first: the
  * destination is a [[VersionedTable]] store (atomic publish, snapshot
  * isolation), and ONLY tables whose content actually changed are copied.
  *
  * Change detection is a one-pass order-insensitive content fingerprint —
  * (row count, BIT_XOR of per-row xxhash64, exact decimal SUM of the same
  * hashes, schema DDL) — computed by a single aggregate on the source and
  * compared against the destination's recorded state. No sort, no
  * collect of data, no row-by-row diff: at 100 TB the unchanged tables
  * cost one map-side aggregate scan and the changed ones exactly one
  * write. XOR alone cancels duplicate row pairs; carrying the exact
  * decimal sum too makes the pair (xor, sum) robust to that.
  *
  * Destination state lives in `_sync_state.json` next to the version
  * dirs, written AFTER the version commits and KEYED TO the version it
  * fingerprints — on read the recorded version must equal the store's
  * current committed version or the state is discarded and the current
  * snapshot re-fingerprinted. That closes the concurrent-writer window:
  * two racing sync() calls may interleave version-write and state-write,
  * leaving a state file that describes the older snapshot, but the
  * version check detects the mismatch and falls back to re-fingerprinting
  * (one aggregate scan, never a spurious re-copy of unchanged content).
  * A crash between commit and state write heals the same way, so state
  * stays a cache, not a correctness dependency.
  */
object Sync {

  final case class Fingerprint(rows: Long, xor: Long, sum: BigDecimal, schema: String)

  private final case class SyncState(version: Long, fp: Fingerprint)

  final case class SyncResult(table: String, action: String, // copied | skipped
      version: Option[Long], rows: Long)

  /** One-pass content fingerprint; order-insensitive by construction.
    * Spark's XxHash64 SKIPS null inputs, so the bare column hash is
    * insensitive to which column a value sits in when its neighbor is
    * NULL — ('x', NULL) and (NULL, 'x') would collide systematically.
    * Folding a per-row is-null bitmap into the hash makes NULLs
    * positional; the bitmap is a codegen'd string build, still one
    * map-side pass. */
  def fingerprint(df: DataFrame): Fingerprint = {
    val cols = df.columns.map(col).toIndexedSeq
    val nullBitmap = concat_ws("", cols.map(c => when(c.isNull, "1").otherwise("0")): _*)
    val h = xxhash64(cols :+ nullBitmap: _*)
    val r = df.agg(
      count(lit(1)).as("n"),
      coalesce(bit_xor(h), lit(0L)).as("x"),
      coalesce(sum(h.cast("decimal(38,0)")), lit(BigDecimal(0))).as("s"))
      .head()
    // name + type only: parquet read-back flips nullability flags, and a
    // nullability-only difference must not read as "content changed"
    Fingerprint(r.getLong(0), r.getLong(1), BigDecimal(r.getDecimal(2)),
      df.schema.fields.map(f => s"${f.name} ${f.dataType.sql}").mkString(","))
  }

  /** Sync every (name → frame) into `dstRoot/<name>` versioned stores,
    * copying only changed tables. Returns one result per table. */
  def sync(spark: SparkSession, tables: Map[String, DataFrame],
      dstRoot: String): Seq[SyncResult] =
    tables.toSeq.sortBy(_._1).map { case (name, df) =>
      val root = s"$dstRoot/$name"
      val fp = fingerprint(df)
      val current = VersionedTable.currentVersion(spark, root)
      // State is trusted only when it describes the live snapshot — a
      // racing writer or a crash leaves state pointing at an older (or
      // never-committed) version; then re-fingerprint the current one.
      val valid = recordedState(spark, root).filter(st => current.contains(st.version))
      val known = valid.map(_.fp)
        .orElse(current.map(_ => fingerprint(VersionedTable.read(spark, root))))
      if (known.contains(fp)) {
        // heal a stale/missing state file so the NEXT sync skips on the
        // cached fingerprint instead of re-scanning the destination
        if (valid.isEmpty) current.foreach(v => writeState(spark, root, v, fp))
        SyncResult(name, "skipped", current, fp.rows)
      } else {
        val v = VersionedTable.write(df, root)
        writeState(spark, root, v, fp)
        SyncResult(name, "copied", Some(v), fp.rows)
      }
    }

  // ------------------------------------------------------------- state --

  private def statePath(root: String) = new Path(s"$root/_sync_state.json")

  private def recordedState(spark: SparkSession, root: String): Option[SyncState] = {
    val p = statePath(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val raw = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    def field(k: String): Option[String] =
      s""""$k":"((?:[^"\\\\]|\\\\.)*)"""".r.findFirstMatchIn(raw).map(_.group(1))
    for {
      v <- field("version") // absent in pre-versioned state files → None → re-fingerprint
      n <- field("rows"); x <- field("xor"); s <- field("sum"); d <- field("schema")
    } yield SyncState(v.toLong, Fingerprint(n.toLong, x.toLong, BigDecimal(s),
      d.replace("\\\"", "\"").replace("\\\\", "\\")))
  }

  private def writeState(spark: SparkSession, root: String, version: Long,
      fp: Fingerprint): Unit = {
    val p = statePath(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val esc = fp.schema.replace("\\", "\\\\").replace("\"", "\\\"")
    val json = s"""{"version":"$version","rows":"${fp.rows}","xor":"${fp.xor}",""" +
      s""""sum":"${fp.sum}","schema":"$esc"}"""
    val out = fs.create(p, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
  }
}
