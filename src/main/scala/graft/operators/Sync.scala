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
  * dirs, written AFTER the version commits — a crash between commit and
  * state write just re-fingerprints (or re-copies) on the next run,
  * never publishes a torn table. A missing state file falls back to
  * re-fingerprinting the destination's current version, so state is a
  * cache, not a correctness dependency.
  */
object Sync {

  final case class Fingerprint(rows: Long, xor: Long, sum: BigDecimal, schema: String)

  final case class SyncResult(table: String, action: String, // copied | skipped
      version: Option[Long], rows: Long)

  /** One-pass content fingerprint; order-insensitive by construction. */
  def fingerprint(df: DataFrame): Fingerprint = {
    val h = xxhash64(df.columns.map(col).toIndexedSeq: _*)
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
      val known = recordedState(spark, root)
        .orElse(VersionedTable.currentVersion(spark, root)
          .map(_ => fingerprint(VersionedTable.read(spark, root))))
      if (known.contains(fp))
        SyncResult(name, "skipped", VersionedTable.currentVersion(spark, root), fp.rows)
      else {
        val v = VersionedTable.write(df, root)
        writeState(spark, root, fp)
        SyncResult(name, "copied", Some(v), fp.rows)
      }
    }

  // ------------------------------------------------------------- state --

  private def statePath(root: String) = new Path(s"$root/_sync_state.json")

  private def recordedState(spark: SparkSession, root: String): Option[Fingerprint] = {
    val p = statePath(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val raw = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    def field(k: String): Option[String] =
      s""""$k":"((?:[^"\\\\]|\\\\.)*)"""".r.findFirstMatchIn(raw).map(_.group(1))
    for {
      n <- field("rows"); x <- field("xor"); s <- field("sum"); d <- field("schema")
    } yield Fingerprint(n.toLong, x.toLong, BigDecimal(s),
      d.replace("\\\"", "\"").replace("\\\\", "\\"))
  }

  private def writeState(spark: SparkSession, root: String, fp: Fingerprint): Unit = {
    val p = statePath(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val esc = fp.schema.replace("\\", "\\\\").replace("\"", "\\\"")
    val json =
      s"""{"rows":"${fp.rows}","xor":"${fp.xor}","sum":"${fp.sum}","schema":"$esc"}"""
    val out = fs.create(p, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
  }
}
