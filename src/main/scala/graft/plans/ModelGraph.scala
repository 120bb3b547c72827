package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The layered-transform runner — the reference's dbt DAG re-expressed as
  * plain function composition (SURVEY §2.1 S10, §3 entry point 1).
  *
  * A model is a named `Map[name, DataFrame] => DataFrame`; `ref()` becomes
  * a map lookup. Materialization mirrors dbt_project.yml:19-30:
  *  - [[View]]: lazily composed (the DataFrame IS the view — Catalyst
  *    inlines it into downstream plans, enabling cross-model pushdown the
  *    reference only gets from DuckDB's view inlining);
  *  - [[Table]]: written to parquet and re-read, cutting the plan like a
  *    dbt table (reused intermediates computed once);
  *  - [[Incremental]]: high-watermark append — only source rows newer than
  *    `MAX(watermarkCol)` of the existing output are computed and appended
  *    (ref: fct_customer_orders.sql:18-20 is_incremental pattern).
  */
object ModelGraph {

  sealed trait Materialization
  case object View extends Materialization
  case object Table extends Materialization
  final case class Incremental(watermarkCol: String) extends Materialization

  /** Partition-replace merge for AGGREGATED incremental models (ref:
    * fct_customer_activity.sql:2, month-grain). High-watermark APPEND is
    * wrong for aggregates: the boundary group (e.g. the current month)
    * keeps accreting source rows, so its row must be re-derived, not
    * appended next to a stale copy. Refresh recomputes every group at or
    * past MAX(watermarkCol) of the store and replaces that range, carrying
    * strictly-older groups forward untouched. Because the filter lands on
    * a grouping column, Catalyst pushes it below the aggregate — the
    * recompute scans only the affected range of the source, not all of it. */
  final case class IncrementalMerge(watermarkCol: String) extends Materialization

  final case class Model(
      name: String,
      deps: Seq[String],
      build: Map[String, DataFrame] => DataFrame,
      materialization: Materialization = View)

  /** Kahn topological order; fails on cycles or missing deps. */
  def topoOrder(models: Seq[Model], sources: Set[String]): Seq[Model] = {
    val byName = models.map(m => m.name -> m).toMap
    val resolved = mutable.LinkedHashSet.empty[String] ++ sources
    val remaining = mutable.Queue.empty[Model] ++ models
    val out = mutable.ArrayBuffer.empty[Model]
    var stuckFor = 0
    while (remaining.nonEmpty) {
      val m = remaining.dequeue()
      m.deps.find(d => !resolved.contains(d)) match {
        case Some(d) if !byName.contains(d) && !sources.contains(d) =>
          throw new IllegalArgumentException(s"model ${m.name}: unknown dep $d")
        case Some(_) =>
          remaining.enqueue(m); stuckFor += 1
          if (stuckFor > remaining.size)
            throw new IllegalArgumentException(
              s"dependency cycle involving ${remaining.map(_.name).mkString(", ")}")
        case None =>
          resolved += m.name; out += m; stuckFor = 0
      }
    }
    out.toSeq
  }

  /** Compose the graph lazily over in-memory sources; returns every model's
    * DataFrame. Views stay unmaterialized — one Catalyst plan end-to-end. */
  def compose(models: Seq[Model], sources: Map[String, DataFrame]): Map[String, DataFrame] = {
    val acc = mutable.Map.empty[String, DataFrame] ++ sources
    topoOrder(models, sources.keySet).foreach { m =>
      acc(m.name) = m.build(acc.toMap)
    }
    acc.toMap -- sources.keys
  }

  /** Dependency levels: level(m) = 1 + max over deps — models in the same
    * level are independent by construction. */
  def levels(models: Seq[Model], sources: Set[String]): Seq[Seq[Model]] = {
    val lvl = mutable.Map.empty[String, Int] ++ sources.map(_ -> 0)
    val ordered = topoOrder(models, sources)
    // foldLeft, not .max: a source-free model (empty deps — valid input,
    // e.g. a seed/constant table) sits at level 1, not in an exception.
    ordered.foreach(m => lvl(m.name) = 1 + m.deps.map(lvl).foldLeft(0)(math.max))
    ordered.groupBy(m => lvl(m.name)).toSeq.sortBy(_._1).map(_._2)
  }

  /** Watermark-aggregate alias — named so no real model column collides. */
  private val WmAlias = "__graft_wm"

  /** Incremental bootstrap probe (parquet binding). Only genuine absence
    * returns false; a transient FS/permission error (or an OOM) must NOT
    * be silently read as "table missing" and trigger a full Overwrite
    * where an append was intended — anything but AnalysisException/
    * FileNotFoundException propagates. */
  private[graft] def tableExists(spark: SparkSession, path: String): Boolean =
    graft.sources.ParquetFormat.exists(spark, path)

  /** Materialize the graph under `base` honoring each model's
    * materialization — the `dbt run` analog.
    *
    * Models execute LEVEL-PARALLEL (like `dbt run --threads`): each
    * dependency level's Table/Incremental writes run as concurrent Spark
    * jobs, so the scheduler overlaps their stages across the cluster
    * instead of draining it between sequential small writes. `parallelism`
    * bounds concurrent jobs per level; results are identical to a
    * sequential run — same-level models share no edges by construction.
    *
    * Storage is pluggable through the [[graft.sources.TableFormat]] seam
    * (VERDICT r10 #5): the default [[graft.sources.ParquetFormat]] keeps
    * the historical plain-parquet layout; pass
    * [[graft.sources.VersionedParquetFormat]] for reader-atomic snapshot
    * publishes, or `IcebergFormat()` in a deployment that ships
    * iceberg-spark-runtime. The DAG/watermark/merge logic is identical
    * across bindings — only `read/append/replace` dispatch differs. */
  def run(spark: SparkSession, models: Seq[Model],
      sources: Map[String, DataFrame], baseDir: String,
      parallelism: Int = 4,
      format: graft.sources.TableFormat = graft.sources.ParquetFormat)
      : Map[String, DataFrame] = {
    val acc = mutable.Map.empty[String, DataFrame] ++ sources
    val fmt = format

    def materialize(m: Model, deps: Map[String, DataFrame]): DataFrame = {
      val path = fmt.ident(baseDir, m.name)
      val built = m.build(deps)
      m.materialization match {
        case View => built
        case Table =>
          fmt.overwrite(built, path)
          fmt.read(spark, path)
        case Incremental(wm) =>
          // A NULL watermark is unsupportable under high-watermark APPEND:
          // the row can never be compared against MAX(wm), so it would
          // either vanish (fails `>`) or duplicate on every refresh.
          // Fail loudly per-row instead of silently losing data —
          // assert_true returns NULL when the predicate holds, so the
          // filter passes every valid row and throws on the first NULL.
          val guarded = built.filter(assert_true(col(wm).isNotNull,
            lit(s"Incremental($wm): NULL watermark row — high-watermark append " +
              "cannot track it; filter NULLs upstream or use IncrementalMerge")).isNull)
          if (!fmt.exists(spark, path)) { // first run bootstraps the full build (SURVEY §7.4 #5)
            fmt.overwrite(guarded, path)
          } else {
            // reserved alias: a model watermarking on a column literally
            // named like the aggregate alias must not self-collide
            val watermark = fmt.read(spark, path).agg(max(col(wm)).as(WmAlias))
            fmt.append(guarded.crossJoin(broadcast(watermark))
              .filter(col(wm) > col(WmAlias)).drop(WmAlias), path)
          }
          fmt.read(spark, path)
        case IncrementalMerge(wm) =>
          // crash recovery FIRST: a merge that died mid-replace must be
          // repaired rather than letting the existence probe trigger a
          // fresh full rebuild (ParquetFormat restores an orphaned backup;
          // snapshot formats have nothing to repair).
          fmt.recover(spark, path)
          if (!fmt.exists(spark, path)) {
            fmt.overwrite(built, path)
          } else {
            val existing = fmt.read(spark, path)
            val watermark = existing.agg(max(col(wm)).as(WmAlias))
            val keep = existing.crossJoin(broadcast(watermark))
              .filter(col(wm) < col(WmAlias)).drop(WmAlias)
            // >= (not >): the boundary group is the one that accretes; an
            // all-null/empty store recomputes everything (isNull arm).
            // NULL-watermark rows route into fresh EXPLICITLY — they fail
            // both `< max` (keep) and `>= max` (fresh) under 3-valued
            // logic and would otherwise vanish on every refresh; since
            // keep ∪ fresh replaces the store, re-deriving them from the
            // new build each refresh is exactly right (no duplication).
            val fresh = built.crossJoin(broadcast(watermark))
              .filter(col(wm) >= col(WmAlias) || col(WmAlias).isNull ||
                col(wm).isNull).drop(WmAlias)
            // the merged frame reads from `path`; each format's replace()
            // handles the self-read safely (ParquetFormat stages to a
            // hidden sibling + swap, snapshot formats just publish v+1)
            fmt.replace(keep.unionByName(fresh), path)
          }
          fmt.read(spark, path)
      }
    }

    val pool = java.util.concurrent.Executors.newFixedThreadPool(math.max(1, parallelism))
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    try {
      levels(models, sources.keySet).foreach { level =>
        val snapshot = acc.toMap
        val built = scala.concurrent.Await.result(
          scala.concurrent.Future.sequence(level.map(m =>
            scala.concurrent.Future(m.name -> materialize(m, snapshot)))),
          scala.concurrent.duration.Duration.Inf)
        acc ++= built
      }
    } finally pool.shutdown()
    acc.toMap -- sources.keys
  }
}
