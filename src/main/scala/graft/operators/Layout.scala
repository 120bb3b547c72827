package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Physical table layout — partitioned directories and file compaction.
  *
  * At 100 TB the dominant scan costs are (a) reading partitions a query
  * doesn't need and (b) opening millions of small files. The fixes are
  * layout-time, not query-time: write facts partitioned by their hottest
  * filter column (date, almost always — every incremental mart in the
  * reference filters on it, e.g. the high-watermark predicate in
  * dbt/dbt_duckdb/models/ecom_marts/customer/fct_customer_orders.sql:18-20),
  * and periodically compact each partition's accumulated micro-batch files
  * into ~target-sized ones. Partition pruning then happens at PLANNING
  * time — a `WHERE event_date = X` query lists one directory no matter how
  * large the table is ([[LayoutSpec]] asserts this on the scan's numFiles
  * metric, not by hoping).
  */
object Layout {

  /** Write `df` partitioned by `cols` (query-filter columns, coarsest
    * first). `maxRecordsPerFile` bounds file size so one skewed partition
    * (e.g. a flash-sale day) still parallelizes on read. */
  def writePartitioned(df: DataFrame, path: String, cols: Seq[String],
                       maxRecordsPerFile: Long = 5000000L): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(cols: _*)
      .parquet(path)

  /** Compact one directory of parquet files (a single partition, or a flat
    * unpartitioned table) to ~`targetBytes` files. Rewrites only when the
    * directory has more files than the target layout needs, via
    * write-tmp + backup-then-swap (same crash-safety contract as
    * [[Upsert.intoParquet]]: a complete copy exists at every instant;
    * readers racing the swap may see a transient missing path).
    * Returns (filesBefore, filesAfter). */
  def compact(spark: SparkSession, dir: String,
              targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val target = new Path(dir)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(dir + ".__tmp_compact")
    val bak = new Path(dir + ".__bak_compact")
    // Crash recovery FIRST — after a crash between the two swap renames the
    // target may not exist at all, and only then is the file census valid.
    if (fs.exists(tmp)) fs.delete(tmp, true)
    if (fs.exists(bak)) {
      if (!fs.exists(target))
        require(fs.rename(bak, target), s"failed to restore backup $bak")
      else fs.delete(bak, true)
    }

    val parts = leafParquetFiles(fs, target)
    val totalBytes = parts.map(_.getLen).sum
    val wanted = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    if (parts.length <= wanted) return (parts.length, parts.length)
    // coalesce, not repartition: compaction must not pay a shuffle — it
    // only concatenates co-located row groups into fewer files.
    spark.read.parquet(dir).coalesce(wanted)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    require(fs.rename(target, bak), s"failed to move $target aside")
    if (!fs.rename(tmp, target)) {
      require(fs.rename(bak, target), s"swap+rollback both failed for $target")
      throw new IllegalStateException(s"failed to rename $tmp to $target; original restored")
    }
    fs.delete(bak, true)
    (parts.length, leafParquetFiles(fs, target).length)
  }

  /** Compact every `key=value` partition directory under `root` that
    * exceeds the target layout. Partitions compact independently — at
    * scale this loop is itself parallelizable per partition. */
  def compactPartitioned(spark: SparkSession, root: String,
                         targetBytes: Long = 128L * 1024 * 1024): Map[String, (Int, Int)] = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(rootPath).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.contains("="))
      .map(s => s.getPath.getName -> compact(spark, s.getPath.toString, targetBytes))
      .toMap
  }

  private def leafParquetFiles(fs: FileSystem, dir: Path) =
    fs.listStatus(dir).toSeq.filter(s =>
      s.isFile && s.getPath.getName.endsWith(".parquet"))
}
