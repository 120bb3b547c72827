package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.{Sync, VersionedTable}

/** S8 local equivalent: warehouse→warehouse sync with change detection —
  * only tables whose content changed are copied, destinations publish as
  * versioned snapshots. */
class SyncSpec extends SparkSpec {

  private def t1 = {
    import spark.implicits._
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)).toDF("id", "name", "v")
  }
  private def t2 = {
    import spark.implicits._
    Seq((1L, "2024-01-01"), (2L, "2024-01-02")).toDF("k", "d")
  }

  test("first sync copies everything; unchanged re-sync copies nothing") {
    val dst = Files.createTempDirectory("sync1").toString
    val r1 = Sync.sync(spark, Map("orders" -> t1, "dates" -> t2), dst)
    assert(r1.map(r => r.table -> r.action).toMap ==
      Map("orders" -> "copied", "dates" -> "copied"))
    assert(VersionedTable.read(spark, s"$dst/orders").count() == 3)

    val r2 = Sync.sync(spark, Map("orders" -> t1, "dates" -> t2), dst)
    assert(r2.forall(_.action == "skipped"), s"unexpected copies: $r2")
    assert(VersionedTable.listVersions(spark, s"$dst/orders") == Seq(1L))
  }

  test("only the changed table re-syncs, as a new version") {
    val dst = Files.createTempDirectory("sync2").toString
    Sync.sync(spark, Map("orders" -> t1, "dates" -> t2), dst)
    val changed = t1.withColumn("v", col("v") * 2)
    val r = Sync.sync(spark, Map("orders" -> changed, "dates" -> t2), dst)
    assert(r.map(x => x.table -> x.action).toMap ==
      Map("orders" -> "copied", "dates" -> "skipped"))
    assert(VersionedTable.listVersions(spark, s"$dst/orders") == Seq(1L, 2L))
    // the published snapshot is the new content; v=1 still time-travels
    assert(VersionedTable.read(spark, s"$dst/orders")
      .agg(sum("v")).head().getDouble(0) == 120.0)
    assert(VersionedTable.readVersion(spark, s"$dst/orders", 1L)
      .agg(sum("v")).head().getDouble(0) == 60.0)
  }

  test("fingerprint is order-insensitive but row- and schema-sensitive") {
    val shuffled = t1.orderBy(rand(7))
    assert(Sync.fingerprint(t1) == Sync.fingerprint(shuffled))
    assert(Sync.fingerprint(t1) != Sync.fingerprint(t1.limit(2)))
    assert(Sync.fingerprint(t1) !=
      Sync.fingerprint(t1.withColumnRenamed("v", "w")))
  }

  test("missing state file self-heals by re-fingerprinting the destination") {
    val dst = Files.createTempDirectory("sync3").toString
    Sync.sync(spark, Map("orders" -> t1), dst)
    // simulate a crash between version commit and state write
    new java.io.File(s"$dst/orders/_sync_state.json").delete()
    val r = Sync.sync(spark, Map("orders" -> t1), dst)
    assert(r.head.action == "skipped", "unchanged content must not re-copy")
    assert(VersionedTable.listVersions(spark, s"$dst/orders") == Seq(1L))
  }
}
