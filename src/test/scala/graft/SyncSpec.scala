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

  test("fingerprint distinguishes which column holds the NULL") {
    import spark.implicits._
    // XxHash64 skips NULL inputs — without the positional null bitmap these
    // two frames hash identically and a changed table reports "skipped".
    val a = Seq((Option("x"), Option.empty[String]), (Option("y"), Option("z")))
      .toDF("c1", "c2")
    val b = Seq((Option.empty[String], Option("x")), (Option("y"), Option("z")))
      .toDF("c1", "c2")
    assert(Sync.fingerprint(a) != Sync.fingerprint(b))

    val dst = Files.createTempDirectory("sync_null").toString
    Sync.sync(spark, Map("t" -> a), dst)
    val r = Sync.sync(spark, Map("t" -> b), dst)
    assert(r.head.action == "copied", "null-position swap must be detected as change")
  }

  test("stale state from a racing writer is caught by version keying") {
    val dst = Files.createTempDirectory("sync_race").toString
    Sync.sync(spark, Map("orders" -> t1), dst) // v=1, state describes v=1
    // A racing writer commits v=2 with new content, but its state write
    // never lands — the state file still describes v=1.
    val changed = t1.withColumn("v", col("v") * 2)
    VersionedTable.write(changed, s"$dst/orders")
    // Version-keyed state: recorded version 1 != current 2 → state is
    // discarded and the CURRENT snapshot re-fingerprinted, which already
    // holds this content → skipped. (Trusting the stale state would have
    // diffed against v=1's fingerprint and spuriously re-copied as v=3.)
    val r = Sync.sync(spark, Map("orders" -> changed), dst)
    assert(r.head.action == "skipped", s"spurious re-copy: $r")
    assert(VersionedTable.listVersions(spark, s"$dst/orders") == Seq(1L, 2L))
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

  test("s8_sync_fingerprint key: copy-then-skip actions, rerun-stable fingerprints") {
    val run1 = queries.E2EQueries.queries("s8_sync_fingerprint")(
      spark, "/root/testdata/sf0.001").collect()
    assert(run1.map(_.getString(0)).toSeq == Seq("customer", "orders"))
    run1.foreach { r =>
      assert(r.getString(1) == "copied" && r.getString(2) == "skipped",
        s"sync actions wrong for ${r.getString(0)}: $r")
      assert(r.getLong(3) > 0, "empty table fingerprinted")
    }
    // the whole flow reruns into the same per-process store: the second
    // invocation wipes and re-syncs, and the content fingerprint — the
    // graded value — must be bit-stable across runs
    val run2 = queries.E2EQueries.queries("s8_sync_fingerprint")(
      spark, "/root/testdata/sf0.001").collect()
    assert(run1.toSeq == run2.toSeq, "fingerprint not rerun-stable")
  }
}
