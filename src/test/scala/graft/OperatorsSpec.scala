package graft

import org.apache.spark.sql.functions._
import graft.operators.{DedupLatest, Upsert}

class OperatorsSpec extends SparkSpec {

  test("DedupLatest keeps exactly the latest row per key with tiebreak") {
    import spark.implicits._
    val df = Seq(
      ("u1", 1L, "a"), ("u1", 3L, "b"), ("u1", 3L, "a"), // tie on ts=3 -> larger id wins? order is (ts, tag) desc
      ("u2", 5L, "z")).toDF("k", "ts", "tag")
    val got = DedupLatest(df, Seq("k"), Seq($"ts", $"tag"))
      .orderBy($"k").as[(String, Long, String)].collect().toSeq
    assert(got == Seq(("u1", 3L, "b"), ("u2", 5L, "z")))
  }

  test("Upsert.merge replaces keyed rows and appends new keys") {
    import spark.implicits._
    val target = Seq(("k1", 1), ("k2", 2)).toDF("k", "v")
    val updates = Seq(("k2", 20), ("k3", 30)).toDF("k", "v")
    val got = Upsert.merge(target, updates, Seq("k"))
      .orderBy($"k").as[(String, Int)].collect().toSeq
    assert(got == Seq(("k1", 1), ("k2", 20), ("k3", 30)))
  }

  test("Upsert.intoParquet: create then merge with atomic swap") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("upsert").toString
    val path = s"$dir/t.parquet"
    Upsert.intoParquet(path, Seq(("k1", 1), ("k2", 2)).toDF("k", "v"), Seq("k"))
    Upsert.intoParquet(path, Seq(("k2", 20), ("k3", 30)).toDF("k", "v"), Seq("k"))
    val got = spark.read.parquet(path).orderBy($"k").as[(String, Int)].collect().toSeq
    assert(got == Seq(("k1", 1), ("k2", 20), ("k3", 30)))
  }

  test("Upsert.intoParquet recovers a stale backup from a crashed swap") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("upsert_rec").toString
    val path = s"$dir/t.parquet"
    // Simulate a crash between the two renames: data sits at .__bak_upsert,
    // target is missing, and a half-written tmp dir is lying around.
    Seq(("k1", 1)).toDF("k", "v").write.parquet(path + ".__bak_upsert")
    new java.io.File(path + ".__tmp_upsert").mkdirs()
    Upsert.intoParquet(path, Seq(("k2", 2)).toDF("k", "v"), Seq("k"))
    val got = spark.read.parquet(path).orderBy($"k").as[(String, Int)].collect().toSeq
    // k1 was restored from the backup before merging in k2
    assert(got == Seq(("k1", 1), ("k2", 2)))
    assert(!new java.io.File(path + ".__bak_upsert").exists())
    assert(!new java.io.File(path + ".__tmp_upsert").exists())
  }
}
