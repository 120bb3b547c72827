package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.streaming.Streams
import graft.queries.RelationalQueries

/** The bounded-output interval-join twin (VERDICT r15 #3, the skew100
  * rung): last-touch attribution semantics, the strict timeout emission
  * boundary, twin⊆exact containment on real data, and the candidate-mass
  * fence on the exact pair joins. */
class StreamLastTouchSpec extends SparkSpec {
  import StreamsSpec.AttrEvent

  private def ts(s: String) = Timestamp.valueOf(s)
  private def uts(s: String, micros: Int): Timestamp = {
    val t = Timestamp.valueOf(s); t.setNanos(t.getNanos + micros * 1000); t
  }

  private def drain(events: Seq[AttrEvent], tag: String,
      interval: String = "1 hour",
      watermark: String = "2 hours"): Set[(Long, Long, Long)] = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory(tag).toString
    events.toDS().coalesce(1).write.parquet(s"$dir/in")
    val in = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[AttrEvent]].schema)
      .parquet(s"$dir/in")
    Streams.lastTouchAttribution(in, interval, watermark)
      .writeStream.format("memory").queryName(tag)
      .option("checkpointLocation", s"$dir/ckpt")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start().awaitTermination()
    spark.table(tag).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  test("lastTouchAttribution: argmax (v_ts, view_id) selection, window " +
      "boundaries, cross-bucket coverage, strict bucket-end emission") {
    // wm anchor: view id 99 at 23:00 puts the final watermark at 21:00 —
    // every bucket below 21:00 times out; the anchor's own bucket does not
    val fixture = Seq(
      AttrEvent(ts("2024-01-01 23:00:00"), 9, "view", 99),
      // user 1: three qualifying views — latest (10:50) wins
      AttrEvent(ts("2024-01-01 10:10:00"), 1, "view", 11),
      AttrEvent(ts("2024-01-01 10:30:00"), 1, "view", 12),
      AttrEvent(ts("2024-01-01 10:50:00"), 1, "view", 13),
      AttrEvent(ts("2024-01-01 10:55:00"), 1, "purchase", 101),
      // user 2: same-µs tie — higher view_id wins
      AttrEvent(uts("2024-01-01 10:20:00", 7), 2, "view", 21),
      AttrEvent(uts("2024-01-01 10:20:00", 7), 2, "view", 22),
      AttrEvent(ts("2024-01-01 10:40:00"), 2, "purchase", 102),
      // user 3: CROSS-BUCKET — view 10:59, purchase 11:30 (view replicated
      // into bucket 11); also a too-old view at exactly p_ts − 1h (10:30,
      // EXCLUSIVE) that must lose even though it's in the window's bucket
      AttrEvent(ts("2024-01-01 10:30:00"), 3, "view", 31),
      AttrEvent(ts("2024-01-01 10:59:00"), 3, "view", 32),
      AttrEvent(ts("2024-01-01 11:30:00"), 3, "purchase", 103),
      // user 4: view exactly AT p_ts — inclusive, wins over the earlier one
      AttrEvent(ts("2024-01-01 10:10:00"), 4, "view", 41),
      AttrEvent(ts("2024-01-01 10:45:00"), 4, "view", 42),
      AttrEvent(ts("2024-01-01 10:45:00"), 4, "purchase", 104),
      // user 5: no qualifying view (view 2h earlier) — no row
      AttrEvent(ts("2024-01-01 08:00:00"), 5, "view", 51),
      AttrEvent(ts("2024-01-01 10:15:00"), 5, "purchase", 105),
      // user 6: purchase in the 20:00 bucket — bucket end 21:00 == wm is
      // NOT strictly below it: withheld even though its view qualifies
      AttrEvent(ts("2024-01-01 20:10:00"), 6, "view", 61),
      AttrEvent(ts("2024-01-01 20:20:00"), 6, "purchase", 106))
    assert(drain(fixture, "lt_semantics") === Set(
      (1L, 101L, 13L), (2L, 102L, 22L), (3L, 103L, 32L), (4L, 104L, 42L)))
    // move the anchor 1 ms later: wm = 21:00:00.001 > bucket end — user 6
    // emits; its latest view (20:20 > purchase? no — 20:10 < 20:20) wins
    val shifted = fixture.map {
      case e if e.event_id == 99 => e.copy(ts = uts("2024-01-01 23:00:00", 1000))
      case e => e
    }
    assert(drain(shifted, "lt_boundary") === Set(
      (1L, 101L, 13L), (2L, 102L, 22L), (3L, 103L, 32L), (4L, 104L, 42L),
      (6L, 106L, 61L)))
  }

  test("lastTouchAttribution generalizes past the 1-hour default: 15-minute " +
      "window semantics + the watermark-boundary flip (VERDICT r16 #5)") {
    // wm delay 30 min; the 12:00 anchor puts the final watermark at 11:30
    val fixture = Seq(
      AttrEvent(ts("2024-01-01 12:00:00"), 9, "view", 99),
      // user 1: two qualifying views in (9:55, 10:10] — latest (10:05) wins
      AttrEvent(ts("2024-01-01 10:02:00"), 1, "view", 11),
      AttrEvent(ts("2024-01-01 10:05:00"), 1, "view", 12),
      AttrEvent(ts("2024-01-01 10:10:00"), 1, "purchase", 101),
      // user 3: CROSS-BUCKET at the 15-min grid — view 10:13 (bucket
      // 10:00) replicated into the purchase's 10:15 bucket, wins over the
      // earlier 10:06 view that also rode the replication
      AttrEvent(ts("2024-01-01 10:06:00"), 3, "view", 31),
      AttrEvent(ts("2024-01-01 10:13:00"), 3, "view", 32),
      AttrEvent(ts("2024-01-01 10:20:00"), 3, "purchase", 103),
      // user 5: view at exactly p_ts − 15 min — EXCLUSIVE lower bound at
      // the generalized width: no row
      AttrEvent(ts("2024-01-01 10:05:00"), 5, "view", 51),
      AttrEvent(ts("2024-01-01 10:20:00"), 5, "purchase", 105),
      // user 6: purchase in the [11:15, 11:30) bucket — bucket end 11:30
      // == wm is NOT strictly below it: withheld
      AttrEvent(ts("2024-01-01 11:18:00"), 6, "view", 61),
      AttrEvent(ts("2024-01-01 11:20:00"), 6, "purchase", 106))
    assert(drain(fixture, "lt15_semantics", "15 minutes", "30 minutes") === Set(
      (1L, 101L, 12L), (3L, 103L, 32L)))
    // anchor 1 ms later: wm = 11:30:00.001 > bucket end — user 6 emits
    val shifted = fixture.map {
      case e if e.event_id == 99 => e.copy(ts = uts("2024-01-01 12:00:00", 1000))
      case e => e
    }
    assert(drain(shifted, "lt15_boundary", "15 minutes", "30 minutes") === Set(
      (1L, 101L, 12L), (3L, 103L, 32L), (6L, 106L, 61L)))
  }

  test("durationMs parses the streaming duration subset and rejects garbage " +
      "loudly (ADVICE r16)") {
    assert(Streams.durationMs("1 hour") === 3600000L)
    assert(Streams.durationMs("2 hours") === 7200000L)
    assert(Streams.durationMs("15 minutes") === 900000L)
    assert(Streams.durationMs("90 seconds") === 90000L)
    assert(Streams.durationMs("1 day") === 86400000L)
    intercept[IllegalArgumentException](Streams.durationMs("1 fortnight"))
    intercept[IllegalArgumentException](Streams.durationMs("1h"))
    intercept[IllegalArgumentException](Streams.durationMs("hour"))
  }

  test("twin containment on driver data: every last-touch row is a row of " +
      "the exact pair join, one per emitted matched purchase, and equals " +
      "the batch argmax replay") {
    import spark.implicits._
    val twin = RelationalQueries.queries("st_stream_join_last")(spark, sfDir)
      .as[(Long, Long, Long)].collect().toSet
    val e = Tables(spark, sfDir, "events")
    val p = e.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("purchase_id"), $"ts".as("p_ts"))
    val v = e.filter($"event_type" === "view")
      .select($"user_id", $"event_id".as("view_id"), $"ts".as("v_ts"))
    val pairs = p.join(v, Seq("user_id"))
      .filter($"v_ts" > $"p_ts" - expr("INTERVAL 1 HOUR") && $"v_ts" <= $"p_ts")
    val exact = pairs.select($"user_id", $"purchase_id", $"view_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(twin.subsetOf(exact), "twin must be contained in the exact join")
    assert(twin.map(r => (r._1, r._2)).size === twin.size,
      "exactly one row per purchase")
    // batch argmax replay, restricted to purchases whose bucket timed out
    val wmMs = e.filter($"event_type".isin("view", "purchase"))
      .agg(max(expr("unix_micros(CAST(ts AS TIMESTAMP)) div 1000")))
      .head().getLong(0) - 7200000L
    val argmax = pairs
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"user_id", $"purchase_id")
          .orderBy($"v_ts".desc, $"view_id".desc)))
      .filter($"rn" === 1)
      .filter(expr(s"((unix_micros(CAST(p_ts AS TIMESTAMP)) div 1000) div 3600000) * 3600000 + 3600000 < ${wmMs}L"))
      .select($"user_id", $"purchase_id", $"view_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(twin === argmax)
  }

  test("interval-join saturation fence: measured per-event pair mass, " +
      "refusal names the twin and the knob, override admits") {
    import spark.implicits._
    // one user, one hour, 50 views + 50 purchases: bucketed mass is
    // 50×50 = 2500 over 100 events = 25/event — over the 16 default
    val base = ts("2024-01-01 10:00:00").getTime
    val sat = (0 until 50).flatMap { i =>
      Seq(AttrEvent(new Timestamp(base + i * 1000L), 1, "view", 1000L + i),
        AttrEvent(new Timestamp(base + 1800000L + i * 1000L), 1, "purchase", 2000L + i))
    }
    val dir = java.nio.file.Files.createTempDirectory("lt_fence").toString
    sat.toDS().coalesce(1).write.parquet(s"$dir/events.parquet")
    assert(RelationalQueries.streamJoinPairWork(spark, dir) === 2500L)
    val err = intercept[IllegalArgumentException] {
      RelationalQueries.queries("st_stream_join")(spark, dir)
    }
    assert(err.getMessage.contains("st_stream_join_last"))
    assert(err.getMessage.contains("graft.maxStreamJoinPairsPerEvent"))
    val errL = intercept[IllegalArgumentException] {
      RelationalQueries.queries("st_stream_left_join")(spark, dir)
    }
    assert(errL.getMessage.contains("st_stream_left_join"))
    // deliberate override runs the exact join on the saturated corpus
    spark.conf.set("graft.maxStreamJoinPairsPerEvent", "100000")
    try {
      val n = RelationalQueries.queries("st_stream_join")(spark, dir).count()
      assert(n === 2500L, "50 views × 50 purchases all within the hour")
    } finally spark.conf.unset("graft.maxStreamJoinPairsPerEvent")
    // the twin runs the same corpus WITHOUT the override: one row per
    // purchase... for purchases below the final watermark — none here
    // (the whole fixture spans one hour, wm sits 2h behind max ts), so
    // extend with a far-future anchor and re-check
    val dir2 = java.nio.file.Files.createTempDirectory("lt_fence2").toString
    (sat :+ AttrEvent(new Timestamp(base + 6 * 3600000L), 9, "view", 9999))
      .toDS().coalesce(1).write.parquet(s"$dir2/events.parquet")
    val twin = RelationalQueries.queries("st_stream_join_last")(spark, dir2)
    assert(twin.count() === 50L, "one last-touch row per matched purchase")
  }
}
