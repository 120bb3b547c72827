package graft

import org.apache.spark.sql.functions._

import graft.queries.TimeSeriesQueries

/** Semantic checks for the time-series pack beyond oracle value-equality:
  * the EWMA's dot-product bounds and user conservation, and CUSUM's
  * deviation-law invariants. */
class TimeSeriesSpec extends SparkSpec {

  test("ts_ewma covers every user once and stays within the value hull") {
    val rows = TimeSeriesQueries.queries("ts_ewma")(spark, sfDir).collect()
    val ev = Tables(spark, sfDir, "events")
      .select(col("user_id"), expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    val nUsers = ev.select(col("user_id")).distinct().count()
    assert(rows.length == nUsers, s"${rows.length} EWMA rows != $nUsers users")
    // weights sum to 2^16 - 1, each term is one event's cents (or a zero
    // pad): the scaled EWMA can never leave [min*(2^16-1), max*(2^16-1)]
    // extended to 0 by cold-start padding
    val mm = ev.agg(min(col("cents")), max(col("cents"))).head()
    val lo = math.min(0L, mm.getLong(0)) * 65535L
    val hi = math.max(0L, mm.getLong(1)) * 65535L
    rows.foreach { r =>
      val e = r.getAs[Long]("ewma_x")
      assert(e >= lo && e <= hi, s"user ${r.getAs[Long]("user_id")} ewma $e outside [$lo,$hi]")
    }
  }

  test("ts_ewma equals a per-user replay on a sampled user") {
    val user = Tables(spark, sfDir, "events")
      .groupBy(col("user_id")).count().orderBy(col("count").desc, col("user_id"))
      .head().getLong(0)
    val hist = Tables(spark, sfDir, "events")
      .filter(col("user_id") === user)
      .select(expr("unix_micros(CAST(ts AS TIMESTAMP))").as("tsus"), col("event_id"),
        expr("CAST(round(value * 100) AS BIGINT)").as("c"))
      .collect()
      .sortBy(r => (r.getAs[Long]("tsus"), r.getAs[Long]("event_id")))
      .map(_.getAs[Long]("c"))
    val last16 = hist.takeRight(16).reverse.padTo(16, 0L) // most recent first
    val expected = last16.zipWithIndex.map { case (c, i) => c * (1L << (15 - i)) }.sum
    val got = TimeSeriesQueries.queries("ts_ewma")(spark, sfDir)
      .filter(col("user_id") === user).head().getAs[Long]("ewma_x")
    assert(got == expected, s"user $user: engine $got != replay $expected")
  }

  test("ts_streaks equals a brute-force scan of the daily series") {
    val got = TimeSeriesQueries.queries("ts_streaks")(spark, sfDir).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("len"), r.getAs[Any]("end_day").toString)).toMap
    val daily = Tables(spark, sfDir, "events")
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(sum(expr("CAST(round(value * 100) AS BIGINT)")).as("x"))
      .collect()
      .groupBy(_.getAs[String]("event_type"))
    daily.foreach { case (t, rows) =>
      val series = rows
        .map(r => (java.time.LocalDate.parse(r.getAs[Any]("day").toString),
          r.getAs[Long]("x")))
        .sortBy(_._1.toEpochDay)
      var best = (0L, Option.empty[String])
      var cur = 0L
      var lastDown: java.time.LocalDate = null
      series.sliding(2).foreach {
        case Array((_, xa), (db, xb)) =>
          if (xb < xa) {
            // a run only continues across CALENDAR-consecutive down days
            // (the engine's island key is epoch-day minus row_number)
            cur = if (lastDown != null && db == lastDown.plusDays(1)) cur + 1 else 1L
            lastDown = db
            // ties break to the EARLIEST ending run: strict improvement only
            if (cur > best._1) best = (cur, Some(db.toString))
          } else cur = 0L
        case _ => ()
      }
      got.get(t) match {
        case Some((len, end)) =>
          assert(len == best._1 && Some(end) == best._2,
            s"$t: engine ($len, $end) != brute (${best._1}, ${best._2})")
        case None => assert(best._1 == 0L, s"$t missing but brute found ${best._1}")
      }
    }
  }

  test("ts_peak_concurrency equals a brute-force sweep and drains to zero") {
    val got = TimeSeriesQueries.queries("ts_peak_concurrency")(spark, sfDir)
      .collect()
      .map(r => r.getAs[Any]("day").toString -> r.getAs[Long]("peak_concurrency"))
      .toMap
    // brute force: rebuild sessions and sweep on the driver
    val ev = Tables(spark, sfDir, "events")
      .select(col("user_id"), expr("unix_micros(CAST(ts AS TIMESTAMP))").as("tus"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val gap = 30L * 60 * 1000000
    val deltas = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    ev.groupBy(_._1).values.foreach { rows =>
      val ts = rows.map(_._2).sorted
      var start = ts.head; var end = ts.head
      ts.tail.foreach { t =>
        if (t - end > gap) { deltas += ((start, 1L)); deltas += ((end + 1, -1L)); start = t }
        end = t
      }
      deltas += ((start, 1L)); deltas += ((end + 1, -1L))
    }
    var level = 0L
    val peaks = scala.collection.mutable.Map.empty[String, Long]
    var curDay: String = null
    deltas.groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
      .foreach { case (tus, net) =>
        val day = java.time.LocalDate.ofEpochDay(Math.floorDiv(tus, 86400000000L)).toString
        if (day != curDay) { curDay = day; peaks(day) = level } // carry-in
        level += net
        if (level > peaks(day)) peaks(day) = level
      }
    assert(level == 0L, s"sweep did not drain to zero: $level")
    assert(got == peaks.toMap, s"engine $got != brute ${peaks.toMap}")
  }

  test("ts_forecast_naive: |bias| bounded by MAE mass, lag-7 terms counted") {
    val rows = TimeSeriesQueries.queries("ts_forecast_naive")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(math.abs(r.getAs[Long]("sum_err_cents")) <=
        r.getAs[Long]("sum_abs_err_cents"),
        "bias magnitude exceeded total absolute error")
      assert(r.getAs[Long]("n_eval") > 0)
    }
  }

  test("ts_acf_lag7 matches a BigInt replay of the daily series") {
    val got = TimeSeriesQueries.queries("ts_acf_lag7")(spark, sfDir).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_terms"), BigInt(r.getAs[String]("acov_num")),
          BigInt(r.getAs[String]("var_num")))).toMap
    val daily = Tables(spark, sfDir, "events")
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(sum(expr("CAST(round(value * 100) AS BIGINT)")).as("x"))
      .collect().groupBy(_.getAs[String]("event_type"))
    daily.foreach { case (t, rows) =>
      val series = rows
        .map(r => (java.time.LocalDate.parse(r.getAs[Any]("day").toString).toEpochDay,
          r.getAs[Long]("x"))).sortBy(_._1)
      val n = BigInt(series.length)
      val sTot = series.map(r => BigInt(r._2)).sum
      val terms = series.drop(7).zip(series).filter { case ((d2, _), (d1, _)) => d2 - d1 == 7 }
      val acov = terms.map { case ((_, x), (_, xl)) => (n * x - sTot) * (n * xl - sTot) }.sum
      val vvar = terms.map { case ((_, x), _) => (n * x - sTot) * (n * x - sTot) }.sum
      got.get(t).foreach { case (nt, a, v) =>
        assert(nt == terms.length.toLong && a == acov && v == vvar,
          s"$t: engine ($nt, $a, $v) != replay (${terms.length}, $acov, $vvar)")
      }
      assert(terms.isEmpty == !got.contains(t))
    }
  }

  test("ts_session_stats: buckets partition the sweep's session set") {
    val rows = TimeSeriesQueries.queries("ts_session_stats")(spark, sfDir).collect()
    rows.foreach { r =>
      val b = r.getAs[Long]("depth_bucket")
      assert(b >= 1L && b <= 10L)
      assert(r.getAs[Long]("max_duration_us") <= r.getAs[Long]("sum_duration_us")
        || r.getAs[Long]("n_sessions") == 1L)
      // a depth-1 session spans one instant: zero duration
      if (b == 1L) assert(r.getAs[Long]("sum_duration_us") == 0L)
    }
    // total session count must equal the brute-force sweep's session count
    val ev = Tables(spark, sfDir, "events")
      .select(col("user_id"), expr("unix_micros(CAST(ts AS TIMESTAMP))").as("tus"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val gap = 30L * 60 * 1000000
    val nSessions = ev.groupBy(_._1).values.map { rs =>
      val ts = rs.map(_._2).sorted
      1 + ts.zip(ts.tail).count { case (a, b) => b - a > gap }
    }.sum
    assert(rows.map(_.getAs[Long]("n_sessions")).sum == nSessions.toLong)
  }

  test("ts_cusum picks the max |deviation| day and it is never the last day") {
    val rows = TimeSeriesQueries.queries("ts_cusum")(spark, sfDir).collect()
    val types = Tables(spark, sfDir, "events")
      .select(col("event_type")).distinct().count()
    assert(rows.length == types, "one changepoint row per event type")
    rows.foreach { r =>
      assert(r.getAs[Long]("cusum_abs") >= 0L)
      assert(r.getAs[Long]("n_days") >= 1L)
    }
    // CUSUM at k = n is exactly 0 (n*total - n*total); the argmax day can
    // only be the final day when the series never deviates at all, i.e.
    // cusum_abs == 0
    val lastDay = Tables(spark, sfDir, "events")
      .groupBy(col("event_type"))
      .agg(max(col("ts").cast("date")).as("last_day")).collect()
      .map(r => r.getAs[String](0) -> r.getAs[java.sql.Date](1)).toMap
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      if (r.getAs[Long]("cusum_abs") > 0L)
        assert(r.getAs[java.sql.Date]("cp_day") != lastDay(t),
          s"$t: nonzero CUSUM argmax landed on the zero-by-construction last day")
    }
  }
}
