package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Time-series analytics over the events stream — the monitoring family
  * next to qa_volume_anomaly (count spikes) and qa_drift_psi (distribution
  * drift): smoothing and changepoint detection on the VALUE dimension.
  *
  * Both keys keep the engine's integer-exactness discipline: the EWMA's
  * α = 1/2 geometric weights are powers of two over a FIXED 16-event
  * horizon (so the smoothed value is one integer dot product — no float
  * recurrence whose rounding would diverge between engines), and the CUSUM
  * statistic is the cross-multiplied form n·prefix − k·total (the mean
  * subtraction scaled to integers before it happens, same trick as the PSI
  * monitor's 2pp flags).
  */
object TimeSeriesQueries {

  private type Q = (SparkSession, String) => DataFrame

  def queries: Map[String, Q] = Map(
    "ts_ewma" -> tsEwma,
    "ts_cusum" -> tsCusum
  )

  /** EWMA horizon: events beyond the 16th-most-recent carry weight
    * < 2⁻¹⁶ of the total — below cent resolution — so the truncation IS
    * the infinite recurrence at integer precision, not an approximation
    * knob. */
  private val Horizon = 16

  /** Per-user α=1/2 EWMA of the event value (integer cents) at each
    * user's LAST event, truncated to the trailing [[Horizon]] events.
    * scaled = Σᵢ cents(lag i) · 2^(15−i), weight-sum 2¹⁶−1; a missing lag
    * (user has fewer than 16 events) contributes zero — the standard
    * cold-start bias, identical on both engines by COALESCE.
    *
    * One window pass: all 16 lags share the single (user_id, ts,
    * event_id) sort — one Exchange + one sort of the events table, the
    * same shape as an_funnel. The keep-latest filter reuses the window's
    * partitioning (count over the same key), so nothing reshuffles. */
  private val tsEwma: Q = (s, dir) => {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val wAll = Window.partitionBy($"user_id")
    val scaled: Column = (0 until Horizon)
      .map(i => coalesce(lag($"cents", i).over(w), lit(0L)) *
        lit(1L << (Horizon - 1 - i)))
      .reduce(_ + _)
    Tables(s, dir, "events")
      .select($"user_id", $"event_id", $"ts",
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .withColumn("ewma_x", scaled)
      .withColumn("rn", row_number().over(w))
      .withColumn("n_events", count(lit(1)).over(wAll))
      .filter($"rn" === $"n_events")
      .select($"user_id", $"n_events", $"ewma_x")
      .orderBy($"user_id")
  }

  /** Offline CUSUM changepoint per event type over the daily value
    * series: the day k maximizing |n·Σᵢ≤ₖxᵢ − k·Σx| (the scaled cumulative
    * deviation from the global mean — exact integers, ties broken
    * earliest). The heavy input collapses to (type, day) grain in ONE
    * hash aggregate; the cumsum window and the argmax rank then touch
    * only the tiny daily table, so the per-type ordered pass costs
    * nothing at any corpus size — the a_mode two-level shape applied to
    * a sequential statistic. */
  private val tsCusum: Q = (s, dir) => {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val wSeq = Window.partitionBy($"event_type").orderBy($"day")
    val wAll = Window.partitionBy($"event_type")
    val wPick = Window.partitionBy($"event_type")
      .orderBy(abs($"cusum").desc, $"day".asc)
    Tables(s, dir, "events")
      .groupBy($"event_type", $"ts".cast("date").as("day"))
      .agg(sum(expr("CAST(round(value * 100) AS BIGINT)")).as("x"))
      .withColumn("k", row_number().over(wSeq).cast("long"))
      .withColumn("prefix", sum($"x").over(wSeq))
      .withColumn("n_days", count(lit(1)).over(wAll))
      .withColumn("total", sum($"x").over(wAll))
      .withColumn("cusum", $"n_days" * $"prefix" - $"k" * $"total")
      .withColumn("pick", row_number().over(wPick))
      .filter($"pick" === 1)
      .select($"event_type", $"day".as("cp_day"), abs($"cusum").as("cusum_abs"),
        $"n_days")
      .orderBy($"event_type")
  }

  private val EwmaTerms: String = (0 until Horizon)
    .map(i => s"COALESCE(LAG(cents, $i) OVER w, 0) * ${1L << (Horizon - 1 - i)}")
    .mkString(" + ")

  def oracle: Map[String, String] = Map(
    "ts_ewma" ->
      s"""WITH c AS (SELECT user_id, event_id, ts,
         |  CAST(round(value * 100) AS BIGINT) AS cents FROM events),
         |e AS (SELECT user_id,
         |  CAST($EwmaTerms AS BIGINT) AS ewma_x,
         |  ROW_NUMBER() OVER w AS rn,
         |  COUNT(*) OVER (PARTITION BY user_id) AS n_events
         | FROM c WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
         |SELECT user_id, n_events, ewma_x FROM e
         |WHERE rn = n_events ORDER BY user_id""".stripMargin,

    "ts_cusum" ->
      """WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |  CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
        | FROM events GROUP BY 1, 2),
        |c AS (SELECT event_type, day,
        |  CAST(ROW_NUMBER() OVER w AS BIGINT) AS k,
        |  SUM(x) OVER w AS prefix,
        |  COUNT(*) OVER (PARTITION BY event_type) AS n_days,
        |  SUM(x) OVER (PARTITION BY event_type) AS total
        | FROM d WINDOW w AS (PARTITION BY event_type ORDER BY day)),
        |s AS (SELECT *, n_days * prefix - k * total AS cusum,
        |  ROW_NUMBER() OVER (PARTITION BY event_type
        |    ORDER BY abs(n_days * prefix - k * total) DESC, day ASC) AS pick
        | FROM c)
        |SELECT event_type, day AS cp_day,
        | CAST(abs(cusum) AS BIGINT) AS cusum_abs, n_days
        |FROM s WHERE pick = 1 ORDER BY event_type""".stripMargin
  )
}
