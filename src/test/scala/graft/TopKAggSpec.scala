package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TopKAgg

/** The bounded top-k aggregate must reproduce the rank-≤k window
  * (`row_number over (partition by g order by score desc, id)`)
  * EXACTLY — including double tiebreaks (NaN largest, -0.0 = 0.0,
  * NULLS LAST) — under any partitioning (the partial/merge path). */
class TopKAggSpec extends SparkSpec {

  private def viaWindow(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy(col("g")).orderBy(col("score").desc, col("id"))
    df.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("g"), col("rank"), col("id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
  }

  private def viaAgg(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy(col("g"))
      .agg(TopKAgg.byScore(col("score"), col("id"), k).as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("r", "t")))
      .select(col("g"), (col("r") + 1).as("rank"), col("t.id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

  test("matches the window on scores with ties, NaN, ±0.0 and nulls, any partitioning") {
    import spark.implicits._
    val rows = Seq(
      // g=1: plain ordering + a tie broken by id
      (1L, 0.9, 10L), (1L, 0.9, 7L), (1L, 0.5, 3L), (1L, 1.1, 99L), (1L, 0.2, 1L),
      // g=2: NaN must rank FIRST (Spark sorts NaN above every double)
      (2L, Double.NaN, 5L), (2L, 2.0, 4L), (2L, 3.0, 6L), (2L, 2.5, 2L),
      // g=3: -0.0 and 0.0 are EQUAL — tie breaks by id
      (3L, -0.0, 8L), (3L, 0.0, 4L), (3L, -1.0, 1L), (3L, 0.1, 9L),
      // g=4: fewer rows than k
      (4L, 0.7, 2L))
    val withNull = rows.map { case (g, s, i) => (g, Option(s), i) } ++
      // g=5: null scores rank LAST (desc ⇒ NULLS LAST); only surface when
      // fewer than k non-null rows exist
      Seq((5L, None, 3L), (5L, Some(0.4), 1L), (5L, None, 2L))
    for (parts <- Seq(1, 3, 16); k <- Seq(1, 2, 3)) {
      val df = withNull.toDF("g", "score", "id").repartition(parts)
      assert(viaAgg(df, k) == viaWindow(df, k),
        s"agg != window at parts=$parts k=$k")
    }
  }

  test("rank order inside the emitted array is the window's rank order") {
    import spark.implicits._
    val df = Seq((1L, 0.3, 30L), (1L, 0.9, 9L), (1L, 0.6, 6L)).toDF("g", "score", "id")
    val arr = df.groupBy(col("g"))
      .agg(TopKAgg.byScore(col("score"), col("id"), 3).as("top"))
      .select(col("top")("id")).as[Seq[Long]].head()
    assert(arr == Seq(9L, 6L, 30L))
  }
}
