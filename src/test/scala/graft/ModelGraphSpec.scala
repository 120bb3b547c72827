package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.plans.ModelGraph
import graft.plans.ModelGraph.{Incremental, Model, Table, View}

class ModelGraphSpec extends SparkSpec {

  private def sources = {
    import spark.implicits._
    Map("orders" -> Seq(
      (1L, "2024-01-01", 10.0), (2L, "2024-01-02", 20.0), (3L, "2024-01-02", 5.0))
      .toDF("order_id", "order_date", "total"))
  }

  private val staging = Model("stg_orders", Seq("orders"),
    deps => deps("orders").select(col("order_id"),
      col("order_date").cast("date").as("order_date"), col("total")))

  private val mart = Model("fct_daily", Seq("stg_orders"),
    deps => deps("stg_orders").groupBy("order_date")
      .agg(count(lit(1)).as("n"), sum("total").as("day_total")),
    Table)

  test("topoOrder resolves deps and rejects cycles") {
    val ordered = ModelGraph.topoOrder(Seq(mart, staging), Set("orders"))
    assert(ordered.map(_.name) == Seq("stg_orders", "fct_daily"))
    val cyc = Seq(
      Model("a", Seq("b"), _ => sources("orders")),
      Model("b", Seq("a"), _ => sources("orders")))
    intercept[IllegalArgumentException](ModelGraph.topoOrder(cyc, Set.empty))
  }

  test("compose builds the lazy DAG; run materializes tables") {
    val composed = ModelGraph.compose(Seq(staging, mart), sources)
    assert(composed("fct_daily").count() == 2)

    val dir = Files.createTempDirectory("mg").toString
    val out = ModelGraph.run(spark, Seq(staging, mart), sources, dir)
    assert(out("fct_daily").count() == 2)
    assert(Files.exists(java.nio.file.Paths.get(s"$dir/fct_daily")))
    assert(!Files.exists(java.nio.file.Paths.get(s"$dir/stg_orders"))) // view
  }

  test("incremental materialization appends only rows past the watermark") {
    import spark.implicits._
    val dir = Files.createTempDirectory("mginc").toString
    val inc = Model("fct_inc", Seq("stg_orders"),
      deps => deps("stg_orders"), Incremental("order_date"))

    ModelGraph.run(spark, Seq(staging, inc), sources, dir)
    assert(spark.read.parquet(s"$dir/fct_inc").count() == 3) // bootstrap full build

    val more = Map("orders" -> (sources("orders") unionByName Seq(
      (4L, "2024-01-03", 7.0), (0L, "2023-12-31", 1.0)) // one new, one late
      .toDF("order_id", "order_date", "total")))
    ModelGraph.run(spark, Seq(staging, inc), more, dir)
    val ids = spark.read.parquet(s"$dir/fct_inc")
      .select("order_id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L, 4L)) // late row 0 filtered, no re-appends
  }

  test("Incremental rejects NULL watermarks loudly; IncrementalMerge keeps them") {
    import spark.implicits._
    import graft.plans.ModelGraph.IncrementalMerge
    def withNull = Map("orders" -> Seq(
      (1L, Option("2024-01-01"), 10.0), (2L, Option("2024-01-02"), 20.0),
      (9L, Option.empty[String], 99.0)) // NULL watermark row
      .toDF("order_id", "order_date", "total"))

    // Incremental: a NULL wm row can never be high-watermark-tracked —
    // silently dropping it (the old 3-valued-logic behavior) loses data,
    // so the build must fail loudly instead.
    val inc = Model("fct_inc", Seq("orders"), d => d("orders"), Incremental("order_date"))
    val e = intercept[Exception] {
      ModelGraph.run(spark, Seq(inc), withNull,
        Files.createTempDirectory("mgnull1").toString)
    }
    assert(e.getMessage != null || e.getCause != null) // job fails, store untouched

    // IncrementalMerge: NULL-wm rows route into the fresh branch — they
    // survive every refresh (re-derived, not duplicated, not dropped).
    val dir = Files.createTempDirectory("mgnull2").toString
    val mrg = Model("fct_mrg", Seq("orders"), d => d("orders"), IncrementalMerge("order_date"))
    ModelGraph.run(spark, Seq(mrg), withNull, dir) // bootstrap
    ModelGraph.run(spark, Seq(mrg), withNull, dir) // refresh 1
    ModelGraph.run(spark, Seq(mrg), withNull, dir) // refresh 2
    val rows = spark.read.parquet(s"$dir/fct_mrg")
      .select("order_id").as[Long].collect().sorted.toSeq
    assert(rows == Seq(1L, 2L, 9L), s"NULL-watermark row lost or duplicated: $rows")
  }

  test("incremental probe: absence bootstraps, corrupt data rethrows") {
    val dir = Files.createTempDirectory("mgprobe").toString
    // genuine absence → false → bootstrap is the right call
    assert(!ModelGraph.tableExists(spark, s"$dir/missing"))
    // a path that EXISTS but fails to read is NOT absence: silently
    // treating it as missing would Overwrite (destroy) data an append
    // was intended for — the error must propagate to the caller
    new java.io.File(s"$dir/tbl").mkdirs()
    Files.write(java.nio.file.Paths.get(s"$dir/tbl/part-0.parquet"),
      "definitely not parquet".getBytes)
    intercept[Exception](ModelGraph.tableExists(spark, s"$dir/tbl"))
  }

  test("levels group independent models; parallel run matches sequential") {
    import spark.implicits._
    // diamond: stg -> (a, b) -> joined
    val a = Model("a", Seq("stg_orders"),
      d => d("stg_orders").select($"order_id", $"total"), Table)
    val b = Model("b", Seq("stg_orders"),
      d => d("stg_orders").select($"order_id", $"order_date"), Table)
    val j = Model("j", Seq("a", "b"),
      d => d("a").join(d("b"), "order_id"), Table)
    val graph = Seq(staging, a, b, j)

    val lv = ModelGraph.levels(graph, sources.keySet).map(_.map(_.name).toSet)
    assert(lv == Seq(Set("stg_orders"), Set("a", "b"), Set("j")))

    val par = ModelGraph.run(spark, graph, sources,
      Files.createTempDirectory("mgpar").toString, parallelism = 4)
    val seqv = ModelGraph.run(spark, graph, sources,
      Files.createTempDirectory("mgseq").toString, parallelism = 1)
    assert(par("j").collect().map(_.toString).sorted.toSeq ==
      seqv("j").collect().map(_.toString).sorted.toSeq)
  }
}
