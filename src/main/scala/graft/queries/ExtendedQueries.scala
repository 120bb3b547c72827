package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables
import graft.functions.F
import graft.operators.SaltedJoin

/** Round-2 operator pack: the families a full analytics engine needs beyond
  * the reference's own surface — as-of joins, skew-salted joins, CUBE /
  * GROUPING SETS, the window-function frame family, INTERSECT/EXCEPT, SCD-2
  * dimension building, regex/JSON scalar packs, and nested array building.
  * Every query is deterministic (total tiebreak orders, no DECIMAL or
  * engine-local float ordering in outputs) and has an exact DuckDB oracle.
  */
object ExtendedQueries {

  private type Q = (SparkSession, String) => DataFrame

  private def moneySum(c: org.apache.spark.sql.Column) = F.moneySum(c)

  def queries: Map[String, Q] = Map(
    "j_asof_join" -> jAsofJoin,
    "j_salted" -> jSalted,
    "agg_cube" -> aggCube,
    "agg_grouping_sets" -> aggGroupingSets,
    "w2_window_frames" -> w2WindowFrames,
    "u4_intersect_except" -> u4IntersectExcept,
    "scd2_orders" -> scd2Orders,
    "scd2_apply" -> scd2Apply,
    "scd2_apply_batch" -> scd2ApplyBatch,
    "s_regex_pack" -> sRegexPack,
    "s_json_pack" -> sJsonPack,
    "n_nested_pack" -> nNestedPack,
    "sql_api_pipeline" -> sqlApiPipeline,
    "j_range_join" -> jRangeJoin,
    "j_part_revenue" -> jPartRevenue,
    "j_full_outer" -> jFullOuter,
    "w4_rolling_median" -> w4RollingMedian,
    "w5_range_interval" -> w5RangeInterval,
    "a_approx_quantile" -> aApproxQuantile,
    "g_gap_fill" -> gGapFill
  )

  // ------------------------------------------------------------- as-of ----
  /** As-of join: each purchase event matched to the LATEST view event of the
    * same user with view.ts <= purchase.ts (ties by event_id desc).
    *
    * Spark has no ASOF JOIN operator; the scalable form is the union trick:
    * tag both sides, ONE shuffle on the key, sort within partition by
    * (ts, side, event_id), carry the last view forward with
    * last(_, ignoreNulls) over a running frame, keep the purchase rows.
    * No join, no per-row probe — wall time is one sort-shuffle regardless
    * of how many views precede each purchase. Views order before purchases
    * at equal ts so `<=` semantics fall out of the sort key. */
  private val jAsofJoin: Q = (s, dir) => {
    import s.implicits._
    val ev = Tables(s, dir, "events")
      .filter($"event_type".isin("view", "purchase"))
      .select($"user_id", $"ts", $"event_id", $"event_type",
        when($"event_type" === "view", $"event_id").as("vid"))
    val w = Window.partitionBy($"user_id")
      .orderBy($"ts".asc,
        when($"event_type" === "view", 0).otherwise(1).asc,
        $"event_id".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("view_id", last($"vid", ignoreNulls = true).over(w))
      .filter($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("purchase_id"), $"view_id")
      .orderBy($"user_id", $"purchase_id")
  }

  // ------------------------------------------------------ salted join -----
  /** [[SaltedJoin]] correctness under the oracle: revenue per supplier
    * nation through a salted fact-dim join must equal the plain join.
    * (The salt is a physical rewrite — the logical result is unchanged.) */
  private val jSalted: Q = (s, dir) => {
    import s.implicits._
    val li = Tables(s, dir, "lineitem")
      .select($"l_suppkey", F.money($"l_extendedprice").as("price"))
    val sup = Tables(s, dir, "supplier")
      .select($"s_suppkey".as("l_suppkey"), $"s_nationkey")
    SaltedJoin.join(li, sup, Seq("l_suppkey"), salts = 8)
      .groupBy($"s_nationkey")
      .agg(count(lit(1)).as("n_items"), sum($"price").cast("double").as("revenue"))
      .orderBy($"s_nationkey")
  }

  // ------------------------------------------- cube / grouping sets -------
  /** CUBE over (status, priority): all four grouping levels in one Expand +
    * single shuffle. grouping() markers disambiguate NULL-as-total from a
    * NULL group value. */
  private val aggCube: Q = (s, dir) => {
    import s.implicits._
    Tables(s, dir, "orders")
      .cube($"o_orderstatus", $"o_orderpriority")
      .agg(grouping($"o_orderstatus").cast("int").as("g_status"),
        grouping($"o_orderpriority").cast("int").as("g_prio"),
        count(lit(1)).as("n_orders"),
        moneySum($"o_totalprice").as("total"))
      .orderBy($"g_status", $"g_prio",
        $"o_orderstatus".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
  }

  /** Explicit GROUPING SETS ((status), (priority), ()) — the general form
    * rollup/cube compile to; one Expand, one shuffle, no re-scan. */
  private val aggGroupingSets: Q = (s, dir) => {
    import s.implicits._
    Tables(s, dir, "orders")
      .groupingSets(
        Seq(Seq($"o_orderstatus"), Seq($"o_orderpriority"), Seq()),
        $"o_orderstatus", $"o_orderpriority")
      .agg(grouping($"o_orderstatus").cast("int").as("g_status"),
        grouping($"o_orderpriority").cast("int").as("g_prio"),
        count(lit(1)).as("n_orders"),
        moneySum($"o_totalprice").as("total"))
      .orderBy($"g_status", $"g_prio",
        $"o_orderstatus".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
  }

  // -------------------------------------------------- window frames -------
  /** The window-function family over one partition spec: lag/lead,
    * row_number, rank/dense_rank (a spec with ties), ntile, cume_dist, and
    * a running sum with an explicit ROWS frame. Running sums aggregate the
    * exact decimal and cast the WINDOW RESULT to double, so every prefix is
    * order-free and bit-identical across engines. */
  private val w2WindowFrames: Q = (s, dir) => {
    import s.implicits._
    val byCust = Window.partitionBy($"o_custkey").orderBy($"o_orderdate".asc, $"o_orderkey".asc)
    val running = byCust.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val byStatus = Window.partitionBy($"o_orderstatus").orderBy($"o_orderdate".asc)
    Tables(s, dir, "orders").select(
      $"o_orderkey", $"o_custkey",
      lag(F.money($"o_totalprice"), 1).over(byCust).cast("double").as("prev_price"),
      lead(F.money($"o_totalprice"), 1).over(byCust).cast("double").as("next_price"),
      row_number().over(byCust).as("rn"),
      sum(F.money($"o_totalprice")).over(running).cast("double").as("running_total"),
      ntile(4).over(byCust).as("quartile"),
      cume_dist().over(byCust).as("cd"),
      rank().over(byStatus).as("rnk"),
      dense_rank().over(byStatus).as("drnk"))
      .orderBy($"o_orderkey")
  }

  // ------------------------------------------- ordered-set window agg ----
  /** Rolling median — an ordered-set aggregate (percentile) evaluated over
    * a sliding 3-row frame, the shape w2's sum/lag frames don't exercise.
    * Interpolation operands are cast to double BEFORE the aggregate so
    * both engines interpolate the same values; round(4) absorbs the
    * last-ulp difference the two interpolation formulas may carry.
    * One shuffle on the partition key, frame evaluation is per-partition
    * streaming — linear at any scale. */
  private val w4RollingMedian: Q = (s, dir) => {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate", $"o_orderkey").rowsBetween(-2, 0)
    Tables(s, dir, "orders")
      .filter($"o_custkey" % 100 === 7)
      .select($"o_custkey", $"o_orderkey",
        round(expr("percentile(cast(o_totalprice as double), 0.5)").over(w), 4)
          .as("rolling_median"))
      .orderBy($"o_custkey", $"o_orderkey")
  }

  // ------------------------------------------- time-based RANGE frame ----
  /** TIME-based RANGE frame — the window family's remaining axis: w2's
    * frames are ROW-counted, this one is VALUE-ranged (each order's frame
    * is every order of the same customer in the trailing 30 DAYS, however
    * many rows that is). Spark's rangeBetween needs a numeric ordering
    * column, so the frame runs over epoch seconds with a ±2,592,000 bound
    * — semantically identical to the oracle's
    * `RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW` (both
    * ends inclusive). Money rides as integer cents. Same single-shuffle
    * plan as any partitioned window; the frame bound is evaluated by
    * binary search within the sorted partition, not a per-row rescan. */
  private val w5RangeInterval: Q = (s, dir) => {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy(unix_timestamp($"o_orderdate"))
      .rangeBetween(-30L * 86400, 0)
    Tables(s, dir, "orders")
      .filter($"o_custkey" % 100 === 7)
      .withColumn("cents", expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
      .select($"o_custkey", $"o_orderkey", $"o_orderdate".cast("date").as("d"),
        sum($"cents").over(w).as("cents_30d"),
        count(lit(1)).over(w).as("n_30d"))
      .orderBy($"o_custkey", $"o_orderkey")
  }

  // ------------------------------------------- approx-quantile contract ----
  /** Approximate percentile CONTRACT rung — percentile_approx's
    * Greenwald–Khanna-style summary is MERGEABLE with bounded state
    * (O(accuracy) per group on the wire — the 100 TB path where a_median's
    * buffering aggregate ships every value), but its merge is
    * partition-order sensitive, so the estimate itself can't hash-match
    * another engine. Same resolution as a_approx_distinct: grade the
    * GUARANTEE with exact integers — the estimate's true rank, recomputed
    * exactly in a second pass, must sit within n/1000 of the ideal median
    * rank (the summary's ε bound at accuracy 1000, checked
    * cross-multiplied so no floats ride the compare). The oracle asserts
    * the booleans TRUE and replays the exact counts. */
  private val aApproxQuantile: Q = (s, dir) => {
    import s.implicits._
    val li = Tables(s, dir, "lineitem").select($"l_returnflag",
      expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("pc"))
    val est = li.groupBy($"l_returnflag")
      .agg(expr("percentile_approx(pc, 0.5, 1000)").as("est"))
    li.join(broadcast(est), Seq("l_returnflag"))
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(when($"pc" <= $"est", 1L).otherwise(0L)).as("rank_at_est"))
      // |rank − n/2| ≤ n/1000 + 1 — the summary's ε plus ONE rank of
      // slack because count(pc <= est) lands on the upper edge of est's
      // duplicate/rounding interval. Cross-multiplied to integers:
      // |2·rank − n| · 500 ≤ n + 1000. Measured error at sf0.001–0.1 is
      // 0.00015–0.00102, i.e. the bound is tight, not decorative.
      .select($"l_returnflag", $"n",
        (abs($"rank_at_est" * 2 - $"n") * 500 <= $"n" + 1000).as("within_eps"))
      .orderBy($"l_returnflag")
  }

  // ------------------------------------------------- gap-filled series ----
  /** Gap-filled daily time series — the data-driven spine: the calendar is
    * derived FROM the data (min..max event day, one scalar aggregate
    * broadcast into a generated sequence), exploded into one row per day,
    * then left-joined to the per-day aggregate with zero-fill. Every
    * day in the span appears exactly once, event-less days as zeros — the
    * shape every dashboard/training-curve consumer expects. The spine side
    * is always tiny (days, not rows), so the join broadcasts it; the data
    * side pays one date-grain shuffle regardless of corpus size. */
  private val gGapFill: Q = (s, dir) => {
    import s.implicits._
    val ev = Tables(s, dir, "events")
      .select($"ts".cast("date").as("d"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
    val daily = ev.groupBy($"d")
      .agg(count(lit(1)).as("n_events"), sum($"cents").as("total_cents"))
    val spine = ev.agg(min($"d").as("lo"), max($"d").as("hi"))
      .select(explode(expr("sequence(lo, hi, interval 1 day)")).as("d"))
    spine.join(broadcast(daily), Seq("d"), "left")
      .select($"d", coalesce($"n_events", lit(0L)).as("n_events"),
        coalesce($"total_cents", lit(0L)).as("total_cents"))
      .orderBy($"d")
  }

  // ------------------------------------------------ intersect / except ----
  /** INTERSECT + EXCEPT (both DISTINCT forms): customers having 'F' orders
    * vs customers having 'O' orders. */
  private val u4IntersectExcept: Q = (s, dir) => {
    import s.implicits._
    val ord = Tables(s, dir, "orders")
    val f = ord.filter($"o_orderstatus" === "F").select($"o_custkey")
    val o = ord.filter($"o_orderstatus" === "O").select($"o_custkey")
    f.intersect(o).select(lit("intersect").as("op"), $"o_custkey")
      .unionByName(f.except(o).select(lit("except").as("op"), $"o_custkey"))
      .orderBy($"op", $"o_custkey")
  }

  // --------------------------------------------------------- SCD type 2 ---
  /** SCD-2 dimension build: each order is a "version" of its customer's
    * state; valid_from/valid_to from lead() over the version order,
    * open-ended current row. One window over one shuffle — the standard
    * snapshot→interval transform at any scale. */
  private val scd2Orders: Q = (s, dir) => {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate".asc, $"o_orderkey".asc)
    Tables(s, dir, "orders")
      .select($"o_custkey", $"o_orderkey", $"o_orderstatus",
        F.money($"o_totalprice").cast("double").as("price"),
        $"o_orderdate".cast("date").as("valid_from"),
        lead($"o_orderdate", 1).over(w).cast("date").as("valid_to"))
      .withColumn("is_current", $"valid_to".isNull)
      .orderBy($"o_custkey", $"valid_from", $"o_orderkey")
  }

  /** Incremental SCD2 APPLY — day-2 of [[scd2Orders]]: a standing history
    * (built from orders BEFORE a corpus-derived cutoff) absorbs the new
    * slice by CLOSING each touched customer's current row at their first
    * new order date and chaining the new versions behind it; untouched
    * customers pass through. The oracle is the ONE-SHOT rebuild over all
    * orders — the hash match proves apply ≡ rebuild exactly (the same
    * equivalence discipline as train_curriculum_order and
    * EcomIncrementalSpec), which is the contract that lets the 100 TB
    * history table be maintained by touching only O(new-keys) rows: the
    * close-update is a broadcast-joined per-key min, never a rewrite of
    * the standing table. */
  private val scd2Apply: Q = (s, dir) => {
    import s.implicits._
    val o = Tables(s, dir, "orders")
      .select($"o_custkey", $"o_orderkey", $"o_orderstatus",
        F.money($"o_totalprice").cast("double").as("price"),
        $"o_orderdate".cast("date").as("valid_from"))
    val cut = o.agg(date_sub(max($"valid_from"), 180).as("cut"))
    val w = Window.partitionBy($"o_custkey").orderBy($"valid_from".asc, $"o_orderkey".asc)
    val standing = o.join(broadcast(cut), $"valid_from" < $"cut").drop("cut")
      .withColumn("valid_to", lead($"valid_from", 1).over(w))
    val incoming = o.join(broadcast(cut), $"valid_from" >= $"cut").drop("cut")
      .withColumn("valid_to", lead($"valid_from", 1).over(w))
    val firstNew = incoming.groupBy($"o_custkey")
      .agg(min($"valid_from").as("first_new"))
    val closed = standing.join(firstNew, Seq("o_custkey"), "left")
      .withColumn("valid_to",
        when($"valid_to".isNull && $"first_new".isNotNull, $"first_new")
          .otherwise($"valid_to"))
      .drop("first_new")
    closed.unionByName(incoming)
      .withColumn("is_current", $"valid_to".isNull)
      .orderBy($"o_custkey", $"valid_from", $"o_orderkey")
  }

  /** The projected order-version slice used by both scd2 steps. */
  private def scd2Versions(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "orders")
      .select($"o_custkey", $"o_orderkey", $"o_orderstatus",
        F.money($"o_totalprice").cast("double").as("price"),
        $"o_orderdate".cast("date").as("valid_from"))
  }

  /** Batch-1 of the appended-batch twin (VERDICT r15 #4): the STANDING
    * SCD2 history (pre-cutoff versions chained, current rows open),
    * PERSISTED as the state table a warehouse would actually hold
    * between days ([[BatchState]]). */
  private[graft] def scd2BatchBuild(s: SparkSession, dir: String): Unit = {
    import s.implicits._
    val o = scd2Versions(s, dir)
    val cut = o.agg(date_sub(max($"valid_from"), 180).as("cut"))
    val w = Window.partitionBy($"o_custkey").orderBy($"valid_from".asc, $"o_orderkey".asc)
    BatchState.persist(s, "scd2_standing",
      o.join(broadcast(cut), $"valid_from" < $"cut").drop("cut")
        .withColumn("valid_to", lead($"valid_from", 1).over(w)))
  }

  /** Batch-2: the day-2 slice applied to the LANDED standing history —
    * close each touched customer's current row at their first new order
    * date, chain the new versions behind it. Output (and oracle) is
    * identical to [[scd2Apply]]: apply-from-persisted-state ≡ one-shot
    * rebuild, the equivalence that lets a 100 TB history table be
    * maintained by touching only O(new-keys) rows. */
  private[graft] def scd2BatchProbe(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = scd2Versions(s, dir)
    val cut = o.agg(date_sub(max($"valid_from"), 180).as("cut"))
    val w = Window.partitionBy($"o_custkey").orderBy($"valid_from".asc, $"o_orderkey".asc)
    val standing = s.read.parquet(s"${BatchState.root}/scd2_standing")
    val incoming = o.join(broadcast(cut), $"valid_from" >= $"cut").drop("cut")
      .withColumn("valid_to", lead($"valid_from", 1).over(w))
    val firstNew = incoming.groupBy($"o_custkey")
      .agg(min($"valid_from").as("first_new"))
    val closed = standing.join(firstNew, Seq("o_custkey"), "left")
      .withColumn("valid_to",
        when($"valid_to".isNull && $"first_new".isNotNull, $"first_new")
          .otherwise($"valid_to"))
      .drop("first_new")
    closed.unionByName(incoming)
      .withColumn("is_current", $"valid_to".isNull)
      .orderBy($"o_custkey", $"valid_from", $"o_orderkey")
  }

  private val scd2ApplyBatch: Q = (s, dir) => {
    scd2BatchBuild(s, dir)
    scd2BatchProbe(s, dir)
  }

  // ------------------------------------------------------- regex pack -----
  /** Regex scalar family — extract, replace-all, match flag. Patterns are
    * dialect-portable (no lookaround, no named classes). */
  private val sRegexPack: Q = (s, dir) => {
    import s.implicits._
    Tables(s, dir, "documents").select(
      $"doc_id",
      regexp_extract($"text", "^[A-Za-z]+", 0).as("first_word"),
      length(regexp_replace($"text", "[^0-9]", "")).as("n_digits"),
      substring(regexp_replace($"text", " +", " "), 1, 40).as("squeezed_prefix"),
      $"text".rlike("[0-9]").as("has_number"))
      .orderBy($"doc_id")
  }

  // -------------------------------------------------------- JSON pack -----
  /** JSON parsing both ways Spark offers it: path extraction
    * (get_json_object) and schema-ful from_json — the S1 envelope-parsing
    * pattern (ref: ingest_latest_synthetic_data.py:131-146) on the events
    * `props` column. */
  private val sJsonPack: Q = (s, dir) => {
    import s.implicits._
    Tables(s, dir, "events").select(
      $"event_id",
      get_json_object($"props", "$.k").cast("int").as("k"),
      from_json($"props", org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.IntegerType)))).getField("k").as("k2"),
      // % (not pmod): DuckDB's % takes the dividend's sign — keep the
      // engines identical if a negative k ever appears in the data.
      (get_json_object($"props", "$.k").cast("int") % 7).as("k_mod"))
      .orderBy($"event_id")
  }

  // ------------------------------------------------------ nested pack -----
  /** Nested-array building (§1.2): per order, the sorted line-number list
    * (collect_list → array_sort → array_join) plus flat aggregates. The
    * list is order-canonicalized so the result is deterministic under any
    * partitioning. */
  private val nNestedPack: Q = (s, dir) => {
    import s.implicits._
    Tables(s, dir, "lineitem")
      .groupBy($"l_orderkey")
      .agg(count(lit(1)).as("n_items"),
        array_join(
          transform(array_sort(collect_list($"l_linenumber")), _.cast("string")),
          ",").as("lines_csv"),
        moneySum($"l_quantity").as("total_qty"))
      .orderBy($"l_orderkey")
  }

  // -------------------------------------------------------- range join ----
  /** Interval/range join at scale: views within the hour before each
    * purchase, per user. A raw non-equi join degenerates to
    * nested-loop-per-key; the scalable form buckets time at the interval
    * width so the range condition becomes an equi-join on (key, bucket)
    * with bounded fan-out — each probe row lands in exactly 2 buckets, each
    * build row in 1, and the exact range predicate filters inside the join.
    * One shuffle, no quadratic blowup, any interval width. */
  private val jRangeJoin: Q = (s, dir) => {
    import s.implicits._
    val ev = Tables(s, dir, "events")
    val bucket = (t: org.apache.spark.sql.Column) =>
      floor(unix_timestamp(t) / 3600L)
    val views = ev.filter($"event_type" === "view")
      .select($"user_id", $"ts".as("vts"), bucket($"ts").as("bucket"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("purchase_id"), $"ts".as("pts"))
      .withColumn("bucket", explode(array(bucket($"pts") - 1, bucket($"pts"))))
    purchases.join(views,
        purchases("user_id") === views("user_id") &&
          purchases("bucket") === views("bucket") &&
          views("vts") > purchases("pts") - expr("INTERVAL 1 HOUR") &&
          views("vts") <= purchases("pts"),
        "left")
      .groupBy(purchases("user_id").as("user_id"), $"purchase_id")
      .agg(count($"vts").as("n_prior_views"))
      .orderBy($"user_id", $"purchase_id")
  }

  // -------------------------------------------------------- full outer ----
  /** FULL OUTER join — daily order activity vs daily event activity with
    * both unmatched sides surviving (the date ranges are disjoint in this
    * data, so the result exercises null-fill on both sides). */
  private val jFullOuter: Q = (s, dir) => {
    import s.implicits._
    val o = Tables(s, dir, "orders")
      .groupBy($"o_orderdate".cast("date").as("d"))
      .agg(count(lit(1)).as("n_orders"))
    val e = Tables(s, dir, "events")
      .groupBy($"ts".cast("date").as("d"))
      .agg(count(lit(1)).as("n_events"))
    o.join(e, Seq("d"), "full")
      .orderBy($"d")
  }

  // ------------------------------------------------------ part revenue ----
  /** The part dimension through a fact join: revenue by part type. part is
    * well under the broadcast threshold at test SFs (and on a cluster AQE
    * demotes to shuffle join when it outgrows it). */
  private val jPartRevenue: Q = (s, dir) => {
    import s.implicits._
    val li = Tables(s, dir, "lineitem")
    val part = Tables(s, dir, "part")
    li.join(part, li("l_partkey") === part("p_partkey"))
      .groupBy($"p_type")
      .agg(count(lit(1)).as("n_items"),
        countDistinct($"p_partkey").as("n_parts"),
        sum(F.money($"l_extendedprice") * (lit(1).cast("decimal(18,2)") - F.money($"l_discount")))
          .cast("double").as("revenue"))
      .orderBy($"p_type")
  }

  // ---------------------------------------------------------- SQL API ----
  /** The whole query through `spark.sql(...)` with graft's injected SQL
    * functions ([[graft.GraftExtensions]]) — the reference's interactive
    * probe/dbt surface (SURVEY §3, sample_ecom_raw_query_duckdb.py:8-43).
    * Catalyst sees the identical tree the DataFrame API would build. */
  private val sqlApiPipeline: Q = (s, dir) => {
    // Per-invocation view name, dropped before returning: a fixed name would
    // make concurrent invocations on one session overwrite each other, and
    // the view would leak into the session catalog (visible to catalog
    // queries like s9_catalog_counts). Dropping immediately is safe —
    // spark.sql analyzes eagerly, so the returned plan holds the resolved
    // relation, not the view name.
    val view = s"graft_sql_api_orders_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    Tables(s, dir, "orders").createOrReplaceTempView(view)
    try s.sql(s"""
      SELECT o_orderkey,
             graft_surrogate_key(o_orderkey, o_orderstatus, o_orderpriority) AS order_sk,
             graft_hash60(o_orderpriority) AS prio_h,
             graft_token_count(o_orderpriority) AS prio_tokens
      FROM $view
      ORDER BY o_orderkey""")
    finally s.catalog.dropTempView(view)
  }

  // ---------------------------------------------------------------------
  // DuckDB oracles
  // ---------------------------------------------------------------------
  def oracle: Map[String, String] = Map(
    "j_asof_join" ->
      """SELECT p.user_id, p.event_id AS purchase_id,
        | (SELECT v.event_id FROM events v
        |   WHERE v.event_type = 'view' AND v.user_id = p.user_id AND v.ts <= p.ts
        |   ORDER BY v.ts DESC, v.event_id DESC LIMIT 1) AS view_id
        |FROM events p WHERE p.event_type = 'purchase'
        |ORDER BY user_id, purchase_id""".stripMargin,

    "j_salted" ->
      """SELECT s_nationkey, COUNT(*) AS n_items,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,

    "agg_cube" ->
      """SELECT o_orderstatus, o_orderpriority,
        | CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
        | CAST(GROUPING(o_orderpriority) AS INT) AS g_prio,
        | COUNT(*) AS n_orders,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY g_status, g_prio,
        | o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "agg_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
        | CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
        | CAST(GROUPING(o_orderpriority) AS INT) AS g_prio,
        | COUNT(*) AS n_orders,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY g_status, g_prio,
        | o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "w2_window_frames" ->
      """SELECT o_orderkey, o_custkey,
        | CAST(lag(CAST(o_totalprice AS DECIMAL(18,2)), 1) OVER wc AS DOUBLE) AS prev_price,
        | CAST(lead(CAST(o_totalprice AS DECIMAL(18,2)), 1) OVER wc AS DOUBLE) AS next_price,
        | CAST(row_number() OVER wc AS BIGINT) AS rn,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |   OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |         ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_total,
        | CAST(ntile(4) OVER wc AS BIGINT) AS quartile,
        | cume_dist() OVER wc AS cd,
        | CAST(rank() OVER ws AS BIGINT) AS rnk,
        | CAST(dense_rank() OVER ws AS BIGINT) AS drnk
        |FROM orders
        |WINDOW wc AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        |       ws AS (PARTITION BY o_orderstatus ORDER BY o_orderdate)
        |ORDER BY o_orderkey""".stripMargin,

    "u4_intersect_except" ->
      """SELECT 'intersect' AS op, o_custkey FROM (
        | SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        | INTERSECT
        | SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
        |UNION ALL
        |SELECT 'except' AS op, o_custkey FROM (
        | SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        | EXCEPT
        | SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
        |ORDER BY op, o_custkey""".stripMargin,

    "scd2_orders" ->
      """SELECT o_custkey, o_orderkey, o_orderstatus,
        | CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price,
        | CAST(o_orderdate AS DATE) AS valid_from,
        | CAST(lead(o_orderdate, 1) OVER w AS DATE) AS valid_to,
        | (lead(o_orderdate, 1) OVER w IS NULL) AS is_current
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, valid_from, o_orderkey""".stripMargin,

    // the one-shot rebuild: hash-equality against the Spark-side
    // incremental apply PROVES apply ≡ rebuild
    // appended-batch twin: the oracle stays the ONE-SHOT rebuild — the
    // hash match proves apply-over-PERSISTED-standing ≡ rebuild exactly
    "scd2_apply_batch" ->
      """SELECT o_custkey, o_orderkey, o_orderstatus,
        | CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price,
        | CAST(o_orderdate AS DATE) AS valid_from,
        | CAST(lead(o_orderdate, 1) OVER w AS DATE) AS valid_to,
        | (lead(o_orderdate, 1) OVER w IS NULL) AS is_current
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, valid_from, o_orderkey""".stripMargin,

    "scd2_apply" ->
      """SELECT o_custkey, o_orderkey, o_orderstatus,
        | CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price,
        | CAST(o_orderdate AS DATE) AS valid_from,
        | CAST(lead(o_orderdate, 1) OVER w AS DATE) AS valid_to,
        | (lead(o_orderdate, 1) OVER w IS NULL) AS is_current
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, valid_from, o_orderkey""".stripMargin,

    "s_regex_pack" ->
      """SELECT doc_id,
        | regexp_extract(text, '^[A-Za-z]+') AS first_word,
        | CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS INT) AS n_digits,
        | substr(regexp_replace(text, ' +', ' ', 'g'), 1, 40) AS squeezed_prefix,
        | regexp_matches(text, '[0-9]') AS has_number
        |FROM documents ORDER BY doc_id""".stripMargin,

    "s_json_pack" ->
      """SELECT event_id,
        | CAST(json_extract_string(props, '$.k') AS INT) AS k,
        | CAST(json_extract_string(props, '$.k') AS INT) AS k2,
        | CAST(json_extract_string(props, '$.k') AS INT) % 7 AS k_mod
        |FROM events ORDER BY event_id""".stripMargin,

    "n_nested_pack" ->
      """SELECT l_orderkey, COUNT(*) AS n_items,
        | string_agg(CAST(l_linenumber AS VARCHAR), ',' ORDER BY l_linenumber) AS lines_csv,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,

    "sql_api_pipeline" ->
      """SELECT o_orderkey,
        | md5(concat_ws('-',
        |   COALESCE(CAST(o_orderkey AS VARCHAR), '_dbt_utils_surrogate_key_null_'),
        |   COALESCE(CAST(o_orderstatus AS VARCHAR), '_dbt_utils_surrogate_key_null_'),
        |   COALESCE(CAST(o_orderpriority AS VARCHAR), '_dbt_utils_surrogate_key_null_'))) AS order_sk,
        | CAST(CONCAT('0x', SUBSTR(md5(o_orderpriority), 1, 15)) AS BIGINT) AS prio_h,
        | CAST(len(string_split_regex(trim(o_orderpriority), '\s+')) AS INT) AS prio_tokens
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "j_range_join" ->
      """SELECT p.user_id, p.event_id AS purchase_id,
        | (SELECT COUNT(*) FROM events v
        |   WHERE v.event_type = 'view' AND v.user_id = p.user_id
        |     AND v.ts > p.ts - INTERVAL 1 HOUR AND v.ts <= p.ts) AS n_prior_views
        |FROM events p WHERE p.event_type = 'purchase'
        |ORDER BY user_id, purchase_id""".stripMargin,

    "j_full_outer" ->
      """SELECT d, n_orders, n_events
        |FROM (SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS n_orders
        |      FROM orders GROUP BY 1) o
        |FULL JOIN (SELECT CAST(ts AS DATE) AS d, COUNT(*) AS n_events
        |           FROM events GROUP BY 1) e USING (d)
        |ORDER BY d""".stripMargin,

    "j_part_revenue" ->
      """SELECT p_type, COUNT(*) AS n_items,
        | COUNT(DISTINCT p_partkey) AS n_parts,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_type ORDER BY p_type""".stripMargin,

    "w4_rolling_median" ->
      """SELECT o_custkey, o_orderkey,
        | round(quantile_cont(CAST(o_totalprice AS DOUBLE), 0.5) OVER (
        |   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS rolling_median
        |FROM orders WHERE o_custkey % 100 = 7
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    // RANGE frame over the interval — DuckDB's native interval RANGE is
    // the same inclusive [cur - 30 days, cur] the epoch-seconds bound spans
    "w5_range_interval" ->
      """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS d,
        | CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) OVER w AS BIGINT) AS cents_30d,
        | CAST(COUNT(*) OVER w AS BIGINT) AS n_30d
        |FROM orders WHERE o_custkey % 100 = 7
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
        |  RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    // the sketch estimate isn't cross-engine replayable; the oracle
    // replays the exact counts and asserts the epsilon contract TRUE
    "a_approx_quantile" ->
      """SELECT l_returnflag, COUNT(*) AS n, TRUE AS within_eps
        |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin,

    "g_gap_fill" ->
      """WITH ev AS (SELECT CAST(ts AS DATE) d,
        |  CAST(floor(value * 100 + 0.5) AS BIGINT) cents FROM events),
        |daily AS (SELECT d, COUNT(*) n_events, SUM(cents) total_cents
        | FROM ev GROUP BY d),
        |bounds AS (SELECT MIN(d) lo, MAX(d) hi FROM ev),
        |spine AS (SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) d
        | FROM bounds)
        |SELECT s.d, CAST(COALESCE(n_events, 0) AS BIGINT) n_events,
        | CAST(COALESCE(total_cents, 0) AS BIGINT) total_cents
        |FROM spine s LEFT JOIN daily USING (d)
        |ORDER BY s.d""".stripMargin
  )
}
