package graft

import org.apache.spark.sql.functions._

/** Semantic invariants of the round-3 pack — value-level equivalences the
  * rows-only structural gate can't see. */
class PipelineQueriesSpec extends SparkSpec {

  test("a_median_hist: the histogram path equals the buffering median() exactly") {
    import graft.queries.PipelineQueries
    val hist = PipelineQueries.queries("a_median_hist")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(3)).toMap
    PipelineQueries.queries("a_median")(spark, sfDir).collect().foreach { r =>
      val flag = r.getString(0)
      assert(hist((flag, "qty")) / 2.0 == r.getDouble(2),
        s"qty median diverged for $flag")
      // med_price is dollars; the histogram carries exact cents
      assert(hist((flag, "price_cents")) / 2.0 == math.round(r.getDouble(3) * 100 * 2) / 2.0,
        s"price median diverged for $flag")
    }
  }
  import graft.queries.PipelineQueries

  test("inc_cdc_apply: deletes vanish, reinserts survive, actions partition correctly") {
    val rows = PipelineQueries.queries("inc_cdc_apply")(spark, sfDir).collect()
    val byKey = rows.map(r => r.getLong(0) -> r).toMap
    assert(byKey.keySet.size === rows.length, "one row per surviving key")
    val orderKeys = Tables(spark, sfDir, "orders")
      .select(col("o_orderkey")).collect().map(_.getLong(0))
    orderKeys.foreach { k =>
      val inSnap = k % 4 != 0
      val inChg = k % 3 == 0
      val finalDelete = inChg && k % 5 == 0 && k % 6 != 0
      if (finalDelete)
        assert(!byKey.contains(k), s"key $k had a terminal delete but survived")
      else if (inChg) {
        assert(byKey.contains(k), s"key $k upserted but missing")
        val r = byKey(k)
        val expStatus = if (k % 6 == 0) "chg2" else "chg"
        assert(r.getString(1) === expStatus, s"key $k wrong status ${r.getString(1)}")
        assert(r.getString(3) === (if (inSnap) "updated" else "inserted"))
      } else if (inSnap) {
        assert(byKey(k).getString(3) === "kept")
      } else assert(!byKey.contains(k), s"key $k in neither snapshot nor changelog")
    }
  }

  test("layout_range_bounds: bounds are balanced, increasing, and rerun-stable") {
    val a = PipelineQueries.queries("layout_range_bounds")(spark, sfDir).collect()
    val b = PipelineQueries.queries("layout_range_bounds")(spark, sfDir).collect()
    assert(a.sameElements(b), "range bounds changed between runs — not deterministic")
    assert(a.length === 7)
    val n = a.head.getLong(1)
    var prevBound = Long.MinValue
    a.foreach { r =>
      val (j, bound, cum) = (r.getInt(0), r.getLong(2), r.getLong(3))
      assert(bound > prevBound, s"split $j bound $bound not increasing")
      prevBound = bound
      assert(cum * 8 >= j * n, s"split $j covers less than $j/8 of rows")
      // minimality: the previous grid cell must be strictly under target —
      // cum at the bound minus the bound's own cell count < j*n/8; proxy:
      // the bound is the SMALLEST v meeting the target, so cum can't
      // overshoot by more than the largest single cell (~2% of rows here)
      assert((cum.toDouble / n) - (j / 8.0) < 0.05,
        s"split $j overshoots target by ${(cum.toDouble / n) - (j / 8.0)}")
    }
  }

  test("dedup_bloom_prefilter is EXACT: identical to the plain anti-join") {
    val viaBloom = PipelineQueries.queries("dedup_bloom_prefilter")(spark, sfDir)
    val li = Tables(spark, sfDir, "lineitem")
    val keys = Tables(spark, sfDir, "part")
      .filter(col("p_size") > 25).select(col("p_partkey"))
    val plain = li.join(keys, li("l_partkey") === keys("p_partkey"), "left_anti")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
    assert(viaBloom.count() === plain.count())
    assert(viaBloom.exceptAll(plain).isEmpty && plain.exceptAll(viaBloom).isEmpty)
  }

  test("sample_hash_split is deterministic and total") {
    val a = PipelineQueries.queries("sample_hash_split")(spark, sfDir).collect()
    val b = PipelineQueries.queries("sample_hash_split")(spark, sfDir).collect()
    assert(a.sameElements(b), "split assignment changed between runs")
    val splits = a.map(_.getString(2)).toSet
    assert(splits.subsetOf(Set("train", "validation", "test")))
    // Buckets 0-7 train; an md5-derived bucket should put the bulk in train.
    val train = a.count(_.getString(2) == "train").toDouble / a.length
    assert(train > 0.6 && train < 0.95, s"train fraction $train implausible for 8/10 buckets")
  }

  test("g_date_spine covers the range with correct calendar attributes") {
    val rows = PipelineQueries.queries("g_date_spine")(spark, sfDir).collect()
    assert(rows.length === 90) // Jan 1 .. Mar 31 2023
    val first = rows.head
    assert(first.getDate(0).toString === "2023-01-01")
    assert(first.getInt(3) === 0, "2023-01-01 was a Sunday -> dow 0 (DuckDB alignment)")
    assert(rows.count(_.getBoolean(5)) === 3, "exactly 3 month-ends in Jan-Mar")
  }

  test("subqueries decorrelate to joins (no per-row re-execution)") {
    // The physical plan must not contain an uncorrelated-loop subquery node;
    // EXISTS/IN compile to semi joins, the scalar subquery to an aggregate
    // plus outer join.
    // ADVICE r3: assert the intended property DIRECTLY — the old disjunction
    // was satisfied whenever 'InSubquery' was merely absent, i.e. always.
    for (name <- Seq("sub_exists", "sub_in")) {
      val plan = PipelineQueries.queries(name)(spark, sfDir)
        .queryExecution.executedPlan.toString
      assert(plan.contains("LeftSemi"),
        s"$name must decorrelate to a left-semi join:\n$plan")
      assert(!plan.contains("InSubqueryExec"),
        s"$name kept a per-row subquery node:\n$plan")
    }
    val scalar = PipelineQueries.queries("sub_scalar")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!scalar.contains("InSubqueryExec"),
      s"sub_scalar kept a per-row subquery node:\n$scalar")
    assert(scalar.contains("Join") && scalar.contains("HashAggregate"),
      s"sub_scalar must plan as aggregate + join, not per-row re-execution:\n$scalar")
  }

  test("a_regr_fit matches a driver-side least-squares recomputation") {
    val fit = PipelineQueries.queries("a_regr_fit")(spark, sfDir)
      .filter(col("l_returnflag") === "N").collect().head
    val rows = Tables(spark, sfDir, "lineitem")
      .filter(col("l_returnflag") === "N")
      .select(col("l_quantity"), col("l_extendedprice")).collect()
      .map(r => (r.getDouble(0), r.getDouble(1)))
    val n = rows.length.toDouble
    val (sx, sy) = (rows.map(_._1).sum, rows.map(_._2).sum)
    val sxx = rows.map(p => p._1 * p._1).sum
    val sxy = rows.map(p => p._1 * p._2).sum
    val expSlope = (sxy - sx * sy / n) / (sxx - sx * sx / n)
    val expIntercept = sy / n - expSlope * (sx / n)
    assert(math.abs(fit.getDouble(2) - expSlope) < math.abs(expSlope) * 1e-9)
    assert(math.abs(fit.getDouble(3) - expIntercept) < math.abs(expIntercept) * 1e-9)
    val r2 = fit.getDouble(4)
    assert(r2 >= 0 && r2 <= 1, s"r2 $r2 out of range")
  }
}
