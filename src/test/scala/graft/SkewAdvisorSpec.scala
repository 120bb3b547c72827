package graft

import org.apache.spark.sql.functions._
import graft.operators.SaltedJoin

/** VERDICT r12 #5 — the advisory loop, wired end to end: the skew
  * PROFILE (qa_key_skew's hot-bucket inequality / keyHistogram), the
  * capacity TRIGGER ([[SaltedJoin.capacityThreshold]] — the gate
  * `graph_pagerank_salted` salts behind), and the MEASURED crossover
  * ladder (bench/BENCH_hubbucket_r12_01.json, the bucketed-edge layout
  * where AQE cannot split the straggler) must all tell one coherent
  * story: profile says salt ⟺ trigger fires, and the trigger's decision
  * agrees with where the recorded ladder says salting pays.
  */
class SkewAdvisorSpec extends SparkSpec {

  private case class Rung(name: String, edges: Long, maxDeg: Long,
      shareX: Double, plainSec: Double, saltedSec: Double)

  /** The r12 ladder, parsed from the committed bench record — the spec
    * grades the trigger against the measurement, not a restatement.
    * Read as explicit UTF-8 (the record holds em-dashes; the platform
    * default charset is US-ASCII in a locale-less shell — VERDICT r13
    * #1), resolved against the repo root rather than sbt's cwd, and
    * parsed with json4s so only semantic drift fails the suite. */
  private lazy val ladder: Seq[Rung] = {
    val rel = java.nio.file.Paths.get("bench", "BENCH_hubbucket_r12_01.json")
    val path = Iterator.iterate(java.nio.file.Paths.get("").toAbsolutePath)(_.getParent)
      .takeWhile(_ != null).map(_.resolve(rel))
      .find(java.nio.file.Files.exists(_))
      .getOrElse(fail(s"$rel not found walking up from ${java.nio.file.Paths.get("").toAbsolutePath}"))
    val txt = new String(java.nio.file.Files.readAllBytes(path),
      java.nio.charset.StandardCharsets.UTF_8)
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    JsonMethods.parse(txt) match {
      case JObject(fields) => fields.collect {
        case (name, JObject(v)) if name.startsWith("hub") =>
          val m = v.toMap
          def num(k: String): Double = m(k) match {
            case JInt(i) => i.toDouble
            case JLong(l) => l.toDouble
            case JDouble(d) => d
            case JDecimal(d) => d.toDouble
            case other => fail(s"$name.$k: unexpected $other")
          }
          Rung(name, num("edges").toLong, num("max_deg").toLong,
            num("reducer_share_x"), num("plain_bucketed_sec"),
            num("salted_bucketed_sec"))
      }
      case other => fail(s"ladder record is not a JSON object: $other")
    }
  }

  /** The bench ran 32 shuffle partitions / 32 buckets. */
  private val BenchParts = 32L

  test("ladder record parses and spans parity to deep-skew rungs") {
    assert(ladder.size == 4, s"expected 4 rungs, parsed ${ladder.map(_.name)}")
    // recorded reducer_share_x is max_deg / (edges/P) — recompute to pin
    // that the ladder's share axis and the trigger use the same geometry
    ladder.foreach { r =>
      val share = r.maxDeg.toDouble / (r.edges.toDouble / BenchParts)
      assert(math.abs(share - r.shareX) < 0.02,
        s"${r.name}: recomputed share $share != recorded ${r.shareX}")
    }
  }

  test("trigger decision agrees with the measured crossover ladder") {
    val fired = ladder.map { r =>
      r.name -> (r.maxDeg > SaltedJoin.capacityThreshold(r.edges, BenchParts))
    }.toMap
    // the trigger inequality maxDeg > 2·edges/P is share > 2 in ladder
    // coordinates — every rung the bench built sits past it
    ladder.foreach(r => assert(fired(r.name) == (r.shareX > 2.0),
      s"${r.name}: trigger ${fired(r.name)} but share ${r.shareX}"))
    // CONSERVATIVE-CORRECT, graded against the measurement:
    // (a) no missed win — every rung where salting beat plain is a rung
    //     the trigger fired on
    ladder.filter(r => r.saltedSec < r.plainSec)
      .foreach(r => assert(fired(r.name), s"${r.name}: salting won but trigger silent"))
    // (b) bounded overpay near parity — where the trigger fired but plain
    //     still won, the cost is at most the twin-join constant (≤1.5×;
    //     measured 1.37× at the 3.6× rung)
    ladder.filter(r => fired(r.name) && r.saltedSec >= r.plainSec)
      .foreach(r => assert(r.saltedSec / r.plainSec < 1.5,
        s"${r.name}: fired-but-losing rung overpays ${r.saltedSec / r.plainSec}×"))
    // (c) the payoff is monotone in hub share — the deeper the skew, the
    //     bigger the salted win, so past-crossover firing is always right
    val ratios = ladder.sortBy(_.shareX).map(r => r.plainSec / r.saltedSec)
    assert(ratios == ratios.sorted,
      s"plain/salted payoff not monotone in share: $ratios")
    // and the deepest rung's win is the ladder's headline 2.2×
    assert(ratios.last > 2.0, s"deepest-rung win ${ratios.last} ≤ 2×")
  }

  test("profile → trigger → mechanism agree on a constructed hub graph") {
    import spark.implicits._
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toLong // 4 in tests
    // hub graph: node 0 carries 600 of 1000 edges (share 2.4× at P=4);
    // flat graph: 100 nodes × 10 edges each (share 0.04×)
    val hub = ((0 until 600).map(i => (0L, 1000L + i)) ++
      (0 until 400).map(i => (1L + i % 40, 2000L + i))).toDF("a", "b")
    val flat = (0 until 1000).map(i => ((i % 100).toLong, 3000L + i)).toDF("a", "b")

    // PROFILE, qa_key_skew's exact hot-bucket inequality (bucket·P > 2·total)
    def hotBuckets(df: org.apache.spark.sql.DataFrame): Long =
      df.groupBy(pmod(xxhash64(col("a")), lit(parts)).as("bucket"))
        .agg(count(lit(1)).as("n"))
        .withColumn("total", sum($"n").over())
        .filter($"n" * parts > $"total" * 2).count()

    // TRIGGER (the gate the salted mechanism is behind)
    val (thrHub, maxHub, fireHub) = SaltedJoin.triggerDecision(hub, $"a", parts)
    val (_, _, fireFlat) = SaltedJoin.triggerDecision(flat, $"a", parts)

    assert(fireHub, s"hub: maxDeg $maxHub ≤ threshold $thrHub — trigger must fire")
    assert(!fireFlat, "flat: trigger must stay silent")
    assert(hotBuckets(hub) >= 1, "profile must flag the hub's bucket hot")
    assert(hotBuckets(flat) == 0, "profile must not flag any flat bucket")
    // profile and trigger agree in BOTH directions on both corpora
    assert((hotBuckets(hub) >= 1) == fireHub && (hotBuckets(flat) >= 1) == fireFlat)

    // MECHANISM: acting on the fired trigger is result-preserving — the
    // salted join over the hub slice reproduces the plain join exactly
    val share = hub.select($"a").distinct().withColumn("c", $"a" + 100)
    val plain = hub.join(share, "a").groupBy($"b").agg(sum($"c").as("s"))
    val salted = SaltedJoin.join(hub, share, Seq("a"), salts = 4)
      .groupBy($"b").agg(sum($"c").as("s"))
    assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty)
  }
}
