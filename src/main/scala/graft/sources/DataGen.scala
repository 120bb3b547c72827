package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Seeded synthetic-data generation — the reference's generator entry point
  * (src/pipeline/0_generate_historic_synthetic_data.py:23-24 seeds,
  * :146-272 per-entity generators) re-expressed as DISTRIBUTED column
  * expressions.
  *
  * Randomness is COUNTER-BASED: every draw is a hash of (seed, row id),
  * not `rand()`. Two reasons: `rand(seed)` depends on partition layout (a
  * repartition changes the data), and it is flagged nondeterministic so
  * every REFERENCE in an expression tree draws a fresh value — an
  * inverse-CDF chain over it silently samples 30 different uniforms.
  * Hash draws are pure: same (seed, id) → same value on any cluster, any
  * partitioning, any number of references.
  */
object DataGen {

  /** `n` rows with a dense `id` column, partitioned for the cluster. */
  def ids(spark: SparkSession, n: Long, partitions: Int = 0): DataFrame = {
    val p = if (partitions > 0) partitions
      else spark.sparkContext.defaultParallelism
    spark.range(0, n, 1, p).toDF("id")
  }

  private val M = 1L << 40

  /** U[0,1) from (seed, id) — pure, 40-bit resolution. */
  def uniform01(id: Column, seed: Long): Column =
    pmod(xxhash64(lit(seed), id), lit(M)).cast("double") / M.toDouble

  /** U(lo, hi). */
  def uniform(id: Column, lo: Double, hi: Double, seed: Long): Column =
    lit(lo) + uniform01(id, seed) * (hi - lo)

  /** N(mean, std) via Box–Muller from two independent hash draws —
    * reference's income/age draws (0_generate_historic:150-161). */
  def normal(id: Column, mean: Double, std: Double, seed: Long): Column = {
    val u1 = uniform01(id, seed) + lit(1.0 / M) // avoid log(0)
    val u2 = uniform01(id, seed + 1000003)
    lit(mean) + lit(std) * sqrt(lit(-2.0) * log(u1)) * cos(lit(2.0 * math.Pi) * u2)
  }

  /** Poisson(lambda) by inverse-transform on ONE uniform draw — the
    * reference's per-customer order/interaction counts (:184-185, :247).
    * CDF thresholds precomputed driver-side; capped at `maxK`. */
  def poisson(id: Column, lambda: Double, seed: Long, maxK: Int = 40): Column = {
    val u = uniform01(id, seed)
    val cdf = {
      var p = math.exp(-lambda)
      var acc = p
      (0 until maxK).map { k =>
        val t = acc
        p = p * lambda / (k + 1)
        acc += p
        t
      }
    }
    cdf.zipWithIndex.reverse.foldLeft(lit(maxK): Column) {
      case (els, (thr, k)) => when(u < thr, lit(k)).otherwise(els)
    }
  }

  /** Weighted categorical pick (reference: status/payment draws). */
  def categorical(id: Column, values: Seq[String], weights: Seq[Double],
      seed: Long): Column = {
    require(values.length == weights.length && values.nonEmpty)
    val total = weights.sum
    val u = uniform01(id, seed) * total
    val cum = weights.scanLeft(0.0)(_ + _).tail
    values.zip(cum).init.reverse.foldLeft(lit(values.last): Column) {
      case (els, (v, thr)) => when(u < thr, lit(v)).otherwise(els)
    }
  }

  /** Random timestamp in a window (reference: order_date spread over the
    * historic window). */
  def timestampIn(id: Column, startIso: String, endIso: String, seed: Long): Column = {
    val s = java.sql.Timestamp.valueOf(startIso).getTime / 1000
    val e = java.sql.Timestamp.valueOf(endIso).getTime / 1000
    timestamp_seconds(lit(s) + (uniform01(id, seed) * (e - s)).cast("long"))
  }
}
