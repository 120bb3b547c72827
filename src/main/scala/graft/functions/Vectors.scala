package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector column math over `array<float>` embedding columns.
  *
  * Elementwise ops are cast to double first and folded left-to-right
  * (`aggregate` is a sequential fold), so the result is bit-identical to any
  * engine that evaluates sum(x_i*y_i) in index order — which makes cosine
  * scores oracle-comparable. Everything is built-in higher-order functions:
  * no UDF, no serialization boundary, runs inside codegen'd projections.
  */
object Vectors {

  private def d(c: Column): Column = c.cast("array<double>")

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(d(a), d(b), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Random-hyperplane LSH bit: sign of dot(v, plane) for a deterministic
    * pseudo-random plane derived from (seed, index). Used to bucket vectors
    * so near-duplicate search joins within buckets instead of n². */
  def hyperplaneBit(v: Column, dim: Int, seed: Int): Column = {
    // Deterministic plane: component i = hash(seed, i) mapped to [-1, 1].
    // xxhash64 is a built-in, stable across runs and cluster nodes.
    val plane = transform(
      sequence(lit(0), lit(dim - 1)),
      i => (pmod(xxhash64(lit(seed), i), lit(2000001L)).cast("double") / lit(1000000.0)) - lit(1.0))
    (aggregate(zip_with(d(v), plane, (x, p) => x * p), lit(0.0), (acc, x) => acc + x) >= 0).cast("int")
  }

  /** k-bit signature as a string bucket key. */
  def hyperplaneBucket(v: Column, dim: Int, bits: Int, seed: Int): Column =
    concat_ws("", (0 until bits).map(b => hyperplaneBit(v, dim, seed * 1000 + b)): _*)
}
