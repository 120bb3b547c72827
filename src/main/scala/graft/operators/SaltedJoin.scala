package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-breaking salted equi-join.
  *
  * When one join key carries a disproportionate share of the fact rows, the
  * task holding that key becomes the straggler (AQE's skew-join split helps
  * within a partition but still routes one key to one reducer for the
  * build). Salting shards the hot key across `salts` reducers: the fact
  * side gets a uniform salt per row, the dimension side is replicated once
  * per salt value, and the join key becomes (key, salt).
  *
  * Cost model: dimension side grows ×salts — use only when dim ≪ fact
  * (the usual skew case) and the broadcast threshold is exceeded, else a
  * plain broadcast join is strictly better.
  */
object SaltedJoin {

  def join(fact: DataFrame, dim: DataFrame, keys: Seq[String], salts: Int,
      joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    val saltCol = "__graft_salt"
    // Uniform pseudo-random salt per fact row; derived from the whole row's
    // key + a spread hash so equal keys fan out. rand() would also be fine
    // for join correctness but this keeps runs replayable.
    val spread = pmod(
      xxhash64(keys.map(col) :+ monotonically_increasing_id(): _*), lit(salts.toLong))
    val saltedFact = fact.withColumn(saltCol, spread.cast("int"))
    val saltedDim = dim.withColumn(saltCol,
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(saltedDim, keys :+ saltCol, joinType).drop(saltCol)
  }

  /** Convenience: top-N hottest key values of `c` in `df` — use to decide
    * whether salting is warranted (hot share ≫ 1/parallelism). */
  def keyHistogram(df: DataFrame, c: Column, topN: Int = 10): DataFrame =
    df.groupBy(c.as("key")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("key")).limit(topN)
}
