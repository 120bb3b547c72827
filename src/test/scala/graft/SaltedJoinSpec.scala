package graft

import org.apache.spark.sql.functions._
import graft.operators.SaltedJoin

class SaltedJoinSpec extends SparkSpec {

  test("salted join matches plain join results on skewed keys") {
    import spark.implicits._
    // 10k rows of hot key 1, sprinkle of others
    val fact = (Seq.fill(10000)(1) ++ (2 to 50)).zipWithIndex
      .map { case (k, i) => (k, i.toLong) }.toDF("k", "v")
    val dim = (1 to 50).map(k => (k, s"dim$k")).toDF("k", "label")
    val expected = fact.join(dim, Seq("k")).agg(count(lit(1)), sum($"v")).head()
    val got = SaltedJoin.join(fact, dim, Seq("k"), salts = 8)
      .agg(count(lit(1)), sum($"v")).head()
    assert(got == expected)
  }

  test("left join keeps unmatched fact rows exactly once") {
    import spark.implicits._
    val fact = Seq((1, "a"), (99, "zz")).toDF("k", "v")
    val dim = Seq((1, "d1")).toDF("k", "label")
    val got = SaltedJoin.join(fact, dim, Seq("k"), salts = 4, "left")
      .orderBy("k").collect()
    assert(got.length == 2)
    assert(got(1).isNullAt(2)) // k=99 survives with null label
  }

  test("outer join types that would replicate dim rows are refused") {
    import spark.implicits._
    val fact = Seq((1, "a")).toDF("k", "v")
    val dim = Seq((1, "d1"), (2, "unmatched")).toDF("k", "label")
    intercept[IllegalArgumentException] {
      SaltedJoin.join(fact, dim, Seq("k"), salts = 4, "right_outer")
    }
    intercept[IllegalArgumentException] {
      SaltedJoin.join(fact, dim, Seq("k"), salts = 4, "full")
    }
  }

  test("keyHistogram surfaces the hot key") {
    import spark.implicits._
    val fact = (Seq.fill(100)(7) ++ Seq(1, 2, 3)).toDF("k")
    val top = SaltedJoin.keyHistogram(fact, $"k", 1).head()
    assert(top.getInt(0) == 7 && top.getLong(1) == 100L)
  }
}
