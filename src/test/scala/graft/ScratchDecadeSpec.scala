package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.Vectors
import graft.queries.SimilarityQueries

/** TEMPORARY decade measurement — deleted before commit. */
class ScratchDecadeSpec extends SparkSpec {
  private val Gen01 = "/root/repo/testdata/sf0.1gen"
  private val Gen1 = "/root/repo/testdata/sf1"
  private val EmbDim = 64
  private val LshSeed = 7

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
  }

  test("decade walls: _lsh family sf0.1gen vs sf1; exact keys refuse sf1") {
    for (q <- Seq("dedup_minhash_lsh", "dedup_components_lsh",
      "dedup_keep_best_lsh", "dedup_semantic", "ann_ivf_trained")) {
      SimilarityQueries.queries(q)(spark, Gen01).count() // JIT/codegen warmup
      def minOf2(dir: String): Double = {
        val (_, a) = time(SimilarityQueries.queries(q)(spark, dir).count())
        val (_, b) = time(SimilarityQueries.queries(q)(spark, dir).count())
        math.min(a, b)
      }
      val t1 = minOf2(Gen01)
      val t2 = minOf2(Gen1)
      println(f"DECADE $q: sf0.1gen=$t1%.2fs sf1=$t2%.2fs ratio=${t2 / t1}%.2f")
    }
    for (q <- Seq("dedup_ngram_jaccard", "dedup_components", "dedup_keep_best")) {
      val r = try { SimilarityQueries.queries(q)(spark, Gen1); "NO-THROW (BAD)" }
      catch { case e: IllegalArgumentException =>
        if (e.getMessage.contains("saturated")) "refused loudly (saturation fence)"
        else s"IAE but odd message: ${e.getMessage.take(80)}" }
      println(s"DECADE-EXACT $q at sf1: $r")
    }
  }

  test("LshTargetBucket sweep at sf1: recall@3 + candidates + wall") {
    import spark.implicits._
    val emb = spark.read.parquet(s"$Gen1/embeddings.parquet").repartition(32)
      .select($"vec_id", $"embedding", Vectors.fnorm($"embedding").as("nrm")).cache()
    emb.count()
    val n = emb.count()
    // float truth top-3 for queries < 50
    val q = emb.filter($"vec_id" < 50)
      .select($"vec_id".as("query_id"), $"embedding".as("qe"), $"nrm".as("qn"))
    val nbr = emb.select($"vec_id".as("neighbor_id"), $"embedding".as("ne"), $"nrm".as("nn"))
    val w = Window.partitionBy($"query_id").orderBy($"cos".desc, $"neighbor_id")
    val truth = broadcast(q).join(nbr, $"query_id" =!= $"neighbor_id")
      .withColumn("cos", Vectors.cosinePrenormed(Vectors.fdot($"qe", $"ne"), $"qn", $"nn"))
      .withColumn("rank", row_number().over(w)).filter($"rank" <= 3)
      .select($"query_id", $"neighbor_id", lit(1).as("hit")).cache()
    truth.count()

    for (target <- Seq(64L, 128L, 256L)) {
      val bits = (2 to 16).find(b => (1L << b) * target >= n).getOrElse(16)
      def flip(b: org.apache.spark.sql.Column, i: Int) = concat(
        substring(b, 1, i),
        when(substring(b, i + 1, 1) === "0", "1").otherwise("0"),
        substring(b, i + 2, bits))
      val bucketed = emb.withColumn("bucket",
        Vectors.hyperplaneBucket($"embedding", EmbDim, bits, LshSeed))
      val nside = bucketed.select($"vec_id".as("neighbor_id"), $"bucket",
        $"embedding".as("ne"), $"nrm".as("nn"))
      val qside = bucketed.filter($"vec_id" < 50)
        .select($"vec_id".as("query_id"), $"embedding".as("qe"), $"nrm".as("qn"),
          explode(array($"bucket" +: (0 until bits).map(flip($"bucket", _)): _*)).as("bucket"))
      val ((ncand, recall), wall) = time {
        val cand = broadcast(qside).join(nside, Seq("bucket"))
          .filter($"query_id" =!= $"neighbor_id")
          .select($"query_id", $"neighbor_id", $"qe", $"qn", $"ne", $"nn").distinct()
        val nc = cand.count()
        val approx = cand
          .withColumn("cos", Vectors.cosinePrenormed(Vectors.fdot($"qe", $"ne"), $"qn", $"nn"))
          .withColumn("rank", row_number().over(w)).filter($"rank" <= 3)
          .select($"query_id", $"neighbor_id")
        val r = approx.join(truth, Seq("query_id", "neighbor_id"), "left")
          .groupBy($"query_id").agg(coalesce(sum($"hit"), lit(0)).as("h"))
          .agg(avg($"h")).head().getDouble(0)
        (nc, r)
      }
      println(f"SWEEP target=$target bits=$bits candidates=$ncand " +
        f"cand/query=${ncand / 50.0}%.0f recall@3=$recall%.2f wall=$wall%.2fs")
    }
  }
}
