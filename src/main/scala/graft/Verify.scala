package graft

import java.nio.file.{Files, Paths}

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // A space-separated key list would silently verify only args(2) and
    // leave the rest looking like missing outputs — refuse loudly.
    require(args.length <= 3,
      s"usage: Verify <sfDir> <outDir> [comma,separated,keys] — got " +
        s"${args.length} args (join key lists with commas, not spaces)")
    val (sfDir, outDir) = (args(0), args(1))
    // Optional 3rd arg: comma-separated query names (fast local iteration).
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val selected = SparkEntry.queries
      .filter { case (n, _) => only.forall(_.contains(n)) }
    // Queries are independent — run them as concurrent Spark jobs so the
    // scheduler overlaps their stages (cuts wall time ~3x vs sequential).
    // Pool width follows SPARK_GRAFT_CPUS like the executor threads do
    // (VERDICT r15 #6): a fixed 4 leaves an 8+-CPU dump driver-bound —
    // queries plan on the driver before their tasks fan out, so the pool
    // must scale with the box. Floor 4 keeps small boxes overlapping I/O
    // with compute; cap 16 bounds concurrent result buffers.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(math.max(cpus, 4), 16))
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val futures = selected.toSeq.map { case (name, fn) =>
      scala.concurrent.Future {
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
      }
    }
    scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(futures),
      scala.concurrent.duration.Duration.Inf)
    pool.shutdown()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // Subset re-runs must NOT repoint un-run keys' oracle SQL: the e2e
    // key's SQL embeds its per-process landing root, so pairing a stale
    // dump with a fresh root breaks the replay. Keep the existing entry
    // for any key not in this run's subset.
    val prior: Map[String, String] = only match {
      case Some(_) if Files.exists(Paths.get(s"$outDir/oracle_sql.json")) =>
        import org.json4s._
        import org.json4s.jackson.JsonMethods
        JsonMethods.parse(Files.readString(Paths.get(s"$outDir/oracle_sql.json")))
          .asInstanceOf[JObject].obj.collect { case (k, JString(v)) => k -> v }.toMap
      case _ => Map.empty
    }
    val merged = prior ++ SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) } ++
      SparkEntry.oracleSql.filter { case (k, _) => !prior.contains(k) }
    val json = merged
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
