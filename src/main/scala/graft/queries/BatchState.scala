package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Appended-batch state plumbing (VERDICT r15 #4): the incremental keys
  * claim O(new)/index-size-free maintenance but were graded as single-shot
  * splits of one corpus — both sides derived in one job, so nothing proved
  * the INDEX can live as persisted state between batches. The `_batch`
  * twins run the true two-step protocol: batch 1 builds the index and
  * WRITES it here as parquet; batch 2 (the appended slice) reads the
  * PERSISTED index back and probes it one-sidedly. The DuckDB oracle then
  * reads the SAME landed files (the e2e_generate_ingest discipline,
  * E2EQueries), so a bug in the state WRITE — not just the probe math —
  * lands in the hash compare.
  *
  * The root is PER-PROCESS (`graft_incr_p<pid>`): a bench pass overlapping
  * the correctness run can never wipe or race the artifacts the oracle
  * reads, and Verify dumps oracle SQL embedding its own root. Each key
  * overwrites its own subdir per call, so reruns are deterministic.
  */
private[graft] object BatchState {

  /** Per-process state root — embedded verbatim in oracle SQL generated
    * by the same process. */
  val root: String =
    s"${System.getProperty("java.io.tmpdir")}/graft_incr_p${ProcessHandle.current.pid}"

  /** Write `df` as `name`'s persisted batch-1 state, then read it back —
    * every downstream consumer sees the LANDED bytes, not the plan that
    * produced them. */
  def persist(s: SparkSession, name: String, df: DataFrame): DataFrame = {
    val path = s"$root/$name"
    df.write.mode("overwrite").parquet(path)
    s.read.parquet(path)
  }

  /** DuckDB reader for `name`'s landed state. */
  def sql(name: String): String = s"read_parquet('$root/$name/*.parquet')"
}
