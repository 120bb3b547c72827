package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over an edge list — the dedup-clustering step that
  * turns near-duplicate PAIRS (MinHash/SimHash/Jaccard output) into
  * duplicate GROUPS, so a pipeline can keep one canonical document per
  * component. The reference has no graph operator; this is the standard
  * iterative min-label-propagation formulation (the GraphX/GraphFrames
  * algorithm expressed in plain DataFrame ops, no extra dependency).
  *
  * Each round every vertex adopts the smallest component id among itself
  * and its neighbors; convergence takes O(graph diameter) rounds. Near-dup
  * graphs are unions of small dense clusters (diameter 2-4 in practice),
  * so the loop is short; each round is one join + one min-aggregate —
  * shuffle-bounded, no driver-side graph state.
  *
  * Iterative-DataFrame mechanics that matter at scale:
  *  - labels are persisted per round and the previous round unpersisted,
  *    otherwise the lineage doubles every iteration and round k replays
  *    all k-1 predecessors;
  *  - the convergence probe is `limit(1).count` on the changed-rows join —
  *    it stops at the first change instead of counting them all.
  */
object Components {

  /** @param edges DataFrame with two id columns (undirected edges)
    * @param scratchDir where the final labeling is checkpointed (parquet).
    *        Defaults to a JVM temp dir — fine on local mode; on a cluster
    *        pass a shared-filesystem path. The checkpoint is what lets this
    *        function release EVERY cached block before returning (ADVICE
    *        r3: the old contract handed back a persisted frame that library
    *        callers leaked until the context cleaner ran) while still
    *        returning a cheap, lineage-free flat scan.
    * @return (id, component) — component = min id reachable; only ids that
    *         appear in `edges` are labeled (isolated vertices are the
    *         complement of the edge set; callers union them if needed).
    * @throws IllegalStateException if the labels have not converged after
    *         `maxIterations` rounds — a partially-propagated labeling would
    *         silently violate the min-id contract on graphs whose diameter
    *         exceeds the cap, so the failure must be loud. Raise
    *         `maxIterations` (rounds needed = graph diameter). */
  def connectedComponents(edges: DataFrame, src: String = "src",
      dst: String = "dst", maxIterations: Int = 20,
      scratchDir: Option[String] = None): DataFrame = {
    // No .distinct() on sym and no distinct initial-label build: duplicate
    // edges/ids are absorbed by the min-aggregate each round anyway, and the
    // two distincts were one to two extra shuffle stages materialized in the
    // first round (measured: round 0 was 5-8x the cost of later rounds, all
    // setup). sym persists narrow (union is partition-local).
    val sym = edges.select(col(src).cast("long").as("src"), col(dst).cast("long").as("dst"))
      .union(edges.select(col(dst).cast("long").as("src"), col(src).cast("long").as("dst")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // labels carries (id, component, prev): prev = the component this id had
    // at the START of the round that produced the row. Folding prev into the
    // min-aggregate lets the convergence probe be a filter on the persisted
    // result instead of a join back against the previous generation —
    // one shuffle per round instead of two. The initial generation may hold
    // duplicate ids (one per incident edge); round 0's groupBy collapses
    // them, and min("self") over identical values still recovers prev.
    var labels = sym
      .select(col("src").as("id"), col("src").as("component"), col("src").as("prev"))
    var converged = false
    var i = 0
    while (!converged && i < maxIterations) {
      val self = labels.select(col("id"), col("component"), col("component").as("self"))
      val prop = sym.join(labels.select(col("id").as("src"), col("component")), "src")
        .select(col("dst").as("id"), col("component"), lit(null).cast("long").as("self"))
      // Each id appears exactly once in `self`, so min("self") (nulls
      // ignored) recovers the round-start label alongside the new min.
      val next = self.union(prop)
        .groupBy("id").agg(min("component").as("component"), min("self").as("prev"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val t0 = System.nanoTime()
      val changed = next.filter(col("component") < col("prev")).limit(1).count()
      if (sys.env.contains("GRAFT_CC_DEBUG"))
        System.err.println(f"[cc] round $i: ${(System.nanoTime() - t0) / 1e9}%.2fs changed=$changed")
      labels.unpersist(blocking = false)
      labels = next
      converged = changed == 0L
      i += 1
    }
    sym.unpersist(blocking = false)
    if (!converged) {
      labels.unpersist(blocking = false)
      throw new IllegalStateException(
        s"connectedComponents did not converge within $maxIterations iterations; " +
          "graph diameter exceeds the cap — raise maxIterations")
    }
    // checkpoint-and-release: distributed parquet write of the (small)
    // labeling, then drop the last cached generation. Callers get a flat
    // scan with no lineage back into the iteration and the operator leaves
    // zero retained blocks behind (asserted in ComponentsSpec).
    val out = scratchDir.getOrElse(
      java.nio.file.Files.createTempDirectory("graft_cc_").toString) + "/components"
    labels.select("id", "component")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(out)
    labels.unpersist(blocking = false)
    edges.sparkSession.read.parquet(out)
  }
}
