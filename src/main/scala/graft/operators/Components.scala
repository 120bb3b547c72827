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
    * @return (id, component) — component = min id reachable; only ids that
    *         appear in `edges` are labeled (isolated vertices are the
    *         complement of the edge set; callers union them if needed).
    *         The result is returned PERSISTED (it was materialized by the
    *         convergence probes); lineage is intact, so callers may
    *         `unpersist()` it after their terminal action — otherwise the
    *         context cleaner reclaims it on GC. */
  def connectedComponents(edges: DataFrame, src: String = "src",
      dst: String = "dst", maxIterations: Int = 20): DataFrame = {
    val sym = edges.select(col(src).cast("long").as("src"), col(dst).cast("long").as("dst"))
      .union(edges.select(col(dst).cast("long").as("src"), col(src).cast("long").as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("component", col("id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var converged = false
    var i = 0
    while (!converged && i < maxIterations) {
      val prop = sym.join(labels.select(col("id").as("src"), col("component")), "src")
        .select(col("dst").as("id"), col("component"))
      val next = labels.union(prop)
        .groupBy("id").agg(min("component").as("component"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val changed = next.join(labels.withColumnRenamed("component", "prev"), "id")
        .filter(col("component") < col("prev"))
        .limit(1).count()
      labels.unpersist(blocking = false)
      labels = next
      converged = changed == 0L
      i += 1
    }
    sym.unpersist(blocking = false)
    labels
  }
}
