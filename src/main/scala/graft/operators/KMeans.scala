package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Lloyd's k-means over embedding columns as pure DataFrame ops — trains
  * the IVF coarse quantizer that [[graft.queries.SimilarityQueries]]'s
  * `ann_ivf` uses a training-free stand-in for ("a real deployment swaps
  * in k-means centroids without changing the plan shape").
  *
  * DETERMINISM is the design driver, because the correctness gate
  * hash-compares against an independent engine:
  *  - components are quantized to integers (`round(x · 2^20)`) before any
  *    aggregation: BIGINT sums are exact and ASSOCIATIVE, so the reduce
  *    order Spark picks cannot change the centroid (a double sum varies
  *    run to run with partial-aggregation order — unacceptable under a
  *    hash compare, and a real nondeterminism bug at any scale);
  *  - a centroid is represented by its per-dimension integer SUM (not the
  *    mean): cosine is scale-invariant, so ranking against the sum vector
  *    equals ranking against the mean while staying exact;
  *  - init is the first k vectors by id; assignment ties break on
  *    cent_id; fixed iteration count. Every step is replayable in SQL.
  *
  * Scale shape per iteration: one broadcast join (k centroids against n
  * vectors) + rank-1 window for assignment, one posexplode + two-level
  * aggregation for the update — O(n·k·d) compute, no n² anywhere, k rows
  * of state between iterations.
  */
object KMeans {

  /** Component quantization scale (2^20 ≈ 6 decimal digits — far below
    * float noise for unit-ish embeddings, far above rank-flip risk). */
  val Scale: Long = 1L << 20

  /** Quantize an array<float|double> column to array<bigint>. */
  def quantize(vec: Column): Column =
    transform(vec, x => round(x.cast("double") * Scale).cast("bigint"))

  /** Sequential-fold double dot product of two array<bigint> columns —
    * the SAME left-to-right order as the oracle's list comprehension, so
    * both engines produce bit-identical doubles. A native codegen
    * expression since r17 ([[graft.functions.VecExpr.ldot]]): the old
    * `aggregate(zip_with(...))` form is a CodegenFallback chain evaluated
    * interpreted per candidate row — the assign/score hot loop of every
    * k-means-backed key. Same widening, same summation order, bit-equal
    * doubles. */
  def idot(a: Column, b: Column): Column = graft.functions.VecExpr.ldot(a, b)

  private def inorm(a: Column): Column = sqrt(idot(a, a))

  /** Cosine between integer vectors (scale cancels). */
  def icos(a: Column, b: Column): Column = idot(a, b) / (inorm(a) * inorm(b))

  /** Cosine with the two norms precomputed (r17 hot-path form): callers
    * hoist `sqrt(idot(v, v))` to a per-ROW projection before the pair
    * explosion, so each candidate pair pays ONE dot instead of three.
    * The division's operand order — dot / (normA * normB) — is exactly
    * [[icos]]'s, evaluated on the identical doubles, so every result is
    * bit-equal and the oracle replay is untouched. */
  def icosPrenormed(dot: Column, na: Column, nb: Column): Column =
    dot / (na * nb)

  /** The argmax tiebreak [[assign]]/[[assignSub]] share: max over
    * struct(cos, −cent_id) picks the highest cosine and, on ties, the
    * LOWEST cent_id — the same (cos desc, cent_id asc) order the old
    * rank-1 window implemented. A hash aggregate replaces the window
    * (r17, guide §2.3 "aggregate before you shuffle"): the n·k
    * crossed rows collapse map-side (each id's k rows are consecutive in
    * the crossJoin output), so the exchange carries n rows instead of
    * sorting n·k — and the sort the window needed disappears. */
  private def best(cos: Column, centId: Column): Column =
    max(struct(cos.as("c"), (-centId).as("nc")))

  /** Rank-1 nearest-centroid assignment: (id, cent_id). `cents` must be
    * broadcastable (k rows). */
  def assign(q: DataFrame, cents: DataFrame): DataFrame =
    assignKeep(q, cents).select(col("id"), col("cent_id"))

  /** [[assign]] keeping the row's `qv` (constant per id, so `first` in
    * the same aggregate is deterministic) — lets [[fit]]'s update read
    * member vectors straight off the assignment instead of re-joining
    * the corpus by id (two exchanges per iteration saved).
    *
    * PRECONDITION: `id` is unique in `q`. The groupBy(id)+first(qv)
    * collapses duplicate-id rows to one, whereas the old assign-then-
    * rejoin shape fanned duplicates back into the centroid sums — every
    * caller here feeds vec_id-unique corpora (and [[fit]]'s dense-id seed
    * check would already trip on most duplicate-id inputs), but a new
    * caller with a non-unique id corpus would silently train on
    * deduplicated vectors. */
  private def assignKeep(q: DataFrame, cents: DataFrame): DataFrame = {
    val qn = q.withColumn("__qn", inorm(col("qv")))
    val cn = broadcast(cents.select(col("cent_id"), col("cvec"))
      .withColumn("__cn", inorm(col("cvec"))))
    qn.crossJoin(cn)
      .select(col("id"), col("qv"), col("cent_id"),
        icosPrenormed(idot(col("qv"), col("cvec")), col("__qn"), col("__cn"))
          .as("__cos"))
      .groupBy(col("id"))
      .agg(best(col("__cos"), col("cent_id")).as("__b"), first(col("qv")).as("qv"))
      .select(col("id"), (-col("__b.nc")).as("cent_id"), col("qv"))
  }

  /** Rank-1 nearest-centroid assignment per SUBSPACE: input rows
    * (id, j, qv), centroids (j, cent_id, cvec, ...) — broadcastable
    * (subspaces × k rows). Returns (id, j, cent_id). Same hoisted norms
    * + argmax aggregate as [[assign]], keyed (id, j). */
  def assignSub(sub: DataFrame, cents: DataFrame): DataFrame =
    assignSubKeep(sub, cents).select(col("id"), col("j"), col("cent_id"))

  private def assignSubKeep(sub: DataFrame, cents: DataFrame): DataFrame = {
    val qn = sub.withColumn("__qn", inorm(col("qv")))
    val cn = broadcast(cents.select(col("j"), col("cent_id"), col("cvec"))
      .withColumn("__cn", inorm(col("cvec"))))
    qn.join(cn, Seq("j"))
      .select(col("id"), col("j"), col("qv"), col("cent_id"),
        icosPrenormed(idot(col("qv"), col("cvec")), col("__qn"), col("__cn"))
          .as("__cos"))
      .groupBy(col("id"), col("j"))
      .agg(best(col("__cos"), col("cent_id")).as("__b"), first(col("qv")).as("qv"))
      .select(col("id"), col("j"), (-col("__b.nc")).as("cent_id"), col("qv"))
  }

  /** PRODUCT-QUANTIZATION trainer: one independent codebook PER SUBSPACE,
    * all trained in ONE shared set of Spark jobs — the key (j) simply
    * rides through every assignment window and update aggregation, so the
    * job count equals a single [[fit]] regardless of how many subspaces
    * there are (8 sequential fits would cost 8× the fixed per-job
    * overhead AND 8 passes over the data; at 100 TB one pass is the only
    * acceptable shape). Input: (id: long, j: int, qv: array<bigint>) —
    * already-quantized subvectors, (id, j) unique (see [[assignKeep]]'s
    * precondition). Returns (j, cent_id, cvec,
    * n_members), where cvec is the member-SUM vector and n_members the
    * exact member count of the SAME final update — so `cvec/n_members`
    * is the centroid mean, the reconstruction value ADC scoring needs
    * (cosine assignment is scale-free, but cross-subspace ADC sums are
    * not). Same determinism contract as [[fit]]: exact BIGINT sums,
    * first-k-ids init, cent_id tiebreaks, per-round lineage cuts. */
  def fitSub(sub: DataFrame, k: Int, iterations: Int): DataFrame = {
    require(k >= 1 && iterations >= 0)
    var cents = sub.filter(col("id") < k)
      .select(col("j"), col("id").as("cent_id"), col("qv").as("cvec"),
        lit(1L).as("n_members"))
    for (_ <- 1 to iterations) {
      // assignment carries each member's qv (r17), so the update reads
      // vectors off the assignment instead of re-joining `sub` by
      // (id, j). r18: the member COUNT rides the sums aggregation instead
      // of a second pass — every member vector contributes exactly one
      // row per __pos (subvectors are fixed-width), so the level-1 group
      // (j, cent_id, __pos) row count IS n_members, identical for every
      // __pos of the group; max() just reads it out at level 2. With the
      // update a single consumer, the per-iteration `assigned`
      // localCheckpoint barrier (and the counts pass it existed for)
      // disappears — one aggregation chain per Lloyd step.
      val sums = assignSubKeep(sub, cents)
        .select(col("j"), col("cent_id"), posexplode(col("qv")).as(Seq("__pos", "__v")))
        .groupBy(col("j"), col("cent_id"), col("__pos"))
        .agg(sum(col("__v")).as("__s"), // exact BIGINT — order-free
          count(lit(1)).as("__n"))
        .groupBy(col("j"), col("cent_id"))
        .agg(transform(array_sort(collect_list(struct(col("__pos"), col("__s")))),
          s => s.getField("__s")).as("__newvec"),
          max(col("__n")).as("__n"))
      cents = cents.join(sums, Seq("j", "cent_id"), "left")
        .select(col("j"), col("cent_id"),
          coalesce(col("__newvec"), col("cvec")).as("cvec"), // empty → keep
          coalesce(col("__n"), col("n_members")).as("n_members"))
        .localCheckpoint() // same geometric-lineage guard as fit()
    }
    cents
  }

  /** Train k centroids for `iterations` Lloyd steps. Returns
    * (cent_id, cvec: array<bigint>) where cvec is the member-SUM vector
    * (cosine-equivalent to the mean). Empty clusters keep their previous
    * centroid. Input: (idCol: long, vecCol: array<float|double>), idCol
    * unique (see [[assignKeep]]'s precondition). */
  def fit(emb: DataFrame, idCol: String, vecCol: String, k: Int,
      iterations: Int): DataFrame = {
    require(k >= 1 && iterations >= 0)
    val q = emb.select(col(idCol).as("id"), quantize(col(vecCol)).as("qv"))
    var cents = q.filter(col("id") < k)
      .select(col("id").as("cent_id"), col("qv").as("cvec"))
    // the documented init is "the k vectors with id ∈ [0, k)" — an id
    // space that is sparse or offset there would SILENTLY under-seed the
    // codebook and every assignment downstream would look like "no
    // neighbors"; fail loudly instead (one k-row count, negligible)
    val seeded = cents.count()
    require(seeded == k,
      s"KMeans.fit seeds centroids from ids [0, $k) but found only $seeded " +
        s"of $k — the id column must be dense from 0 (re-index or lower k)")
    for (_ <- 1 to iterations) {
      // the assignment keeps qv (r17): no corpus re-join per iteration
      val sums = assignKeep(q, cents)
        .select(col("cent_id"), posexplode(col("qv")).as(Seq("__pos", "__v")))
        .groupBy(col("cent_id"), col("__pos"))
        .agg(sum(col("__v")).as("__s")) // exact BIGINT — order-free
        .groupBy(col("cent_id"))
        .agg(transform(array_sort(collect_list(struct(col("__pos"), col("__s")))),
          s => s.getField("__s")).as("__newvec"))
      cents = cents.join(sums, Seq("cent_id"), "left")
        .select(col("cent_id"),
          coalesce(col("__newvec"), col("cvec")).as("cvec")) // empty cluster → keep
        // Truncate lineage EVERY round (VERDICT r6 #2): without this,
        // iteration i's plan nests all i−1 prior assign+update plans — the
        // exact geometric-lineage shape that hung the driver in the
        // round-4 dedup_semantic incident (PERF.md), dormant here only
        // while iterations stayed at 2. The state is k rows, so the
        // checkpoint is free, and it mirrors Components' per-round spill.
        // Values are unchanged (the BIGINT sums are already exact), so
        // the oracle hash cannot move.
        .localCheckpoint()
    }
    cents
  }
}
