package graft.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-curation operators a large-scale training-data pipeline needs
  * AFTER similarity/dedup analysis has produced its pair lists:
  *
  *  - near-dup **cluster resolution**: pairs → connected components →
  *    one keeper per cluster (the step that turns "A~B, B~C" into
  *    "keep A, drop B and C" — without it a pair list over-deletes or
  *    under-deletes chained duplicates);
  *  - deterministic **stratified sampling**: per-stratum rates applied
  *    via a content hash, so the sample is reproducible across runs,
  *    engines, and cluster sizes (no RNG state, no seed plumbing);
  *  - benchmark **contamination detection**: word n-gram overlap between
  *    the corpus and a (small) probe/benchmark set — the standard
  *    train/test leakage check.
  *
  * Everything is expression-only (codegen'd) except the component loop,
  * which is the documented iterative-join shape.
  */
object Curation {

  /** Connected components over an undirected pair list by alternating
    * large-star / small-star contraction (Kiveris et al., "Connected
    * Components in MapReduce and Beyond", SoCC'14): each round rewires
    * every node toward the minimum id in its neighborhood, and the edge
    * list converges to stars rooted at each component's minimum member —
    * the cluster keeper — in O(log² n) rounds WORST CASE (adversarial
    * long chains included), versus O(component diameter) for plain
    * min-label propagation. Near-dup clusters are usually shallow, where
    * both converge in 2-3 rounds; the star bound is what survives a
    * pathological 10^6-link chain at corpus scale (CurationSpec runs a
    * 10k-node path graph through it).
    *
    *  - large-star(u): for m = min({u} ∪ N(u)), emit (v, m) for every
    *    neighbor v > u — strictly-larger neighbors re-attach to the local
    *    minimum (keeps the graph connected, never increases edge count);
    *  - small-star(u): over edges directed large→small, for
    *    m = min({u} ∪ N⁻(u)), emit (v, m) for v ∈ N⁻(u) ∪ {u} —
    *    smaller-or-equal neighbors and u itself collapse onto m.
    *
    * Scale shape: each star op is ONE exchange (its neighborhood min is
    * a window aggregate over the key partition, so the old groupBy +
    * join-back pair of exchanges collapses into the window's); the edge
    * list is materialized per round (lazy [[graft.util.Materialize]]
    * barrier, pinned by the fingerprint job). Convergence is
    * screened by an order-insensitive edge-multiset fingerprint (count +
    * bounded-hash sum, computed off the pinned blocks) and CONFIRMED by
    * an exact anti-join set comparison — run once, at the stable round —
    * so the stop condition is exact, not probabilistic.
    *
    * @param docs  one row per document (singletons become their own
    *              keeper)
    * @param pairs near-dup pairs (`id_a`, `id_b`), any orientation
    * @return (idCol, keeper_id) for EVERY doc; survivors of cluster
    *         dedup are the rows with idCol == keeper_id
    */
  def neardupClusters(docs: DataFrame, idCol: String, pairs: DataFrame,
      maxIters: Int = 50): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val barrier = graft.util.Materialize.lazyBarrier _

    /** large-star: strictly-larger neighbors attach to the neighborhood
      * min. The per-neighborhood min is a window aggregate over the key
      * partition — ONE exchange, where the previous groupBy + join-back
      * shape paid two (guide §2.4: window keyed like the aggregation
      * shares its exchange). Output is NOT deduplicated (≤ 2|e| rows):
      * small-star's window is duplicate-insensitive and its final
      * `distinct` restores the set — one fewer exchange per round than
      * deduplicating both halves.
      */
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.unionAll(e.select(col("v").as("u"), col("u").as("v")))
      sym.withColumn("m",
          least(col("u"), min(col("v")).over(Window.partitionBy(col("u")))))
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
    }

    /** small-star: over large→small directed edges, ≤-neighbors and the
      * center collapse onto the neighborhood min (same one-exchange
      * window shape; the center's (u, m) edge rides the same rows via an
      * explode instead of a second aggregate-and-union pass).
      */
    def smallStar(e: DataFrame): DataFrame = {
      val dir = e.select(greatest(col("u"), col("v")).as("u"),
          least(col("u"), col("v")).as("v"))
        .filter(col("u") =!= col("v"))
      dir.withColumn("m",
          min(col("v")).over(Window.partitionBy(col("u")))) // all v < u ⇒ m = min
        .select(explode(array(
          struct(col("v").as("u"), col("m").as("v")),
          struct(col("u"), col("m").as("v")))).as("e"))
        .select(col("e.u").as("u"), col("e.v").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
    }

    /** Order-insensitive multiset fingerprint of an edge list; hash values
      * bounded < 2^31 keep the ANSI sum exact up to 2^31 edges. Used as
      * the cheap per-round stability SCREEN — a matching fingerprint is
      * CONFIRMED by an exact set comparison before the loop stops, so a
      * 2^-64 hash-sum collision can only cost one extra round, never a
      * wrong early stop. Doubles as the barrier's materializing action
      * (the barriers are lazy): ONE job per round pins the round's edge
      * blocks AND screens convergence.
      */
    def fingerprint(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)).as("n"),
        coalesce(sum(pmod(xxhash64(col("u"), col("v")), lit(2147483647L))), lit(0L))
          .as("h")).head()
      (r.getLong(0), r.getLong(1))
    }
    // both lists are distinct() outputs with KNOWN-EQUAL cardinality
    // (the fingerprint screen compared counts before this runs), so
    // a ∖ b = ∅ alone proves a = b — one anti-join, not two
    def sameEdges(a: DataFrame, b: DataFrame): Boolean =
      a.join(b, Seq("u", "v"), "left_anti").isEmpty

    var edges = barrier(
      pairs.select(col("id_a").as("u"), col("id_b").as("v"))
        .filter(col("u") =!= col("v")).distinct())
    var fp = fingerprint(edges)
    var converged = fp._1 == 0L // count from the fingerprint: no isEmpty job
    var iter = 0
    while (!converged && iter < maxIters) {
      val prev = edges
      edges = barrier(smallStar(largeStar(edges)))
      val fp2 = fingerprint(edges)
      converged = fp2 == fp && sameEdges(edges, prev)
      fp = fp2
      iter += 1
    }
    require(converged,
      s"neardupClusters: star contraction did not converge in $maxIters " +
        "rounds (bound is O(log² n)) — raise maxIters")
    // at fixpoint every non-root node carries exactly (node → component
    // min); the min-agg is belt-and-braces for the final round's multiset
    val labels = edges.groupBy(col("u").as("id")).agg(min(col("v")).as("root"))
    docs.select(col(idCol).as("id"))
      .join(labels, Seq("id"), "left")
      .select(col("id").as(idCol), coalesce(col("root"), col("id")).as("keeper_id"))
  }

  /** Uniform-in-[0, 2^32) hash of a column: the integer value of the
    * first 8 hex chars of md5 of its string form. Pure, seedless, and
    * bit-reproducible in any engine with md5 — the sampling analog of
    * the engine's md5-prefix simhash folds.
    */
  def hashUniform(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 8), 16, 10).cast("long")

  /** Deterministic stratified sampling: keep a row iff
    * `hashUniform(id) < rate(stratum) * 2^32`. Per-stratum rates come as
    * exact 32-bit integer thresholds (no float compare crosses the
    * engine boundary). Unlisted strata use `defaultThreshold`.
    *
    * Scale shape: a pure filter on the scan — no shuffle, no sort, no
    * sample() RNG whose result depends on partitioning. The same row set
    * survives at any parallelism, which is what makes downstream stages
    * cacheable and re-runs auditable.
    */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
      thresholds: Map[String, Long], defaultThreshold: Long): DataFrame = {
    val thr = thresholds.foldLeft(lit(defaultThreshold)) {
      case (acc, (stratum, t)) =>
        when(col(strataCol) === stratum, lit(t)).otherwise(acc)
    }
    df.filter(hashUniform(col(idCol)) < thr)
  }

  /** Benchmark-contamination check: for each corpus doc, the number of
    * distinct word n-grams it shares with the probe (benchmark) set and
    * how many distinct probe docs it collides with. Docs with no overlap
    * are absent from the result.
    *
    * Scale shape: the probe side is a benchmark — thousands of docs, not
    * billions — so its distinct (gram, probe_id) postings broadcast; the
    * corpus side is one scan + explode with NO shuffle before the
    * map-side-combined per-doc aggregation. At 100 TB the job is
    * scan-bound, which is the floor.
    */
  def contamination(corpus: DataFrame, probe: DataFrame,
      idCol: String, textCol: String, n: Int = 4): DataFrame = {
    // parallelism guard BEFORE the explode (guide §2.5): the corpus
    // shingling kernel is the dominant per-row cost and otherwise runs
    // on however many partitions the scan produced (one, for a table
    // under one split) — measured 0.47 → 0.38 s at sf0.1 (min of 7).
    // The two stacked count_distinct exchanges below CANNOT be fused by
    // a keyed repartition: the multi-distinct plan inserts an Expand,
    // which reports UnknownPartitioning, so any pre-aggregation
    // partitioning is discarded — verified in the plan (a doc_id
    // repartition still left both aggregate exchanges in place).
    val cg = graft.util.Parallelism.ensure(corpus, col(idCol))
      .select(col(idCol).as("doc_id"),
        explode(Dedup.wordShingles(col(textCol), n)).as("g"))
    val pg = probe.select(col(idCol).as("probe_id"),
      explode(Dedup.wordShingles(col(textCol), n)).as("g")).distinct()
    cg.join(broadcast(pg), "g")
      .groupBy("doc_id")
      .agg(count_distinct(col("g")).as("n_matched_grams"),
        count_distinct(col("probe_id")).as("n_probe_docs"))
  }

  /** Per-document term salience, integer-exact: the k terms of each doc
    * with the LOWEST corpus document frequency (ties by term asc) — the
    * rank order TF-IDF induces when per-doc term sets are distinct
    * (tf = 1), without any float idf arithmetic an oracle could
    * disagree with at the last bit.
    *
    * Scale shape: one explode scan materializes the distinct
    * (doc, term) postings ONCE; df is a map-side-combined aggregation
    * over them; the join back to postings reuses the term partitioning
    * (Catalyst reuses the exchange); the final per-doc top-k is a
    * rank-limited window. No driver state, vocabulary never collected.
    */
  def rarestTerms(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // parallelism guard before the explode (guide §2.5): the tokenizer
    // kernel otherwise runs on the raw scan's partitioning
    val postings = graft.util.Parallelism.ensure(docs, col(idCol))
      .select(col(idCol).as("doc_id"),
        explode(Dedup.wordShingles(col(textCol), 1)).as("term"))
    val df = postings.groupBy("term").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("df").asc, col("term").asc)
    postings.join(df, "term")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("term"), col("df"), col("rank"))
  }

  /** Exact per-group order statistics with pure integer index
    * arithmetic: rows ordered by (value, tiebreak) within each group;
    * median = the ceil(n/2)-th row's value, p90 = the ceil(9n/10)-th —
    * no interpolation, so any engine reproduces the numbers exactly
    * (percentile_cont's float interpolation is ULP-fragile across
    * engines).
    *
    * Scale shape: one exchange on the group key serves both window
    * passes and the final aggregation (Catalyst reuses the sort).
    * Order statistics via a full per-group sort is the exact-answer
    * cost; at 100 TB the approximate path (percentile_approx) is the
    * documented alternative when ±ε is acceptable.
    */
  def groupedOrderStats(df: DataFrame, groupCol: String,
      valueCol: String, tieCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byVal = Window.partitionBy(col(groupCol))
      .orderBy(col(valueCol).asc, col(tieCol).asc)
    val all = Window.partitionBy(col(groupCol))
    // ceil(n/2) and ceil(9n/10) via floor((a+b-1)/b): double division of
    // small positive longs then truncating cast is exact floor here
    val kMed = ((col("__n") + 1) / 2).cast("long")
    val kP90 = ((col("__n") * 9 + 9) / 10).cast("long")
    df.withColumn("__rn", row_number().over(byVal))
      .withColumn("__n", count(lit(1)).over(all))
      .groupBy(col(groupCol))
      .agg(max(col("__n")).as("n_rows"),
        min(col(valueCol)).as("min_v"),
        max(col(valueCol)).as("max_v"),
        max(when(col("__rn") === kMed, col(valueCol))).as("median_v"),
        max(when(col("__rn") === kP90, col(valueCol))).as("p90_v"))
  }
}
