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

  /** Connected components over an undirected pair list by iterative
    * min-label propagation: every doc starts labeled with its own id;
    * each round, a doc adopts the smallest label among itself and its
    * neighbors; at fixpoint every component is labeled by its minimum
    * member id — the cluster keeper.
    *
    * Scale shape: the edge list is materialized once and reused each
    * round (`localCheckpoint` — it is read `iterations` times); a round
    * is one shuffle join + one map-side-combined `min` aggregation, and
    * convergence needs O(component diameter) rounds. Near-dup clusters
    * are shallow (duplicates of a common ancestor), so the loop is a few
    * rounds even at corpus scale; for adversarially long chains the
    * alternating large-star/small-star algorithm (Kiveris et al.) drops
    * the bound to O(log n) rounds — same per-round plan, noted here as
    * the 1000-executor upgrade path.
    *
    * @param docs  one row per document (singletons become their own
    *              keeper)
    * @param pairs near-dup pairs (`id_a`, `id_b`), any orientation
    * @return (idCol, keeper_id) for EVERY doc; survivors of cluster
    *         dedup are the rows with idCol == keeper_id
    */
  def neardupClusters(docs: DataFrame, idCol: String, pairs: DataFrame,
      maxIters: Int = 25): DataFrame = {
    val edges = pairs
      .select(col("id_a").as("u"), col("id_b").as("v"))
      .unionAll(pairs.select(col("id_b").as("u"), col("id_a").as("v")))
      .localCheckpoint()
    var labels = docs.select(col(idCol).as("id"), col(idCol).as("label"))
      .localCheckpoint()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      val nbrMin = edges
        .join(labels.withColumnRenamed("id", "u")
          .withColumnRenamed("label", "ulabel"), "u")
        .groupBy(col("v").as("id"))
        .agg(min(col("ulabel")).as("nmin"))
      // one job per round: the step keeps the previous label alongside
      // the new one, so the convergence count is a cheap scan of the
      // checkpointed blocks instead of a second join
      val stepped = labels
        .withColumnRenamed("label", "prev")
        .join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("prev"),
          least(col("prev"), coalesce(col("nmin"), col("prev"))).as("label"))
        .localCheckpoint()
      val changed = stepped.filter(col("label") =!= col("prev")).count()
      labels = stepped.select("id", "label")
      converged = changed == 0L
      iter += 1
    }
    require(converged,
      s"neardupClusters: no fixpoint after $maxIters rounds — component " +
        "diameter exceeds the bound; raise maxIters or switch to star contraction")
    labels.select(col("id").as(idCol), col("label").as("keeper_id"))
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
    val cg = corpus.select(col(idCol).as("doc_id"),
      explode(Dedup.wordShingles(col(textCol), n)).as("g"))
    val pg = probe.select(col(idCol).as("probe_id"),
      explode(Dedup.wordShingles(col(textCol), n)).as("g")).distinct()
    cg.join(broadcast(pg), "g")
      .groupBy("doc_id")
      .agg(count_distinct(col("g")).as("n_matched_grams"),
        count_distinct(col("probe_id")).as("n_probe_docs"))
  }
}
