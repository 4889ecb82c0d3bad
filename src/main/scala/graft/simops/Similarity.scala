package graft.simops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Baseline: brute-force cosine top-k — a broadcast of the (small) query
  * set against a distributed scan of the corpus; exact, O(corpus) per
  * query batch, the right shape when queries ≪ corpus.
  *
  * Scale path: random-hyperplane LSH (signed projections against seeded
  * pseudo-random planes) buckets the corpus once; a query probes only its
  * bucket (+ optional multi-probe). Bucketing is a single shuffle;
  * per-query cost drops from O(corpus) to O(bucket).
  *
  * Dot products use `zip_with` + `aggregate` — codegen'd expressions, no
  * UDF. Computation in double precision.
  */
object Similarity {

  /** Dot product of two array<float|double> columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Exact brute-force top-k cosine neighbors for each query row.
    * `queries` is expected to be small (broadcast side); ranking ties are
    * broken by corpus id for determinism.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
    val scored = c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("__cv"), col("__qv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cos")
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * a fixed hash mapped to [-1, 1]. Seeded — same planes on every run
    * and every executor, no RNG state shipped.
    */
  private def planeComponent(plane: Int, dim: Column): Column =
    (pmod(xxhash64(lit(plane), dim), lit(2000001L)).cast("double")
      / 1000000.0) - 1.0

  /** `nPlanes`-bit random-hyperplane signature of a vector: bit p = sign
    * of the projection onto plane p.
    */
  def lshSignature(vec: Column, nPlanes: Int): Column =
    (0 until nPlanes).map { p =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (v, i) => v.cast("double") * planeComponent(p, i)),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** ANN via LSH buckets: corpus and queries hashed to `nPlanes`-bit
    * buckets; candidates = same-bucket pairs; exact cosine + top-k within
    * candidates. Recall < 1 by construction (reported by the caller
    * comparing against brute force); cost ∝ bucket sizes, not corpus².
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nPlanes: Int = 12): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
      .withColumn("bucket", lshSignature(col("__cv"), nPlanes))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
      .withColumn("bucket", lshSignature(col("__qv"), nPlanes))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("__cv"), col("__qv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cos")
  }

  /** Embedding-cosine near-duplicate pairs over one corpus: LSH-bucket
    * self-join, cosine ≥ threshold. The near-dup analog of MinHash for
    * dense vectors.
    */
  def cosineNearDups(corpus: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, nPlanes: Int = 10): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("__v"))
      .withColumn("bucket", lshSignature(col("__v"), nPlanes))
    val l = c.toDF("id_a", "va", "bucket")
    val r = c.toDF("id_b", "vb", "bucket")
    l.join(r, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", cosine(col("va"), col("vb")))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }
}
