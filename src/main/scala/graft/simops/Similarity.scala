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
    * a quadratic congruential generator mapped to [-0.5, 0.5). Seeded —
    * same planes on every run and every executor, no RNG state shipped.
    * Pure i64 arithmetic mod 2^31 (products stay < 2^62, exact under ANSI)
    * followed by an exact division by 2^31, so any ANSI SQL engine
    * reproduces the planes bit-for-bit — which makes the LSH bucketing
    * itself oracle-checkable cross-engine (unlike a xxhash64 seed).
    */
  private val M31 = 2147483648L // 2^31
  private def planeComponent(plane: Int, dim: Column): Column = {
    val idx = lit(plane.toLong * 8191L) + dim.cast("long") + 1L
    val u1 = pmod(lit(1103515245L) * idx + 12345L, lit(M31))
    val u2 = pmod(u1 * u1 + 1013904223L, lit(M31))
    (u2.cast("double") / M31.toDouble) - 0.5
  }

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
    * buckets; candidates = same-bucket pairs, plus multi-probe — each
    * query also probes every bucket within Hamming distance
    * `probeRadius` of its own (flip 1 bit, then 2 bits, ...), the
    * standard recall-vs-cost dial; exact cosine + top-k within
    * candidates. A corpus row lives in exactly one bucket, so probes
    * never duplicate candidates. Recall < 1 by construction (checked by
    * `knn_lsh_recall` against brute force); cost ∝ probed bucket sizes,
    * not corpus².
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nPlanes: Int = 12,
      probeRadius: Int = 1): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
      .withColumn("bucket", lshSignature(col("__cv"), nPlanes))
    val probes = probeBuckets(col("bucket0"), nPlanes, probeRadius)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
      .withColumn("bucket0", lshSignature(col("__qv"), nPlanes))
      .withColumn("bucket", explode(probes))
      .drop("bucket0")
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("__cv"), col("__qv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cos")
  }

  /** All buckets within Hamming distance ≤ `radius` of `bucket` (incl.
    * itself), as an array column. radius ≤ 2 supported — beyond that the
    * probe count grows combinatorially and a coarser `nPlanes` is the
    * better dial.
    */
  private def probeBuckets(bucket: Column, nPlanes: Int, radius: Int): Column = {
    require(radius >= 0 && radius <= 2, s"probeRadius $radius not in [0,2]")
    val r0 = Seq(bucket)
    val r1 = if (radius >= 1)
      (0 until nPlanes).map(p => bucket.bitwiseXOR(lit(1L << p))) else Nil
    val r2 = if (radius >= 2)
      (for (p <- 0 until nPlanes; r <- p + 1 until nPlanes)
        yield bucket.bitwiseXOR(lit((1L << p) | (1L << r)))) else Nil
    array((r0 ++ r1 ++ r2): _*)
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
