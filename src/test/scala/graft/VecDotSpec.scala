package graft

import graft.simops.Similarity
import org.apache.spark.sql.functions._

/** The custom codegen'd VecDot kernel: bit-equivalence (incl. null
  * algebra) with the interpreted zip_with+aggregate chain it replaces,
  * on handcrafted edges and the real embeddings corpus.
  */
class VecDotSpec extends SparkSpec {

  test("equals the HOF chain bit-for-bit on the embeddings corpus (self and cross products)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val pairs = emb.select(col("vec_id").as("ia"), col("embedding").as("va"))
      .join(emb.select(col("vec_id").as("ib"), col("embedding").as("vb")),
        col("ia") % 17 === col("ib") % 17) // a deterministic sample of cross pairs
    val bad = pairs.select(
      Similarity.dot(col("va"), col("vb")).as("fast"),
      Similarity.dotHof(col("va"), col("vb")).as("ref"))
      // bit-level compare: NaN-safe, distinguishes nothing the plans don't
      .filter(!(col("fast") <=> col("ref"))).count()
    assert(bad === 0L)
  }

  test("null algebra matches zip_with padding: unequal lengths and null elements poison to NULL") {
    import spark.implicits._
    val df = Seq(
      (Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f)),   // 32.0
      (Seq.empty[Float], Seq.empty[Float])                // empty -> seed 0.0
    ).toDF("a", "b")
    val out = df.select(
      Similarity.dot(col("a"), col("b")).as("fast"),
      Similarity.dotHof(col("a"), col("b")).as("ref")).collect()
    out.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
    assert(out(0).getDouble(0) === 32.0)
    assert(out(1).getDouble(0) === 0.0)

    // unequal lengths: HOF zip_with pads with null -> sum poisons to null
    val uneq = Seq((Seq(1.0f, 2.0f), Seq(1.0f))).toDF("a", "b")
      .select(Similarity.dot(col("a"), col("b")).as("fast"),
        Similarity.dotHof(col("a"), col("b")).as("ref")).head()
    assert(uneq.isNullAt(0) && uneq.isNullAt(1))

    // null element anywhere -> null, same as the HOF
    val withNull = Seq((Seq[java.lang.Float](1.0f, null, 3.0f),
      Seq[java.lang.Float](1.0f, 1.0f, 1.0f))).toDF("a", "b")
      .select(Similarity.dot(col("a"), col("b")).as("fast"),
        Similarity.dotHof(col("a"), col("b")).as("ref")).head()
    assert(withNull.isNullAt(0) && withNull.isNullAt(1))
  }

  test("participates in whole-stage codegen off a parquet scan") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val plan = emb.select(
      Similarity.dot(col("embedding"), col("embedding")))
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("vec_dot") && l.trim.startsWith("*(")),
      s"vec_dot must be inside a WholeStageCodegen stage:\n$plan")
  }

  test("lsh_signature equals the HOF chain on the corpus and its null/empty corners") {
    import spark.implicits._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    for (nPlanes <- Seq(6, 8, 12)) {
      val bad = emb.select(
        Similarity.lshSignature(col("embedding"), nPlanes).as("fast"),
        Similarity.lshSignatureHof(col("embedding"), nPlanes).as("ref"))
        .filter(col("fast") =!= col("ref")).count()
      assert(bad === 0L, s"signature mismatch at nPlanes=$nPlanes")
    }
    // HOF null algebra: null vec, null element, AND empty vec all give
    // signature 0 (the empty case because sequence(0,-1) = [0,-1] pads
    // the zip with nulls) — never NULL
    val edges = Seq(
      (1L, null.asInstanceOf[Seq[java.lang.Float]]),
      (2L, Seq[java.lang.Float](1.0f, null, 2.0f)),
      (3L, Seq.empty[java.lang.Float])).toDF("id", "v")
    val out = edges.select(col("id"),
      Similarity.lshSignature(col("v"), 8).as("fast"),
      Similarity.lshSignatureHof(col("v"), 8).as("ref"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) === ((0L, 0L)))
    assert(out(2L) === ((0L, 0L)))
    assert(out(3L) === ((0L, 0L)))
  }
}
