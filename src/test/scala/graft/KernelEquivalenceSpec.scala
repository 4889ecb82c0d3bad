package graft

import graft.textops.Dedup
import org.apache.spark.sql.functions._

/** Equivalence proofs for the r6 per-row codegen kernels against the
  * aggregation/join formulations they replaced: identical results is the
  * contract that keeps every oracle row green while the shuffles
  * disappear.
  */
class KernelEquivalenceSpec extends SparkSpec {

  private val edgeTexts = Seq(
    "",                        // zero tokens -> fingerprint 0
    "   \t ...!?",             // separators only
    "one",
    "a b c a b c a b c",       // repeated tokens: occurrence votes, not distinct
    "Mixed CASE and_underscores 123 numbers",
    "über den Wölfen — naïve café",
    "中文没有空格所以整段是分隔符 but ascii words remain",
    "the quick brown fox jumps over the lazy dog",
    "trailing separators end here...  ")

  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  test("SimhashFp kernel == aggregation pipeline (edges + real corpus)") {
    import spark.implicits._
    val edge = edgeTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    Seq(edge, docs.select("doc_id", "text")).foreach { df =>
      val fast = Dedup.simhashDf(df, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val ref = Dedup.simhashDfAgg(df, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(fast === ref)
    }
  }

  test("MinhashBands kernel == explode + 64-min aggregate + xxhash64 banding") {
    val sh = docs.select(col("doc_id").as("__id"),
      Dedup.wordShingles(col("text"), 3).as("__sh"))
    for ((bands, rows) <- Seq((16, 4), (8, 2))) {
      val fast = sh.select(col("__id").as("id"),
          posexplode(graft.functions.MinhashBands
            .minhashBands(col("__sh"), bands, rows)))
        .toDF("id", "band", "bucket")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      val ref = Dedup.minhashBandedAgg(sh, bands, rows)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      assert(fast === ref, s"bands=$bands rows=$rows")
    }
  }

  test("PostingPairs kernel == postings self-join pair multiset") {
    val posts = docs.select(col("doc_id").as("id"),
        explode(Dedup.wordShingles(col("text"), 3)).as("g"))
      .withColumn("sz", lit(0) + length(col("g")) % 7) // arbitrary int payload
    val viaKernel = posts.groupBy("g")
      .agg(collect_list(struct(col("id"), col("sz"))).as("ps"))
      .select(explode(graft.functions.PostingPairs.postingPairs(col("ps"))).as("p"))
      .select(col("p.id_a"), col("p.id_b"), col("p.sz_a"), col("p.sz_b"))
      .groupBy("id_a", "id_b", "sz_a", "sz_b").count()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3),
        r.getLong(4))).toSet
    val l = posts.select(col("g"), col("id").as("id_a"), col("sz").as("sz_a"))
    val r = posts.select(col("g"), col("id").as("id_b"), col("sz").as("sz_b"))
    val viaJoin = l.join(r, Seq("g"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b", "sz_a", "sz_b").count()
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getInt(2), x.getInt(3),
        x.getLong(4))).toSet
    assert(viaKernel === viaJoin)
  }

  test("ngramJaccardPairs end-to-end result unchanged by the kernel rewrite") {
    // the operator's own output on the real corpus, against the
    // straight declarative join + filter formulation
    val out = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        n = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sh = docs.select(col("doc_id").as("id"),
        Dedup.wordShingles(col("text"), 3).as("sh"))
      .withColumn("sz", size(col("sh")))
    val posts = sh.select(col("id"), col("sz"), explode(col("sh")).as("g"))
    val heavy = posts.groupBy("g").agg(count(lit(1)).as("df"))
      .filter(col("df") > 1000).select("g")
    val filtered = posts.join(heavy, Seq("g"), "left_anti")
    val l = filtered.select(col("g"), col("id").as("id_a"), col("sz").as("sz_a"))
    val r = filtered.select(col("g"), col("id").as("id_b"), col("sz").as("sz_b"))
    val ref = l.join(r, Seq("g"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b", "sz_a", "sz_b")
      .agg(count(lit(1)).as("inter"))
      .filter(col("inter").cast("double") /
        (col("sz_a") + col("sz_b") - col("inter")).cast("double") >= 0.5)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(out === ref)
  }
}
