package graft

import graft.textops.Dedup
import org.apache.spark.sql.functions._

/** The custom codegen'd WordShingles kernel: bit-equivalence with the
  * interpreted HOF chain it replaces, on handcrafted edges and on the
  * real multilingual test corpus.
  */
class ShinglesSpec extends SparkSpec {

  private def compare(texts: Seq[String], n: Int): Unit = {
    import spark.implicits._
    val df = texts.toDF("text")
    val rows = df.select(
      Dedup.wordShingles(col("text"), n).as("fast"),
      Dedup.wordShinglesHof(col("text"), n).as("ref")).collect()
    rows.zip(texts).foreach { case (r, t) =>
      assert(r.getSeq[String](0) === r.getSeq[String](1),
        s"shingle mismatch for n=$n on: '$t'")
    }
  }

  test("equals the HOF chain on edge cases (empty, separators-only, short, dup shingles, unicode)") {
    val edges = Seq(
      "",                       // no tokens -> [""]
      "   \t ...!?",            // separators only -> [""]
      "one",                    // fewer tokens than n -> one short shingle
      "one two",                // still short
      "one two three",          // exactly n
      "a b c a b c a b c",      // duplicate shingles -> distinct, first-occurrence order
      "Mixed CASE and_underscores 123 numbers",
      "tabs\tand\nnewlines  double  spaces",
      "punct,separated;tokens:here!",
      "über den Wölfen — naïve café",   // non-ASCII letters are \W separators
      "中文没有空格所以整段是分隔符 but ascii words remain",
      "trailing separators end here...  ")
    compare(edges, 3)
    compare(edges, 1)
    compare(edges, 4)
    compare(edges, 7)
  }

  test("equals the HOF chain on the full sf0.001 documents corpus, n=3 and n=4") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for (n <- Seq(3, 4)) {
      val bad = docs.select(
        Dedup.wordShingles(col("text"), n).as("fast"),
        Dedup.wordShinglesHof(col("text"), n).as("ref"))
        .filter(col("fast") =!= col("ref")).count()
      assert(bad === 0L, s"corpus mismatch rows at n=$n")
    }
  }

  test("participates in whole-stage codegen off a parquet scan") {
    import spark.implicits._
    val dir = tmpDir("shingles")
    Seq.tabulate(16)(i => s"some text number $i with words").toDF("text")
      .write.mode("overwrite").parquet(dir)
    val plan = spark.read.parquet(dir)
      .select(Dedup.wordShingles(col("text"), 3))
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("word_shingles") && l.trim.startsWith("*(")),
      s"word_shingles must be inside a WholeStageCodegen stage:\n$plan")
  }
}
