package graft

import graft.functions.RollingHash
import graft.textops.TextAnalysis
import org.apache.spark.sql.functions._

/** The custom codegen'd RollingHash expression: bit-equivalence with the
  * interpreted HOF fold it replaces, null/empty semantics, and actual
  * whole-stage-codegen participation.
  */
class RollingHashSpec extends SparkSpec {

  test("equals the HOF reference fold on multilingual text (incl. CJK), empty, and null") {
    import spark.implicits._
    val df = Seq(
      Some("the quick brown fox"),
      Some("über den Wölfen — naïve café"),
      Some("编程语言的数据管道"), // BMP CJK: char == code point
      Some("mixed 中文 and english 123 !@#"),
      Some(""),
      None).toDF("text")
    val both = df.select(
      TextAnalysis.rollingFingerprint(col("text")).as("fast"),
      TextAnalysis.rollingFingerprintHof(col("text")).as("ref")).collect()
    both.foreach { r =>
      assert(r.isNullAt(0) === r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getLong(0) === r.getLong(1), s"mismatch: $r")
    }
    // empty string hashes to the fold seed, null stays null
    val e = df.filter(col("text") === "").select(
      TextAnalysis.rollingFingerprint(col("text"))).head()
    assert(e.getLong(0) === 0L)
  }

  test("interpreted eval and generated code agree; expression runs inside WholeStageCodegen") {
    import spark.implicits._
    // via parquet: a local Seq relation is folded into a LocalTableScan
    // (interpreted eval at plan time), which would bypass codegen
    val dir = tmpDir("rhash")
    Seq.tabulate(64)(i => s"doc $i " + ("abc" * (i % 7))).toDF("text")
      .write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    val viaDf = df.select(TextAnalysis.rollingFingerprint(col("text")))
      .collect().map(_.getLong(0))
    val direct = df.collect().map(r => RollingHash.hash(r.getString(0)))
    assert(viaDf.sorted sameElements direct.sorted)
    val plan = df.select(TextAnalysis.rollingFingerprint(col("text")))
      .queryExecution.executedPlan.toString
    // the `*(n)` prefix marks operators fused into a WholeStageCodegen
    // stage in the simple plan string
    assert(plan.linesIterator.exists(l =>
      l.contains("rolling_hash") && l.trim.startsWith("*(")),
      s"rolling_hash must participate in whole-stage codegen:\n$plan")
  }

  test("surrogate pairs count once, as the code point (oracle semantics)") {
    // U+1D11E MUSICAL SYMBOL G CLEF: two UTF-16 chars, one code point
    val clef = new String(Character.toChars(0x1D11E))
    assert(RollingHash.hash(clef) === 0x1D11E.toLong % 1000000007L)
    assert(RollingHash.hash("a" + clef) === ((97L * 31 + 0x1D11E) % 1000000007L))
  }
}
