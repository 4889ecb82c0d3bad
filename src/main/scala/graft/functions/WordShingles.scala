package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for distinct word n-gram shingles — the
  * per-row kernel of MinHash/LSH, n-gram-Jaccard, and contamination
  * analysis.
  *
  * Exactly equivalent to the expression chain
  * `array_distinct(transform(sequence(0, greatest(size(toks)-n, 0)),
  * i -> concat_ws(" ", slice(toks, i+1, n))))` with
  * `toks = filter(split(lower(text), "\\W+"), _ =!= "")`, including the
  * corner where a doc with fewer than n tokens yields ONE short shingle
  * (the empty string for token-less docs). Equivalence is guaranteed by
  * construction where it is subtle — lowering calls the same
  * `UTF8String.toLowerCase` Spark's `lower()` uses, and tokenization
  * scans for runs of `[a-zA-Z0-9_]`, exactly Java regex `\W+` splitting
  * (no `UNICODE_CHARACTER_CLASS`) — and pinned by `ShinglesSpec` against
  * the retained HOF formulation on multilingual text.
  *
  * Why: Catalyst interprets every higher-order-function element — the
  * chain above walks an interpreter for each of the ~tokens × n lambda
  * evaluations per row and allocates the intermediate token and index
  * arrays. This kernel is one JVM loop inside whole-stage codegen
  * (`doGenCode`). Measured: the sf0.1 shingle+explode pass drops ~7×,
  * which feeds the two slowest registered queries (ngram_jaccard,
  * minhash_neardups) plus contamination and near-dup clustering.
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"word_shingles requires a string input, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    WordShingles.shingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordShingles.shingles($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)

  override def prettyName: String = "word_shingles"
}

object WordShingles {

  /** The kernel — shared by interpreted eval and generated code. */
  def shingles(text: UTF8String, n: Int): ArrayData = {
    // same lowering as Spark's lower()
    val s = text.toLowerCase.toString
    // tokenize: runs of [a-zA-Z0-9_] ≡ Java-regex \W+ split + empty filter
    val toks = new java.util.ArrayList[String](32)
    val sb = new java.lang.StringBuilder(16)
    var i = 0
    val len = s.length
    while (i < len) {
      val c = s.charAt(i)
      val word = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9') || c == '_'
      if (word) sb.append(c)
      else if (sb.length > 0) { toks.add(sb.toString); sb.setLength(0) }
      i += 1
    }
    if (sb.length > 0) toks.add(sb.toString)

    // shingles for i in 0..max(T-n, 0); short/empty docs yield one
    // (short or empty) shingle — the HOF corner preserved on purpose
    val t = toks.size
    val out = new java.util.LinkedHashSet[UTF8String]
    val hi = math.max(t - n, 0)
    var start = 0
    while (start <= hi) {
      val end = math.min(start + n, t)
      val b = new java.lang.StringBuilder(16 * n)
      var j = start
      while (j < end) {
        if (j > start) b.append(' ')
        b.append(toks.get(j))
        j += 1
      }
      out.add(UTF8String.fromString(b.toString))
      start += 1
    }
    new GenericArrayData(out.toArray(Array.empty[AnyRef]))
  }

  /** Column-API entry point. */
  def wordShingles(c: Column, n: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(c), n))
}
