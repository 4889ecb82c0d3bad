package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the 60-bit SimHash fingerprint — the
  * per-row kernel of `Dedup.simhashDf`.
  *
  * Bit-identical to the aggregation pipeline it replaces (kept as
  * `Dedup.simhashDfAgg`, the equivalence reference — SimhashFpSpec):
  * tokens = `lower(text)` split on `\W+` minus empties (the exact
  * WordShingles tokenizer); per token occurrence the two 60-bit halves
  * are the numeric values of md5-hex chars 1–15 and 16–30
  * (`conv(substring(md5(t), …), 16, 10)`); per bit b ∈ [0,60) the vote
  * is +1 when bit b of the half (`lo` for b<30, `hi` for b≥30, shifted
  * by b mod 30) is set, else −1; fingerprint bit b = (vote sum > 0).
  * Zero-token docs vote nowhere and get fingerprint 0 — the aggregation
  * shape produced the same 0 via its left join + coalesce.
  *
  * Why (guide §2.3/§4): the aggregation shape exploded every token
  * occurrence into a shuffle row and ran a 60-buffer partial aggregate +
  * a join back to the corpus; this kernel does the identical arithmetic
  * in one fused loop inside whole-stage codegen — zero shuffle, zero
  * join, strictly less work at any scale.
  */
case class SimhashFp(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"simhash_fp requires a string input, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    SimhashFp.fingerprint(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimhashFp.fingerprint($c);")

  override protected def withNewChildInternal(newChild: Expression): SimhashFp =
    copy(child = newChild)

  override def prettyName: String = "simhash_fp"
}

object SimhashFp {

  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** The kernel — shared by interpreted eval and generated code. */
  def fingerprint(text: UTF8String): Long = {
    // same lowering as Spark's lower(), same tokenizer as WordShingles
    // (runs of [a-zA-Z0-9_] ≡ Java-regex \W+ split + empty filter)
    val s = text.toLowerCase.toString
    val votes = new Array[Int](60)
    val md = md5Local.get()
    val sb = new java.lang.StringBuilder(16)
    var i = 0
    val len = s.length
    while (i <= len) {
      val word = i < len && {
        val c = s.charAt(i)
        (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
          (c >= '0' && c <= '9') || c == '_'
      }
      if (word) sb.append(s.charAt(i))
      else if (sb.length > 0) {
        vote(md, sb.toString, votes)
        sb.setLength(0)
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 60) {
      if (votes(b) > 0) fp |= 1L << b
      b += 1
    }
    fp
  }

  /** Accumulate one token occurrence's ±1 votes. The two 60-bit halves
    * are md5-hex nibbles 0–14 and 15–29 folded base-16 — exactly
    * `conv(substring(md5(t), 1|16, 15), 16, 10)`; only bits 0–29 of each
    * half are consumed (the bitVote shifts of the aggregation shape).
    */
  private def vote(md: MessageDigest, token: String, votes: Array[Int]): Unit = {
    md.reset()
    val d = md.digest(token.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var lo = 0L
    var hi = 0L
    var n = 0
    while (n < 15) { // hex chars 0..14
      lo = lo * 16 + nibble(d, n)
      n += 1
    }
    while (n < 30) { // hex chars 15..29
      hi = hi * 16 + nibble(d, n)
      n += 1
    }
    var b = 0
    while (b < 30) {
      votes(b) += (if (((lo >> b) & 1L) == 1L) 1 else -1)
      votes(b + 30) += (if (((hi >> b) & 1L) == 1L) 1 else -1)
      b += 1
    }
  }

  /** Hex-char i of the digest's lowercase hex rendering, as its value. */
  private def nibble(d: Array[Byte], i: Int): Int = {
    val b = d(i >> 1) & 0xff
    if ((i & 1) == 0) b >> 4 else b & 0xf
  }

  /** Column-API entry point. */
  def simhashFp(c: Column): Column =
    ColumnBridge.column(SimhashFp(ColumnBridge.expression(c)))
}
