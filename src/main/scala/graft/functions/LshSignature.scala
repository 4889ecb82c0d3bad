package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native Catalyst expression for the `nPlanes`-bit random-hyperplane
  * LSH signature: bit p = sign of the vector's projection onto the
  * seeded quadratic-congruential pseudo-random plane p (see
  * `Similarity.planeComponent` — all-i64 arithmetic mod 2^31 plus one
  * exact double division, so the buckets stay bit-reproducible in ANSI
  * SQL and oracle-checkable).
  *
  * Exactly equivalent to the HOF formulation (`Similarity
  * .lshSignatureHof`), including its null algebra: the when/otherwise
  * chain maps a NULL projection (null vector, or any null element) to
  * bit 0 on every plane, so the signature is 0, never NULL — this
  * expression is therefore non-nullable and must NOT use the default
  * null-in-null-out path.
  *
  * Why: the chain evaluates an interpreted lambda per (plane × dim) and
  * materializes a zipped array per plane; this kernel is one fused loop
  * inside whole-stage codegen.
  */
case class LshSignature(child: Expression, nPlanes: Int)
    extends UnaryExpression {

  require(nPlanes >= 1 && nPlanes <= 62, s"nPlanes $nPlanes not in [1,62]")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"lsh_signature requires an array<float|double> input, got $dt")
    }

  private def isFloat = child.dataType
    .asInstanceOf[ArrayType].elementType == FloatType

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L
    else LshSignature.signature(v.asInstanceOf[ArrayData], nPlanes, isFloat)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${childGen.code}
        long ${ev.value} = ${childGen.isNull} ? 0L :
          graft.functions.LshSignature.signature(
            ${childGen.value}, $nPlanes, $isFloat);
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): LshSignature =
    copy(child = newChild)

  override def prettyName: String = "lsh_signature"
}

object LshSignature {

  private val M31 = 2147483648L // 2^31

  /** The kernel. A null element anywhere → every plane's projection is
    * NULL in the HOF algebra → all bits 0 → signature 0. An EMPTY vector
    * is also 0: the HOF's index array is `sequence(0, size-1)` =
    * `sequence(0, -1)` = the descending `[0, -1]`, so zip_with pads the
    * empty vector with nulls and the projection poisons to NULL like the
    * null-element case — both corners preserved exactly.
    */
  def signature(v: ArrayData, nPlanes: Int, isFloat: Boolean): Long = {
    val n = v.numElements()
    if (n == 0) return 0L
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return 0L
      i += 1
    }
    var sig = 0L
    var p = 0
    while (p < nPlanes) {
      var acc = 0.0
      var j = 0
      while (j < n) {
        val idx = p.toLong * 8191L + j.toLong + 1L
        val u1 = (1103515245L * idx + 12345L) % M31
        val u2 = (u1 * u1 + 1013904223L) % M31
        val comp = u2.toDouble / M31.toDouble - 0.5
        val x = if (isFloat) v.getFloat(j).toDouble else v.getDouble(j)
        acc += x * comp
        j += 1
      }
      if (acc >= 0) sig |= 1L << p
      p += 1
    }
    sig
  }

  /** Column-API entry point. */
  def lshSignature(vec: Column, nPlanes: Int): Column =
    ColumnBridge.column(LshSignature(ColumnBridge.expression(vec), nPlanes))
}
