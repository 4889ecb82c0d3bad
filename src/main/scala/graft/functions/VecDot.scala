package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for the double-precision dot product of two
  * numeric array columns — the kernel under every cosine in the
  * similarity suite (brute-force / LSH / IVF top-k, embedding near-dups).
  *
  * Exactly equivalent to
  * `aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)), 0.0, +)`:
  * the sum runs left-to-right in IEEE double (bit-identical result), and
  * the HOF's null algebra is preserved — unequal lengths (zip_with pads
  * with null) or any null element poison the sum to NULL.
  *
  * Why: Catalyst interprets higher-order functions per element, so the
  * chain above costs two lambda interpreter walks per dimension plus an
  * intermediate zipped array per row-pair. This is one fused
  * multiply-add loop over the raw `ArrayData` inside whole-stage codegen.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vec_dot requires array<float|double> inputs, got " +
          s"${left.dataType} and ${right.dataType}")

  private def leftIsFloat = left.dataType
    .asInstanceOf[ArrayType].elementType == FloatType
  private def rightIsFloat = right.dataType
    .asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecDot.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      leftIsFloat, rightIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Double r = graft.functions.VecDot.dot(
         |  $a, $b, $leftIsFloat, $rightIsFloat);
         |if (r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = r.doubleValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_dot"
}

object VecDot {

  /** The kernel — shared by interpreted eval and generated code. Returns
    * null (boxed) exactly when the HOF chain would: unequal lengths or
    * any null element in the zipped range.
    */
  def dot(a: ArrayData, b: ArrayData,
      aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  /** Column-API entry point. */
  def vecDot(a: Column, b: Column): Column =
    ColumnBridge.column(
      VecDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
