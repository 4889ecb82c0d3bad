package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Quantized vector-sum aggregate for the k-means centroid update:
  * `quant_vec_sum(vec)` → `struct<sums: array<bigint>, n: bigint>` where
  * `sums(d) = Σ floor(vec(d)·2^20)` (exact i64, order-insensitive) and
  * `n` = number of aggregated vectors.
  *
  * Replaces the `posexplode(dims) → groupBy(cid, d) → groupBy(cid)`
  * two-aggregation shape with ONE grouping on the cell id: the shuffle
  * carries nCells packed rows instead of nCells × dim scalar rows, and
  * the dim explosion never materializes. Arithmetic is exactly the
  * replaced shape's: element d of a non-null vector contributes
  * `floor(x.toDouble * 2^20)` (the IEEE double multiply Spark's
  * `floor(x cast double * 1048576.0)` performs) to `sums(d)`; a NULL
  * element is skipped (SQL sum semantics) while the row still counts
  * toward `n` (the per-dim `count(*)` counted exploded rows regardless
  * of null elements); a NULL vector contributes nothing. Mixed vector
  * widths fail loudly — a quantizer over ragged vectors is undefined.
  */
case class QuantVecSum(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantVecSum.Buf] with UnaryLike[Expression] {

  override def dataType: DataType = StructType(Seq(
    StructField("sums", ArrayType(LongType, containsNull = false),
      nullable = false),
    StructField("n", LongType, nullable = false)))
  override def nullable: Boolean = false

  private def isFloat = child.dataType
    .asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"quant_vec_sum requires array<float|double>, got $dt")
    }

  override def createAggregationBuffer(): QuantVecSum.Buf =
    new QuantVecSum.Buf(null, 0L)

  override def update(buf: QuantVecSum.Buf, input: InternalRow): QuantVecSum.Buf = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val dim = arr.numElements()
    if (buf.sums == null) buf.sums = new Array[Long](dim)
    else require(buf.sums.length == dim,
      s"quant_vec_sum: mixed vector widths ${buf.sums.length} vs $dim")
    var d = 0
    while (d < dim) {
      if (!arr.isNullAt(d)) {
        val x = if (isFloat) arr.getFloat(d).toDouble else arr.getDouble(d)
        buf.sums(d) += math.floor(x * QuantVecSum.Scale).toLong
      }
      d += 1
    }
    buf.n += 1L
    buf
  }

  override def merge(buf: QuantVecSum.Buf, other: QuantVecSum.Buf): QuantVecSum.Buf = {
    if (other.sums == null) return buf
    if (buf.sums == null) { buf.sums = other.sums; buf.n = other.n; return buf }
    require(buf.sums.length == other.sums.length,
      s"quant_vec_sum: mixed vector widths ${buf.sums.length} vs ${other.sums.length}")
    var d = 0
    while (d < buf.sums.length) { buf.sums(d) += other.sums(d); d += 1 }
    buf.n += other.n
    buf
  }

  override def eval(buf: QuantVecSum.Buf): Any = {
    val sums = if (buf.sums == null) Array.empty[Long] else buf.sums
    new GenericInternalRow(Array[Any](new GenericArrayData(sums), buf.n))
  }

  override def serialize(buf: QuantVecSum.Buf): Array[Byte] = {
    val dim = if (buf.sums == null) -1 else buf.sums.length
    val bb = java.nio.ByteBuffer.allocate(8 + 4 + math.max(dim, 0) * 8)
    bb.putLong(buf.n).putInt(dim)
    if (dim > 0) buf.sums.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): QuantVecSum.Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getLong
    val dim = bb.getInt
    val sums = if (dim < 0) null else Array.fill(dim)(bb.getLong)
    new QuantVecSum.Buf(sums, n)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantVecSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantVecSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): QuantVecSum =
    copy(child = newChild)

  override def prettyName: String = "quant_vec_sum"
}

object QuantVecSum {

  /** 2^20 — the centroid quantization scale (`Similarity.KmeansQuantScale`). */
  val Scale: Double = 1048576.0

  final class Buf(var sums: Array[Long], var n: Long)

  /** Column-API entry point. */
  def quantVecSum(vec: Column): Column =
    ColumnBridge.column(
      QuantVecSum(ColumnBridge.expression(vec)).toAggregateExpression())
}
