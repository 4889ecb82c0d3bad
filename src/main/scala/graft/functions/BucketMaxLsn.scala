package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, MapType}

/** Per-bucket max-LSN aggregate: `bucket_max_lsn(bucket, lsn, nBuckets)`
  * → `map<int, bigint>` of the highest `lsn` seen per bucket id.
  *
  * This is how the lake commit gets its per-partition lineage watermarks
  * WITHOUT a second job or driver-side parquet footer reads: the
  * aggregate rides the delta write's `observe()` side-channel, so the
  * executors compute each bucket's watermark WHILE writing the bucket's
  * delta file, and the driver receives a ≤`nBuckets`-entry map with the
  * write job's result — commit metadata work proportional to touched
  * buckets, not table files (the manifest-layer analog of Iceberg
  * writers reporting column stats back through the commit).
  *
  * State is a flat `Array[Long]` of size `nBuckets` (thousands at
  * cluster scale — KBs), merged element-wise max; buckets never touched
  * stay at `Long.MinValue` and are absent from the result map.
  */
case class BucketMaxLsn(
    left: Expression,
    right: Expression,
    nBuckets: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with BinaryLike[Expression] {

  require(nBuckets > 0, s"bucket_max_lsn: nBuckets must be positive, got $nBuckets")

  private def bucket: Expression = left
  private def lsn: Expression = right

  override def dataType: DataType =
    MapType(IntegerType, LongType, valueContainsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(nBuckets)(Long.MinValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val b = bucket.eval(input)
    val l = lsn.eval(input)
    if (b != null && l != null) {
      val idx = b match {
        case i: java.lang.Integer => i.intValue()
        case j: java.lang.Long => j.intValue()
        case other => other.toString.toInt
      }
      require(idx >= 0 && idx < nBuckets,
        s"bucket_max_lsn: bucket $idx outside [0, $nBuckets)")
      val v = l.asInstanceOf[Long]
      if (v > buf(idx)) buf(idx) = v
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < nBuckets) {
      if (other(i) > buf(i)) buf(i) = other(i)
      i += 1
    }
    buf
  }

  override def eval(buf: Array[Long]): Any = {
    val touched = (0 until nBuckets).filter(buf(_) != Long.MinValue)
    ArrayBasedMapData(touched.toArray, touched.map(buf(_)).toArray)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * nBuckets)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(nBuckets)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BucketMaxLsn =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BucketMaxLsn =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BucketMaxLsn =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "bucket_max_lsn"
}

object BucketMaxLsn {
  /** Column-API entry point (an aggregate column, usable in `observe`). */
  def bucketMaxLsn(bucket: Column, lsn: Column, nBuckets: Int): Column =
    ColumnBridge.column(
      BucketMaxLsn(ColumnBridge.expression(bucket),
        ColumnBridge.expression(lsn), nBuckets).toAggregateExpression())
}
