package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expression for inverted-index pair generation: one
  * posting list `array<struct<id bigint, sz int>>` in, all ordered
  * document pairs `array<struct<id_a, id_b, sz_a, sz_b>>` out
  * (`id_a < id_b`; ids sorted ascending first, so the output is
  * deterministic regardless of `collect_list` order).
  *
  * This turns the postings SELF-JOIN of `Dedup.ngramJaccardPairs` into
  * `groupBy(gram).agg(collect_list(...))` + one per-gram kernel call +
  * `explode`: the postings cross the network ONCE (one exchange on the
  * gram) instead of twice (both sides of a shuffle join), and the
  * sort-merge machinery disappears (guide §2.3/§2.4). The pair multiset
  * is identical to the join's `a.g = b.g AND a.id < b.id` output, so
  * every downstream count is unchanged.
  *
  * Memory is bounded by construction: callers apply the document-
  * frequency cap BEFORE grouping, so a posting list holds ≤ maxDocFreq
  * entries and the output ≤ C(maxDocFreq, 2) pairs — the same bound the
  * join shape relied on to avoid a quadratic stop-gram blowup.
  */
case class PostingPairs(child: Expression) extends UnaryExpression {

  private val elemType = StructType(Seq(
    StructField("id", LongType), StructField("sz", IntegerType)))

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id_a", LongType, nullable = false),
    StructField("id_b", LongType, nullable = false),
    StructField("sz_a", IntegerType, nullable = false),
    StructField("sz_b", IntegerType, nullable = false))), containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(s: StructType, _)
          if s.length == 2 && s(0).dataType == LongType &&
            s(1).dataType == IntegerType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"posting_pairs requires array<struct<bigint,int>>, got $dt")
    }

  override protected def nullSafeEval(input: Any): Any =
    PostingPairs.pairs(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
         |  graft.functions.PostingPairs.pairs($c);""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): PostingPairs =
    copy(child = newChild)

  override def prettyName: String = "posting_pairs"
}

object PostingPairs {

  /** The kernel — shared by interpreted eval and generated code. */
  def pairs(ps: ArrayData): ArrayData = {
    val n = ps.numElements()
    val ids = new Array[Long](n)
    val szs = new Array[Int](n)
    var i = 0
    while (i < n) {
      val r = ps.getStruct(i, 2)
      ids(i) = r.getLong(0)
      szs(i) = r.getInt(1)
      i += 1
    }
    // sort postings by id (insertion sort on the permutation — lists are
    // df-capped and usually short)
    var a = 1
    while (a < n) {
      val id = ids(a); val sz = szs(a)
      var b = a - 1
      while (b >= 0 && ids(b) > id) {
        ids(b + 1) = ids(b); szs(b + 1) = szs(b); b -= 1
      }
      ids(b + 1) = id; szs(b + 1) = sz
      a += 1
    }
    val out = new java.util.ArrayList[AnyRef](n * (n - 1) / 2 max 0)
    var x = 0
    while (x < n) {
      var y = x + 1
      while (y < n) {
        if (ids(x) != ids(y)) { // the join's a.id < b.id excludes equal ids
          val row = new GenericInternalRow(4)
          row.setLong(0, ids(x)); row.setLong(1, ids(y))
          row.setInt(2, szs(x)); row.setInt(3, szs(y))
          out.add(row)
        }
        y += 1
      }
      x += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Column-API entry point. */
  def postingPairs(postings: Column): Column =
    ColumnBridge.column(PostingPairs(ColumnBridge.expression(postings)))
}
