package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expression assigning a vector to its nearest centroid
  * by cosine (ties broken by lowest centroid id) — the IVF coarse
  * quantizer's corpus-side assignment at LARGE cell counts.
  *
  * The centroid matrix rides in a Spark `Broadcast` instead of being
  * inlined into the plan: the literal-inlining shape
  * (`Similarity.ivfAssignInline`) embeds `nCells × dim` double literals
  * in ONE projection — perfect codegen at the ≤256-cell dial, but at
  * `autoCells`' 65,536-cell clamp with 768-dim vectors that is ~50M
  * literals, blowing plan serialization and codegen long before any data
  * cost matters. Here the plan carries one expression node holding a
  * broadcast handle; executors fetch the matrix once and the per-row
  * argmax runs as a tight JVM loop (still inside whole-stage codegen —
  * the generated code makes one call into [[NearestCentroid.nearest]]).
  *
  * Arithmetic is BIT-IDENTICAL to the inline path (equivalence-tested at
  * the 256-cell boundary and at 4096 cells, IvfAssignSpec): per row,
  * `cos_c = vecdot(v, c) / (norm(v) * norm(c))` with the same
  * left-to-right IEEE-double folds as [[VecDot]], Spark SQL's double
  * comparison semantics (`NaN` equal to itself and greater than
  * everything; `-0.0 == 0.0`), and the same degenerate-input results
  * (null element / dimension mismatch ⇒ first centroid id, exactly what
  * the inline fold's null-poisoned comparisons produce). One deliberate
  * divergence: a ZERO-NORM vector yields NaN cosines here (NaN ranks
  * first ⇒ lowest centroid id), whereas the inline path's `0/0` division
  * RAISES under ANSI mode (the Spark 4 default) — the kernel prefers
  * assigning degenerate vectors deterministically over failing the scan.
  */
case class NearestCentroid(
    child: Expression,
    bc: Broadcast[NearestCentroid.Index])
  extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"nearest_centroid requires an array<float|double> input, got $other")
  }

  private def childIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(v: Any): Any =
    NearestCentroid.nearest(v.asInstanceOf[ArrayData], bc.value, childIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // reference the BROADCAST (a tiny stub in the task binary), not the
    // materialized matrix — executors resolve .value() from their local
    // broadcast block once
    val bcRef = ctx.addReferenceObj("nearestCentroidBc", bc,
      classOf[Broadcast[NearestCentroid.Index]].getName)
    nullSafeCodeGen(ctx, ev, v => {
      s"""
         |${ev.value} = graft.functions.NearestCentroid.nearest(
         |  $v, (graft.functions.NearestCentroid.Index) $bcRef.value(),
         |  $childIsFloat);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)

  override def prettyName: String = "nearest_centroid"
}

object NearestCentroid {

  /** Immutable centroid index an executor works against: ids, vectors
    * (all the same dimension) and pre-folded norms (the exact
    * `sqrt(Σ x·x)` left-to-right fold `norm()`/`driverNorm` performs).
    */
  final class Index(
      val cids: Array[Long],
      val vecs: Array[Array[Double]],
      val norms: Array[Double]) extends Serializable {
    require(cids.length > 0, "empty centroid index")
    val dim: Int = vecs(0).length
  }

  def buildIndex(cents: Array[(Long, Array[Double])]): Index = {
    def fold(v: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < v.length) { acc += v(i) * v(i); i += 1 }
      math.sqrt(acc)
    }
    new Index(cents.map(_._1), cents.map(_._2), cents.map(c => fold(c._2)))
  }

  /** The kernel — shared by interpreted eval and generated code. Mirrors
    * the inline-literal fold exactly, including its degenerate edges:
    *
    *  - dimension mismatch or a null element would null-poison EVERY
    *    candidate's `vec_dot` (hence every comparison) in the inline
    *    fold, leaving the initial accumulator — the first centroid id;
    *  - `NaN` cosines (zero-norm vectors) win, as Spark's double
    *    comparison ranks NaN above everything (`Double.compare` is that
    *    exact total order once `-0.0` is folded to `0.0` via `+ 0.0`).
    */
  def nearest(v: ArrayData, idx: Index, isFloat: Boolean): Long = {
    val n = v.numElements()
    if (n != idx.dim) return idx.cids(0)
    var i = 0
    var nv = 0.0
    while (i < n) {
      if (v.isNullAt(i)) return idx.cids(0)
      val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      nv += x * x
      i += 1
    }
    val rowNorm = math.sqrt(nv)
    var bestCos = Double.NegativeInfinity
    var bestCid = idx.cids(0)
    var c = 0
    while (c < idx.cids.length) {
      val cv = idx.vecs(c)
      var dot = 0.0
      var d = 0
      while (d < n) {
        val x = if (isFloat) v.getFloat(d).toDouble else v.getDouble(d)
        dot += x * cv(d)
        d += 1
      }
      // + 0.0 folds -0.0 to 0.0 (Spark compares them equal; Double.compare
      // would not); NaN passes through unchanged
      val cos = dot / (rowNorm * idx.norms(c)) + 0.0
      val cmp = java.lang.Double.compare(cos, bestCos)
      if (cmp > 0 || (cmp == 0 && idx.cids(c) < bestCid)) {
        bestCos = cos
        bestCid = idx.cids(c)
      }
      c += 1
    }
    bestCid
  }

  /** Column-API entry point. */
  def nearestCentroid(vec: Column, bc: Broadcast[Index]): Column =
    ColumnBridge.column(NearestCentroid(ColumnBridge.expression(vec), bc))
}
