package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the banded-LSH bucket keys of a
  * MinHash signature: shingle set in, `bands` bucket hashes out — the
  * per-row kernel of `Dedup.candidatesFromShingles`.
  *
  * Bit-identical to the explode + 64-min-aggregate + `xxhash64(band,
  * m…)` pipeline it replaces (kept as `Dedup.minhashBandsAgg`, the
  * equivalence reference — MinhashBandsSpec):
  *
  *  - per shingle: `h = pmod(xxhash64(g), P)` with P = 2^31−1 and
  *    Spark's seed-42 XXH64 over the UTF8 bytes;
  *  - signature j = min over shingles of `pmod(h·a_j + b_j, P)` (the
  *    31-bit affine family `Dedup.coefA/coefB` — products < 2^62, exact
  *    in i64);
  *  - band b's bucket = Spark's multi-arg `xxhash64(lit(b), m_{b·r},
  *    …, m_{b·r+r−1})`: the seed-42 left-to-right fold XXH64.hashInt /
  *    hashLong performs.
  *
  * A null shingle element folds the running hash through unchanged —
  * exactly Spark's null-skipping hash semantics (`xxhash64(NULL) =
  * seed`); an EMPTY or null shingle array returns NULL so a downstream
  * `posexplode` emits no rows, exactly as the aggregation shape emitted
  * no signature row for a doc that exploded to zero shingles. (In
  * practice `WordShingles` never returns an empty array — empty docs
  * yield one empty-string shingle.)
  *
  * Why (guide §2.3/§4): the aggregation shape shuffled one partial
  * aggregate row per (doc × 64 permutations); this kernel computes the
  * identical minima in one fused loop inside whole-stage codegen — the
  * signature stage costs zero shuffle at any scale.
  */
case class MinhashBands(child: Expression, bands: Int, rowsPerBand: Int)
    extends UnaryExpression {

  require(bands >= 1 && rowsPerBand >= 1,
    s"bands=$bands rowsPerBand=$rowsPerBand must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_bands requires an array<string> input, got $dt")
    }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else MinhashBands.buckets(v.asInstanceOf[ArrayData], bands, rowsPerBand)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
         |  graft.functions.MinhashBands.buckets($c, $bands, $rowsPerBand);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)

  override def nullable: Boolean = true

  override protected def withNewChildInternal(newChild: Expression): MinhashBands =
    copy(child = newChild)

  override def prettyName: String = "minhash_bands"
}

object MinhashBands {

  private val P = 2147483647L // 2^31 - 1, the Dedup permutation modulus

  /** The kernel — shared by interpreted eval and generated code.
    * Returns null for an empty shingle set (no signature row).
    */
  def buckets(sh: ArrayData, bands: Int, rowsPerBand: Int): ArrayData = {
    val n = sh.numElements()
    if (n == 0) return null
    val k = bands * rowsPerBand
    val a = coefCacheA(k)
    val b = coefCacheB(k)
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < n) {
      // xxhash64(NULL) folds the seed through unchanged — mirrored here
      val h64 =
        if (sh.isNullAt(i)) 42L
        else XXH64.hashUTF8String(sh.getUTF8String(i), 42L)
      val h = { val m = h64 % P; if (m < 0) m + P else m }
      var j = 0
      while (j < k) {
        val v = (h * a(j) + b(j)) % P // operands < 2^31 ⇒ product < 2^62
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    val out = new Array[Long](bands)
    var band = 0
    while (band < bands) {
      var hash = XXH64.hashInt(band, 42L)
      var r = 0
      while (r < rowsPerBand) {
        hash = XXH64.hashLong(mins(band * rowsPerBand + r), hash)
        r += 1
      }
      out(band) = hash
      band += 1
    }
    new GenericArrayData(out)
  }

  // coefficient tables per k, cached (identical across rows/threads)
  @volatile private var cached: (Int, Array[Long], Array[Long]) = null
  private def coefCacheA(k: Int): Array[Long] = { ensure(k); cached._2 }
  private def coefCacheB(k: Int): Array[Long] = { ensure(k); cached._3 }
  private def ensure(k: Int): Unit = {
    val c = cached
    if (c == null || c._1 != k) {
      val a = Array.tabulate(k)(graft.textops.Dedup.coefA)
      val b = Array.tabulate(k)(graft.textops.Dedup.coefB)
      cached = (k, a, b)
    }
  }

  /** Column-API entry point. */
  def minhashBands(shingles: Column, bands: Int, rowsPerBand: Int): Column =
    ColumnBridge.column(
      MinhashBands(ColumnBridge.expression(shingles), bands, rowsPerBand))
}
