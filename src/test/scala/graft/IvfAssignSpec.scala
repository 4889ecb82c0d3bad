package graft

import graft.simops.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Equivalence of the two IVF assignment paths — the inline-literal plan
  * (≤256 cells, the oracle-checked shape) and the broadcast-index kernel
  * ([[graft.functions.NearestCentroid]], the 100 TB shape at large cell
  * counts) — including the degenerate edges, plus the dispatch rule and
  * the no-literals-in-plan property that is the whole point of the
  * broadcast path.
  */
class IvfAssignSpec extends SparkSpec {

  /** Deterministic pseudo-random corpus: LCG-derived floats in [-1, 1).
    * Written to (and read back from) parquet so plans are real scans —
    * a LocalRelation gets constant-folded at plan time, which would both
    * hide the expression nodes the plan assertions probe for and skip
    * the codegen path entirely.
    */
  private def synthVecs(n: Int, dim: Int): DataFrame = {
    import spark.implicits._
    val local = (0 until n).map { i =>
      (i.toLong, Array.tabulate(dim) { d =>
        val x = (i.toLong * 6364136223846793005L + d * 1442695040888963407L + 1L)
        (((x >>> 11) % 100000L).toFloat / 50000f) - 1f
      })
    }.toDF("vec_id", "embedding")
    val dir = tmpDir(s"ivf-corpus-$n-$dim")
    local.write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  /** Deterministic centroid matrix (doubles, as a k-means output would be). */
  private def synthCents(k: Int, dim: Int): Array[(Long, Array[Double])] =
    Array.tabulate(k) { c =>
      (c.toLong, Array.tabulate(dim) { d =>
        val x = (c.toLong * 2862933555777941757L + d * 3037000493L + 7L)
        (((x >>> 13) % 100000L).toDouble / 50000.0) - 1.0
      })
    }

  private def assignments(df: DataFrame): Map[Long, Long] =
    df.select(col("vec_id"), col("cid").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("broadcast assignment is identical to inline at the 300-cell scale") {
    val corpus = synthVecs(400, 8)
    val cents = synthCents(300, 8)
    val a = assignments(Similarity.ivfAssignInline(corpus, cents, "embedding", LongType))
    val b = assignments(Similarity.ivfAssignBroadcast(corpus, cents, "embedding", LongType))
    assert(a.size === 400)
    assert(a === b)
    // sanity: more than one cell actually used
    assert(a.values.toSet.size > 10)
  }

  test("broadcast assignment identical to inline at 4096 cells x dim 64; no centroid literals in the plan") {
    val corpus = synthVecs(500, 64)
    val cents = synthCents(4096, 64)
    val broad = Similarity.ivfAssignBroadcast(corpus, cents, "embedding", LongType)
    val b = assignments(broad)
    val a = assignments(Similarity.ivfAssignInline(corpus, cents, "embedding", LongType))
    assert(a === b)
    // the broadcast plan must NOT inline the centroid matrix: probe for a
    // distinctive component value that the inline plan would embed
    val plan = broad.queryExecution.executedPlan.toString
    val probe = cents(1)._2(0).toString
    assert(!plan.contains(probe), "broadcast plan embeds centroid literals")
    assert(plan.contains("nearest_centroid"))
  }

  test("degenerate inputs agree across paths: null element, dim mismatch") {
    val cents = synthCents(5, 3)
    // row 0: null element; row 1: wrong dimension; row 3: a normal vector.
    // (A zero-norm vector is NOT an equivalence case: under ANSI mode —
    // the Spark 4 default — the inline path's 0/0 division raises, while
    // the kernel produces the non-ANSI NaN-ranks-first result.)
    val df = spark.range(1).select(
      lit(0L).as("vec_id"),
      array(lit(1.0), lit(null).cast("double"), lit(2.0)).as("embedding"))
      .unionAll(spark.range(1).select(lit(1L).as("vec_id"),
        array(lit(1.0), lit(2.0)).as("embedding")))
      .unionAll(spark.range(1).select(lit(3L).as("vec_id"),
        array(lit(0.5), lit(-0.25), lit(0.75)).as("embedding")))
    val a = assignments(Similarity.ivfAssignInline(df, cents, "embedding", LongType))
    val b = assignments(Similarity.ivfAssignBroadcast(df, cents, "embedding", LongType))
    assert(a === b)
    // null-poisoned and dim-mismatched rows fall to the first centroid id
    assert(a(0L) === cents.head._1)
    assert(a(1L) === cents.head._1)
  }

  test("ivfAssign uses the broadcast kernel at every cell count; agrees with inline") {
    import spark.implicits._
    val corpus = synthVecs(50, 4)
    def centFrame(k: Int) = synthCents(k, 4).toSeq
      .map { case (cid, v) => (cid, v.toSeq) }.toDF("cid", "__centroid")
    val small = Similarity.ivfAssign(corpus, centFrame(16), "vec_id", "embedding")
    assert(small.queryExecution.executedPlan.toString.contains("nearest_centroid"))
    val large = Similarity.ivfAssign(corpus, centFrame(257), "vec_id", "embedding")
    assert(large.queryExecution.executedPlan.toString.contains("nearest_centroid"))
    // and the kernel agrees with the inline reference shape at the small dial
    val aSmall = assignments(small)
    val aSmallI = assignments(Similarity.ivfAssignInline(corpus,
      synthCents(16, 4), "embedding", LongType))
    assert(aSmall === aSmallI)
  }

  test("k-means packed centroid collect is bit-identical to the row-per-(cid,dim) shape at 4096 cells x dim 256") {
    // r5 verdict #2: the Lloyd update must not pull nCells × dim scalar
    // rows through one driver collect. The packed path collects ≤ nCells
    // rows (the size of the index the driver must hold anyway); this pins
    // it bit-identical to the replaced row-collect update at a dial where
    // the difference matters (4096 cells × 256 dims → 1M scalar rows
    // before, 4096 packed rows now).
    val nCells = 4096
    val dim = 256
    val corpus = synthVecs(4600, dim)
    val got = Similarity
      .ivfCentroidsKmeans(corpus, "vec_id", "embedding", nCells, iters = 1)
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap

    // reference: the replaced update, straight from first principles —
    // seed centroids = nCells lowest-id vectors, one broadcast-kernel
    // assignment, per-(cid, d) exact i64 sums collected row-per-pair
    val seeds: Array[(Long, Array[Double])] = corpus
      .orderBy(col("vec_id")).limit(nCells)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray)
    val assigned = Similarity.ivfAssignBroadcast(
      corpus.select(col("embedding").as("__v")), seeds, "__v", LongType)
    val sums = assigned
      .select(col("cid"), posexplode(col("__v")).as(Seq("d", "x")))
      .groupBy("cid", "d")
      .agg(sum(floor(col("x").cast("double") * 1048576.0)).as("s"),
        count(lit(1)).as("n"))
      .collect()
    val byCell = sums.groupBy(_.getLong(0)).map { case (cid, rows) =>
      cid -> rows.sortBy(_.getInt(1))
        .map(r => r.getLong(2).toDouble / (r.getLong(3) * 1048576L).toDouble)
    }
    val want = seeds.map { case (cid, old) =>
      cid -> byCell.getOrElse(cid, old)
    }.toMap

    assert(got.keySet === want.keySet)
    got.foreach { case (cid, v) =>
      assert(java.util.Arrays.equals(v, want(cid)), s"centroid $cid differs")
    }
  }

  test("cosineNearDups auto-dials nPlanes from the corpus size") {
    val corpus = synthVecs(300, 8)
    // nPlanes <= 0 must derive a dial and still produce a valid pair set
    val auto = Similarity.cosineNearDups(corpus, "vec_id", "embedding",
      threshold = 0.2, nPlanes = 0)
    val explicit = Similarity.cosineNearDups(corpus, "vec_id", "embedding",
      threshold = 0.2, nPlanes = Similarity.autoPlanes(300))
    assert(auto.collect().map(_.toString).sorted
      sameElements explicit.collect().map(_.toString).sorted)
  }
}
