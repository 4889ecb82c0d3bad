package graft

import graft.textops.Curation
import org.apache.spark.sql.functions._

/** Corpus-curation operators: near-dup cluster resolution (connected
  * components + keeper election), deterministic stratified sampling, and
  * benchmark-contamination detection.
  */
class CurationSpec extends SparkSpec {

  test("neardupClusters: transitive chains collapse to one keeper; singletons keep themselves") {
    import spark.implicits._
    val docs = (1L to 8L).toDF("doc_id")
    // 1-2-3 is a CHAIN (1 and 3 never appear as a pair — only transitivity
    // links them); 7-8 is an island; 4,5,6 are singletons
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("id_a", "id_b")
    val got = Curation.neardupClusters(docs, "doc_id", pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L,
      5L -> 5L, 6L -> 6L, 7L -> 7L, 8L -> 7L))
  }

  test("neardupClusters: long path converges (diameter rounds) and pair orientation is irrelevant") {
    import spark.implicits._
    val n = 12L
    val docs = (1L to n).toDF("doc_id")
    // path 1-2-...-12 with every other pair flipped (id_b, id_a)
    val pairs = (1L until n).map { i =>
      if (i % 2 == 0) (i, i + 1) else (i + 1, i)
    }.toDF("id_a", "id_b")
    val got = Curation.neardupClusters(docs, "doc_id", pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.values.toSet === Set(1L), s"one component labeled 1, got $got")
  }

  test("stratifiedSample: deterministic, honors per-stratum thresholds exactly") {
    import spark.implicits._
    val df = (0L until 1000L).map(i => (i, if (i % 2 == 0) "en" else "zz"))
      .toDF("doc_id", "lang")
    val full = 4294967296L // 2^32: keep-everything threshold
    val a = Curation.stratifiedSample(df, "doc_id", "lang",
      Map("en" -> full), defaultThreshold = 0L)
    // en rows all survive, zz rows all dropped
    assert(a.count() === 500L)
    assert(a.filter(col("lang") === "zz").count() === 0L)
    // determinism: a second run selects the identical id set
    val b = Curation.stratifiedSample(df, "doc_id", "lang",
      Map("en" -> full), defaultThreshold = 0L)
    assert(a.select("doc_id").collect().map(_.getLong(0)).sorted
      sameElements b.select("doc_id").collect().map(_.getLong(0)).sorted)
    // a half-rate stratum keeps roughly half (hash-uniform, not exact)
    val half = Curation.stratifiedSample(df, "doc_id", "lang",
      Map("en" -> (full / 2)), defaultThreshold = 0L).count()
    assert(half > 150L && half < 350L, s"~250 expected, got $half")
    // monotone: raising a threshold only adds rows
    val ids = a.select("doc_id").collect().map(_.getLong(0)).toSet
    val halfIds = Curation.stratifiedSample(df, "doc_id", "lang",
      Map("en" -> (full / 2)), defaultThreshold = 0L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(halfIds.subsetOf(ids))
  }

  test("contamination: shared word n-grams against the probe set, exact counts") {
    import spark.implicits._
    val probe = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs")).toDF("doc_id", "text")
    val corpus = Seq(
      // shares "the quick brown fox" and "quick brown fox jumps" with probe 1
      (10L, "we saw the quick brown fox jumps far away"),
      // shares one 4-gram with EACH probe doc
      (11L, "pack my box with care near the lazy dog today the quick brown fox"),
      // no overlap
      (12L, "completely unrelated text with no common phrases at all")
    ).toDF("doc_id", "text")
    val got = Curation.contamination(corpus, probe, "doc_id", "text", n = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(10L) === ((2L, 1L))) // two matched 4-grams, one probe doc
    assert(got(11L)._2 === 2L)      // collides with both probe docs
    assert(!got.contains(12L))      // clean docs are absent
  }

  test("neardupClusters: 10k-node adversarial path converges in O(log² n) star rounds") {
    import spark.implicits._
    val n = 10000L
    val docs = (0L until n).toDF("doc_id")
    // single path 0-1-2-...-9999: diameter 9999 — min-label propagation
    // would need ~10k rounds; star contraction must do it in tens
    val pairs = (0L until n - 1).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = Curation.neardupClusters(docs, "doc_id", pairs, maxIters = 40)
    assert(got.filter(col("keeper_id") =!= 0L).count() === 0L,
      "every node of the path must resolve to component min 0")
    assert(got.count() === n)
  }

  test("neardupClusters: two components plus ring topology resolve to their minima") {
    import spark.implicits._
    val docs = (0L until 20L).toDF("doc_id")
    // ring 0..9 (cycle) and star 10..19 centered at 15 (min is 10)
    val ring = (0L until 10L).map(i => (i, (i + 1) % 10))
    val starE = (10L until 20L).filter(_ != 15L).map(i => (15L, i))
    val pairs = (ring ++ starE).toDF("id_a", "id_b")
    val got = Curation.neardupClusters(docs, "doc_id", pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 10L).foreach(i => assert(got(i) === 0L, s"ring node $i"))
    (10L until 20L).foreach(i => assert(got(i) === 10L, s"star node $i"))
  }

  test("rarestTerms ranks by (df asc, term asc) per doc and counts df over distinct postings") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta common common"), // 'common' twice: df counts it once
      (2L, "beta common gamma"),
      (3L, "common delta")
    ).toDF("doc_id", "text")
    // df: alpha 1, gamma 1, delta 1, beta 2, common 3
    val got = Curation.rarestTerms(docs, "doc_id", "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> (r.getString(1), r.getLong(2)))
      .toMap
    assert(got((1L, 1)) === ("alpha", 1L))
    assert(got((1L, 2)) === ("beta", 2L))
    assert(got((2L, 1)) === ("gamma", 1L))
    assert(got((2L, 2)) === ("beta", 2L))
    assert(got((3L, 1)) === ("delta", 1L))
    assert(got((3L, 2)) === ("common", 3L))
  }

  test("groupedOrderStats: integer order-statistic indices match a sorted-list reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val rows = for (g <- 0 until 5; i <- 0 until (7 + g * 13))
      yield (s"g$g", rnd.nextInt(1000).toLong, (g * 1000 + i).toLong)
    val got = Curation.groupedOrderStats(
        rows.toDF("grp", "v", "id"), "grp", "v", "id")
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    rows.groupBy(_._1).foreach { case (g, rs) =>
      val sorted = rs.map(x => (x._2, x._3)).sorted.map(_._1)
      val n = sorted.length
      val want = (n.toLong, sorted.head, sorted.last,
        sorted((n + 1) / 2 - 1), sorted((9 * n + 9) / 10 - 1))
      assert(got(g) === want, s"group $g n=$n")
    }
  }
}
