package graft.log

import graft.envelope.ChangeEvent
import org.apache.spark.sql.{Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic, seeded change-log synthesizer (FIXTURES.md F1).
  *
  * Produces an LSN-ordered sequence of `ChangeEvent`s over a
  * `(repo, path)` keyspace and writes it as numbered parquet segments so a
  * Structured Streaming file source can tail it with `maxFilesPerTrigger`
  * as the batch-size knob (the analog of draethos `target.specs.batchSize`,
  * reference `internal/target/pgsql.go:120-125`).
  *
  * Everything is a pure function of `(seed, index)` — no RNG state, no
  * wall-clock — so the log is reproducible at any parallelism and any
  * scale, and the oracle (max-LSN-per-key reducer) is computable
  * independently. By construction the log contains the north-star test
  * scenarios:
  *
  *  - Zipf-skewed hot repos (repo drawn via an inverse-power transform);
  *  - duplicated deliveries (same lsn emitted twice — redelivery);
  *  - bounded out-of-order windows (delivery position = lsn + jitter);
  *  - guaranteed delete-before-insert pairs (a delete with higher lsn
  *    delivered before a stale lower-lsn upsert of the same key);
  *  - mid-replay schema drift: `extra` gains field `build_system` after
  *    `driftAt1` of the log, and `license` after `driftAt2`.
  */
object ChangeLogGenerator {

  final case class Config(
      nEvents: Long = 100000L,
      nRepos: Int = 200,
      pathsPerRepo: Int = 50,
      zipfExponent: Double = 1.2,
      dupFraction: Double = 0.02,
      reorderWindow: Int = 64,
      deleteFraction: Double = 0.08,
      driftAt1: Double = 0.5,
      driftAt2: Double = 0.85,
      numSegments: Int = 20,
      seed: Long = 42L)

  // -- deterministic hashing -------------------------------------------------
  // splitmix64 finalizer: high-quality 64-bit mix, pure, allocation-free.
  private def mix64(x0: Long): Long = {
    var x = x0
    x ^= (x >>> 30); x *= 0xbf58476d1ce4e5b9L
    x ^= (x >>> 27); x *= 0x94d049bb133111ebL
    x ^= (x >>> 31); x
  }
  private def h(seed: Long, i: Long, tag: Long): Long =
    mix64(seed ^ mix64(i + 0x9e3779b97f4a7c15L * tag))
  private def h01(seed: Long, i: Long, tag: Long): Double =
    (h(seed, i, tag) >>> 11).toDouble / (1L << 53).toDouble

  private val Langs = Array("scala", "go", "py", "java", "rs", "ts", "c")
  private val Words = Array(
    "stream", "merge", "commit", "offset", "snapshot", "schema", "buffer",
    "flush", "upsert", "replay", "lineage", "watermark", "partition",
    "bucket", "checkpoint", "batch", "envelope", "codec", "key", "value")

  /** 40-hex commit id, seeded. */
  def commitHex(seed: Long, i: Long): String = {
    val a = h(seed, i, 101); val b = h(seed, i, 102); val c = h(seed, i, 103)
    f"$a%016x$b%016x${c & 0xffffffffL}%08x"
  }

  /** Deterministic pseudo-source-code body, a pure function of
    * (repo, path, lsn). ~400 chars; the sha256(content) row invariant is
    * computed over this.
    */
  def contentFor(seed: Long, repo: String, path: String, lsn: Long): String = {
    val base = mix64(seed ^ repo.hashCode.toLong ^ (path.hashCode.toLong << 21) ^ lsn)
    val sb = new StringBuilder(448)
    sb.append("// ").append(repo).append('/').append(path)
      .append(" @ lsn=").append(lsn).append('\n')
    sb.append("object M").append(java.lang.Long.toHexString(base & 0xffffff)).append(" {\n")
    var w = base
    var k = 0
    while (k < 24) {
      w = mix64(w + k)
      sb.append("  val ").append(Words(((w >>> 7) & 0x7fffffff).toInt % Words.length))
        .append(k).append(" = ").append(w & 0xffff).append('\n')
      k += 1
    }
    sb.append("}\n")
    sb.toString
  }

  /** One logical event by global index (lsn == index). */
  def eventAt(cfg: Config, i: Long): ChangeEvent = {
    // Zipf-ish repo: inverse-power transform of a uniform draw concentrates
    // mass on low repo indices (hot repos) — the skew the merge must salt.
    val u = math.max(h01(cfg.seed, i, 1), 1e-12)
    val repoIdx = math.min(
      (math.pow(u, cfg.zipfExponent) * cfg.nRepos).toLong, cfg.nRepos - 1L)
    val pathIdx = (h(cfg.seed, i, 2) >>> 33) % cfg.pathsPerRepo
    val lang = Langs((repoIdx % Langs.length).toInt)
    val repo = s"org/repo-$repoIdx"
    val path = s"src/f$pathIdx.$lang"
    val isDelete = h01(cfg.seed, i, 3) < cfg.deleteFraction
    val op =
      if (isDelete) ChangeEvent.Delete
      else if (h01(cfg.seed, i, 4) < 0.3) ChangeEvent.Insert
      else ChangeEvent.Update
    val frac = i.toDouble / cfg.nEvents.toDouble
    val extra: Map[String, String] =
      if (frac >= cfg.driftAt2)
        Map(
          "build_system" -> (if ((h(cfg.seed, i, 5) & 1) == 0L) "sbt" else "bazel"),
          "license" -> (if ((h(cfg.seed, i, 6) & 1) == 0L) "apache-2.0" else "mit"))
      else if (frac >= cfg.driftAt1)
        Map("build_system" -> (if ((h(cfg.seed, i, 5) & 1) == 0L) "sbt" else "bazel"))
      else Map.empty
    ChangeEvent(
      lsn = i,
      op = op,
      ts = new java.sql.Timestamp(1735689600000L + i * 1000L), // 2025-01-01 + lsn sec
      repo = repo,
      path = path,
      commit = commitHex(cfg.seed, i),
      lang = lang,
      content = if (isDelete) "" else contentFor(cfg.seed, repo, path, i),
      extra = extra)
  }

  final case class Positioned(pos: Long, ev: ChangeEvent)

  /** The full delivery stream, ordered by delivery position
    * (= lsn + bounded jitter), including redeliveries and forced
    * delete-before-insert pairs at every index ≡ 500 (mod 997).
    */
  def deliveryStream(spark: SparkSession, cfg: Config): Dataset[Positioned] = {
    import spark.implicits._
    val c = cfg
    spark.range(0, c.nEvents, 1, 32).flatMap { i =>
      if (i % 997 == 500 && i + 1 < c.nEvents) {
        // Forced delete-before-insert: upsert at lsn=i delivered AFTER a
        // delete at lsn=i+1 on the same key (consumes indices i and i+1).
        val up = eventAt(c, i)
        val del = up.copy(lsn = i + 1, op = ChangeEvent.Delete, content = "",
          commit = commitHex(c.seed, i + 1))
        Seq(Positioned(i, del), Positioned(i + c.reorderWindow / 2 + 2, up))
      } else if (i % 997 == 501 && i >= 1) {
        Seq.empty // consumed by the pair above
      } else {
        val ev = eventAt(c, i)
        val w = math.max(c.reorderWindow, 1)
        val first = Positioned(i + (h(c.seed, i, 7) >>> 40) % w, ev)
        if (h01(c.seed, i, 8) < c.dupFraction)
          Seq(first, Positioned(i + (h(c.seed, i, 9) >>> 40) % w + 1, ev))
        else Seq(first)
      }
    }
  }

  /** Materialize the log as `numSegments` parquet segment directories under
    * `dir` (seg=00000 … seg=NNNNN), one file per segment, with strictly
    * increasing mtimes so the streaming file source tails them in delivery
    * order. Single Spark write — no per-segment recomputation.
    */
  def writeSegments(spark: SparkSession, dir: String, cfg: Config): Unit = {
    import spark.implicits._
    val per = math.max(1L, (cfg.nEvents + cfg.numSegments - 1) / cfg.numSegments)
    deliveryStream(spark, cfg)
      .withColumn("seg", format_string("%05d", (col("pos") / per).cast("int")))
      .select(col("seg"), col("ev.*"))
      .repartition(cfg.numSegments, col("seg"))
      .write.mode(SaveMode.Overwrite).partitionBy("seg")
      // 16 MB row groups: parquet splits can't be finer than a row group,
      // and a tailing reader's per-batch scan parallelism is bounded by
      // splits-per-batch — default 128 MB groups would cap it at ~1 task
      // per segment file
      .option("parquet.block.size", (16 * 1024 * 1024).toString)
      .parquet(dir)
    // Stamp per-segment file mtimes in segment order (file source orders by
    // modification time); also drop the _SUCCESS marker from the stream dir.
    val root = new java.io.File(dir)
    new java.io.File(root, "_SUCCESS").delete()
    val segDirs = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("seg="))
      .sortBy(_.getName)
    val base = System.currentTimeMillis() - segDirs.length * 2000L
    segDirs.zipWithIndex.foreach { case (d, idx) =>
      Option(d.listFiles()).getOrElse(Array.empty)
        .foreach(f => f.setLastModified(base + idx * 2000L))
    }
  }

  /** JSONL variant of the change log — raw text lines + JSON codec, the
    * draethos kafka+json shape. Every `malformedEvery`-th line is
    * corrupted (truncated JSON) to exercise the DLQ path.
    */
  def writeJsonlSegments(spark: SparkSession, dir: String, cfg: Config,
      malformedEvery: Int = 0): Unit = {
    import spark.implicits._
    val per = math.max(1L, (cfg.nEvents + cfg.numSegments - 1) / cfg.numSegments)
    val m = malformedEvery
    deliveryStream(spark, cfg)
      .withColumn("seg", format_string("%05d", (col("pos") / per).cast("int")))
      .withColumn("value", to_json(struct(col("ev.*"))))
      .withColumn("value",
        if (m > 0) when(pmod(col("ev.lsn"), lit(m)) === lit(m - 1),
          concat(lit("{\"oops\":"), substring(col("value"), 1, 10)))
          .otherwise(col("value"))
        else col("value"))
      .select("seg", "value")
      .repartition(cfg.numSegments, col("seg"))
      .write.mode(SaveMode.Overwrite).partitionBy("seg").text(dir)
    val root = new java.io.File(dir)
    new java.io.File(root, "_SUCCESS").delete()
    val segDirs = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("seg="))
      .sortBy(_.getName)
    val base = System.currentTimeMillis() - segDirs.length * 2000L
    segDirs.zipWithIndex.foreach { case (d, idx) =>
      Option(d.listFiles()).getOrElse(Array.empty)
        .foreach(f => f.setLastModified(base + idx * 2000L))
    }
  }

  /** The independent oracle reducer: what the reference's key-idempotent
    * sink converges to (REPLACE-INTO last-write-wins, reference
    * `internal/target/mysql.go:23`) = latest-lsn row per key, dropped if
    * that row is a delete. Computed in one batch, order-independent.
    */
  def oracleFinalState(spark: SparkSession, cfg: Config): Dataset[ChangeEvent] = {
    import spark.implicits._
    deliveryStream(spark, cfg)
      .select(col("ev.*")).as[ChangeEvent]
      .groupByKey(e => (e.repo, e.path))
      .reduceGroups((a, b) => if (a.lsn >= b.lsn) a else b)
      .map(_._2)
      .filter(_.op != ChangeEvent.Delete)
  }
}
