package graft.lake

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** A snapshot entry in the table's commit log. */
final case class Snapshot(
    version: Long,
    schemaDdl: String,
    numBuckets: Int,
    keyCols: Seq[String],
    // bucket id (as string, json map keys) -> relative data file paths.
    // A bucket may hold several files (merge-on-read deltas); the reader
    // resolves the max-__lsn winner per key across them.
    files: Map[String, Seq[String]],
    // exactly-once ledger: checkpointId -> highest applied streaming batchId.
    // Streaming batchIds are monotone per checkpoint, so one Long per
    // checkpoint suffices at any scale (no unbounded applied-set).
    appliedUpTo: Map[String, Long],
    // per-partition lineage: bucket -> max applied LSN watermark
    lineage: Map[String, Long],
    parentVersion: Long)

/** Result of one merge commit, for metrics / listeners. */
final case class MergeStats(
    version: Long,
    batchId: Long,
    skippedAsApplied: Boolean,
    inputRows: Long,
    upserted: Long,
    deleted: Long,
    touchedBuckets: Int,
    newColumns: Seq[String])

/** `LakeTable` — an Iceberg-*semantics* merge-on-read table format over
  * plain Parquet (no Iceberg jar ships in this sandbox; SURVEY.md §7):
  *
  *  - versioned JSON snapshots (`_snapshots/snapshot-N.json`) listing data
  *    files per hash bucket, the evolving schema, the exactly-once batch
  *    ledger, and per-bucket applied-LSN lineage;
  *  - atomic commit via write-temp-then-rename of a `_current` pointer;
  *  - **bucketed merge-on-read**: rows are hash-partitioned into
  *    `numBuckets` buckets on the key columns; a merge APPENDS its batch
  *    winners as per-bucket delta files (rows + tombstones carrying
  *    `__lsn`), and the reader resolves the max-`__lsn` winner per key.
  *    Per-batch write cost is O(batch), not O(touched-bucket contents) —
  *    the copy-on-write variant rewrote every touched bucket in full,
  *    which under Zipf-hot batches approaches O(table) per batch and
  *    makes a 10^10-event replay pay O(batches × table) write volume.
  *    Read amplification is bounded by **budgeted minor compaction**
  *    (LSM-style): a bucket whose file count exceeds `maxFilesPerBucket`
  *    merges its small-file tail (winner-per-key, tombstones kept) while
  *    the largest files stay untouched — per-batch compaction cost is
  *    flat in table size, write volume amortizes O(n log n); `compact()`
  *    is the major-compaction/GC path (at cluster scale `numBuckets`
  *    would be thousands);
  *  - schema evolution ≙ draethos auto-ALTER (`internal/target/pgsql.go:
  *    162-238`): new drift fields become appended nullable string columns;
  *    old files are read with the superset schema (missing → null);
  *  - upsert semantics = last-write-wins per key, the REPLACE-INTO behavior
  *    of the reference MySQL sink (`internal/target/mysql.go:23`), with the
  *    envelope's `delete` op mapped to row removal (the north rule's MERGE:
  *    matched+delete → DELETE, matched → UPDATE, not-matched+!delete →
  *    INSERT);
  *  - table auto-created if absent ≙ `CREATE TABLE IF NOT EXISTS`
  *    (`internal/target/pgsql.go:89-98`).
  */
class LakeTable(
    val spark: SparkSession,
    val tablePath: String,
    requestedKeyCols: Seq[String],
    requestedNumBuckets: Int,
    /** Compaction budget: max delta files per bucket before the merge
      * commit rewrites that bucket (winner-per-key). Bounds MOR read
      * amplification at `maxFilesPerBucket` file-merges per key lookup.
      * Operational knob, not table identity — safe to vary per writer.
      */
    val maxFilesPerBucket: Int = 8) {

  /** For an existing table the SNAPSHOT is authoritative for key columns
    * and bucket count (a reader opening with different defaults must not
    * re-hash rows into the wrong buckets); constructor values apply only
    * at creation.
    */
  def keyCols: Seq[String] =
    currentSnapshot.map(_.keyCols).getOrElse(requestedKeyCols)
  def numBuckets: Int =
    currentSnapshot.map(_.numBuckets).getOrElse(requestedNumBuckets)

  import LakeTable._

  private val root: Path = Paths.get(tablePath)
  private val snapshotsDir: Path = root.resolve("_snapshots")
  private val currentPtr: Path = root.resolve("_current")

  /** Column holding the envelope commit sequence inside a merge batch. */
  val lsnCol = "lsn"
  val opCol = "op"

  // -- snapshot IO -----------------------------------------------------------

  def currentVersion: Option[Long] =
    if (Files.exists(currentPtr)) Some(Files.readString(currentPtr).trim.toLong)
    else None

  def snapshot(version: Long): Snapshot =
    SnapshotCodec.fromJson(Files.readString(snapshotsDir.resolve(s"snapshot-$version.json")))

  def currentSnapshot: Option[Snapshot] = currentVersion.map(snapshot)

  /** Exactly-once ledger probe: has this (checkpointId, batchId) already
    * been committed? Lets callers skip side-effects (DLQ appends, stats)
    * for crash-replayed batches, keeping every output exactly-once — not
    * just the table.
    */
  def isApplied(checkpointId: String, batchId: Long): Boolean =
    currentSnapshot.exists(_.appliedUpTo.get(checkpointId).exists(batchId <= _))

  /** Internal per-row columns: the applied commit sequence and a tombstone
    * flag. Storing them makes the MERGE itself monotone per key — a stale
    * event (lower lsn than the stored row, including a stored tombstone)
    * can never win, for ANY batching/ordering of the log. The streaming
    * dedup state remains the shuffle-volume optimization and first line of
    * defense; the table is safe even without it (state loss, ad-hoc batch
    * imports). Tombstones are dropped by `compact()` once no replayer can
    * be behind them.
    */
  val LsnMeta = "__lsn"
  val DeletedMeta = "__deleted"
  private def metaFields = Seq(
    StructField(LsnMeta, LongType, nullable = false),
    StructField(DeletedMeta, BooleanType, nullable = false))

  /** Create-if-absent with the base USER schema (key cols + value cols);
    * the physical schema appends the internal meta columns.
    */
  def createIfAbsent(baseSchema: StructType): Snapshot = currentSnapshot.getOrElse {
    Files.createDirectories(snapshotsDir)
    val s = Snapshot(
      version = 0L,
      schemaDdl = StructType(baseSchema.fields ++ metaFields).toDDL,
      numBuckets = numBuckets,
      keyCols = keyCols, files = Map.empty, appliedUpTo = Map.empty,
      lineage = Map.empty, parentVersion = -1L)
    commitSnapshot(s)
    s
  }

  /** Atomic snapshot commit: snapshot JSON first, then the `_current`
    * pointer via temp-file + atomic rename. A crash between the two leaves
    * the table at the parent version — never a torn state.
    */
  private def commitSnapshot(s: Snapshot): Unit = {
    Files.createDirectories(snapshotsDir)
    Files.writeString(snapshotsDir.resolve(s"snapshot-${s.version}.json"),
      SnapshotCodec.toJson(s))
    val tmp = root.resolve(s"_current.tmp-${s.version}")
    Files.writeString(tmp, s.version.toString)
    Files.move(tmp, currentPtr, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  // -- reads -------------------------------------------------------------------

  /** Physical schema (includes internal meta columns). */
  def physicalSchema: StructType = currentSnapshot
    .map(s => StructType.fromDDL(s.schemaDdl))
    .getOrElse(StructType(Nil))

  /** User-visible schema. */
  def schema: StructType = StructType(physicalSchema.fields
    .filterNot(f => f.name == LsnMeta || f.name == DeletedMeta))

  /** Read the current table state (all buckets): live rows, user columns.
    * Old files missing evolved columns surface them as NULL —
    * schema-on-read evolution.
    */
  def read(): DataFrame = readMeta() match {
    case df if df.columns.isEmpty => df
    case df => df.filter(!col(DeletedMeta)).drop(LsnMeta, DeletedMeta)
  }

  /** Read including the internal meta columns: the MOR resolve — one
    * winner per key (max `__lsn`, tombstones included so callers can see
    * deletions). Always resolves, even when every bucket holds one file:
    * correctness first — the resolve is a single key-partitioned window
    * over live rows, and the compaction budget keeps the multi-file
    * amplification it pays for bounded.
    */
  def readMeta(): DataFrame = currentSnapshot match {
    case None => spark.emptyDataFrame
    case Some(s) => resolve(readFiles(StructType.fromDDL(s.schemaDdl),
      s.files.values.flatten.toSeq))
  }

  /** Raw rows of every referenced file, unresolved (deltas + tombstones
    * as stored) — lineage checks, compaction internals, tests.
    */
  def readRaw(): DataFrame = currentSnapshot match {
    case None => spark.emptyDataFrame
    case Some(s) => readFiles(StructType.fromDDL(s.schemaDdl),
      s.files.values.flatten.toSeq)
  }

  /** Time travel: read the table as of a given snapshot version. */
  def readVersion(version: Long): DataFrame = {
    val s = snapshot(version)
    resolve(readFiles(StructType.fromDDL(s.schemaDdl),
        s.files.values.flatten.toSeq))
      .filter(!col(DeletedMeta)).drop(LsnMeta, DeletedMeta)
  }

  /** MOR winner resolution: per key, highest `__lsn` wins; on an equal-lsn
    * delete/upsert pair the tombstone wins (same tie-break as the merge's
    * within-batch window — equal LSNs only arise from redelivered events,
    * where both rows are identical anyway; the aligned tie-break makes
    * the pathological distinct-payload case batching-independent too).
    */
  private def resolve(df: DataFrame): DataFrame =
    if (df.columns.isEmpty) df
    else {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(keyCols.map(col): _*)
        .orderBy(col(LsnMeta).desc, col(DeletedMeta).desc)
      df.withColumn("__rrn", row_number().over(w))
        .filter(col("__rrn") === 1).drop("__rrn")
    }

  private def readFiles(sch: StructType, rel: Seq[String]): DataFrame =
    if (rel.isEmpty) spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], sch)
    else spark.read.schema(sch).parquet(rel.map(r => s"$tablePath/$r"): _*)

  // -- merge (the sink) --------------------------------------------------------

  /** Bucket assignment — deterministic hash partition on the key columns. */
  private def bucketExpr = pmod(xxhash64(keyCols.map(col): _*), lit(numBuckets))

  /** Apply one micro-batch of change events (already LSN-deduped upstream;
    * this still reduces to one winner per key for safety/determinism) to
    * the table as an idempotent MERGE commit.
    *
    * @param batch   envelope rows: keyCols ++ value cols ++ lsn, op, extra
    * @param checkpointId identity of the writing stream (runId-agnostic)
    * @param batchId streaming micro-batch id (monotone per checkpoint)
    * @param preReduced the caller guarantees at most one row per key (the
    *   streaming dedup's winner-only emission) — skips the winner window
    *   and its whole key-shuffle + sort. Safe even if a duplicate slipped
    *   through: deltas are resolved max-`__lsn`-per-key (delete-wins tie)
    *   at read, the same reduction the window performs eagerly.
    */
  def merge(batch: DataFrame, checkpointId: String, batchId: Long,
      preReduced: Boolean = false): MergeStats = {
    val cur = currentSnapshot.getOrElse(
      throw new IllegalStateException(s"table $tablePath not initialized"))
    if (cur.appliedUpTo.get(checkpointId).exists(batchId <= _)) {
      // replayed batch after crash/restart — exactly-once no-op
      return MergeStats(cur.version, batchId, skippedAsApplied = true,
        0L, 0L, 0L, 0, Nil)
    }
    val oldSchema = StructType.fromDDL(cur.schemaDdl)

    // 1. one winner per key: max lsn; on an equal-lsn tie the delete wins,
    //    matching resolve()'s cross-file tie-break exactly, so the final
    //    state for pathological duplicate-lsn delete/upsert pairs is
    //    independent of how the log was batched. (LSNs are normally
    //    unique per logical event; equal-lsn rows are redeliveries.)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(lsnCol).desc, (col(opCol) === "delete").desc, col(opCol).desc)
    // localCheckpoint (eager): runs the heavy upstream path (scan →
    // stateful dedup → window) exactly once and truncates the lineage, so
    // the stats job and the COW write job below plan against materialized
    // blocks instead of re-planning (and risking re-executing) the whole
    // streaming subtree.
    val winners = (
      if (preReduced) batch
      else batch
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
    ).withColumn("__bucket", bucketExpr)
      .localCheckpoint()

    // 2+3. one aggregation job computes everything driver-side the commit
    //    needs: touched buckets (≤ numBuckets rows), per-bucket lineage,
    //    upsert/delete counts, and the distinct drift keys (auto-ALTER ≙
    //    pgsql.go:162-238; bounded by schema width — tiny).
    val hasExtra = batch.columns.contains("extra")
    val ksCol =
      if (hasExtra) array_distinct(flatten(collect_set(map_keys(col("extra")))))
      else first(typedLit(Seq.empty[String]))
    val perBucket = winners.groupBy("__bucket").agg(
      max(col(lsnCol)).as("maxLsn"),
      count(lit(1)).as("n"),
      sum(when(col(opCol) =!= "delete", 1L).otherwise(0L)).as("ups"),
      ksCol.as("ks")).collect()
    val touched: Seq[Long] = perBucket.map(_.getLong(0)).toSeq.sorted
    val touchedSet = touched.map(_.toString).toSet
    val batchLineage: Map[String, Long] =
      perBucket.map(r => r.getLong(0).toString -> r.getLong(1)).toMap
    val nUpserts = perBucket.map(_.getLong(3)).sum
    val nDeletes = perBucket.map(_.getLong(2)).sum - nUpserts
    val driftKeys: Seq[String] = perBucket
      .flatMap(_.getSeq[String](4)).distinct.sorted.toSeq
    val newCols = driftKeys.filterNot(k => oldSchema.fieldNames.contains(k))
    val newSchema = StructType(oldSchema.fields ++
      newCols.map(c => StructField(c, StringType, nullable = true)))

    // 4+5. monotone MERGE, merge-on-read: batch winners become delta rows
    //    carrying (__lsn = event lsn, __deleted = op=='delete', drift
    //    values lifted out of `extra`); nothing stored is read or
    //    rewritten here — the reader resolves max-__lsn per key across
    //    {stored rows, deltas}. A stale upsert can never replace a newer
    //    row OR a newer tombstone — order-independent convergence for any
    //    batching, with or without upstream dedup state.
    val valueCols = newSchema.fieldNames.toSeq // includes meta columns
    val userCols = valueCols.filterNot(c => c == LsnMeta || c == DeletedMeta)
    val candBase = winners
      .withColumn(LsnMeta, col(lsnCol))
      .withColumn(DeletedMeta, col(opCol) === "delete")
    val upserts = userCols.foldLeft(candBase) { (df, c) =>
      if (df.columns.contains(c)) df
      else if (df.columns.contains("extra"))
        df.withColumn(c, element_at(col("extra"), c))
      else df.withColumn(c, lit(null).cast(StringType))
    }.select((valueCols.map(col) :+ col("__bucket")): _*)

    // 6. append the delta, one file per touched bucket, salting hot
    //    buckets. Cold buckets repartition by bucket alone: each task
    //    holds whole buckets, so partitionBy emits O(touched buckets)
    //    files per version instead of O(tasks × buckets) tiny files.
    //    Buckets whose batch volume exceeds 4x the mean (Zipf-hot repos)
    //    get a salt derived from the key tail so their write spreads
    //    across tasks — bounded extra files, only where skew demands.
    val meanPerBucket = math.max(1L,
      perBucket.map(_.getLong(2)).sum / math.max(perBucket.length, 1))
    val hotBuckets = perBucket.filter(_.getLong(2) > 4 * meanPerBucket)
      .map(_.getLong(0)).toSet
    val saltExpr =
      if (hotBuckets.isEmpty) lit(0L)
      else when(col("__bucket").isInCollection(hotBuckets),
        pmod(xxhash64(col(keyCols.last)), lit(8L))).otherwise(lit(0L))
    val newVersion = cur.version + 1
    val deltaRel = s"data/v$newVersion/delta"
    upserts
      .repartition(numBuckets, col("__bucket"), saltExpr)
      .write.mode(SaveMode.Overwrite)
      .partitionBy("__bucket")
      .parquet(s"$tablePath/$deltaRel")
    val deltaFiles = enumerateBucketFiles(deltaRel)

    // 7. budgeted MINOR compaction (LSM-style): a bucket whose file count
    //    exceeds the budget merges only its SMALL-FILE TAIL — the largest
    //    `budget/2` files (the base + mature merged tiers) are kept
    //    untouched, and the tail (recent small deltas) is rewritten
    //    winner-per-key into one file (tombstones KEPT — a later stale
    //    upsert must still lose to them; compact(dropTombstones) is the
    //    separate major-compaction/GC path). The earlier policy rewrote
    //    the WHOLE bucket: under batches that touch every bucket (or
    //    salted hot buckets that exceed the budget every batch) that
    //    degenerates to COW — per-batch cost grows with table size
    //    (measured: incremental-merge latency tripled across 16 batches).
    //    Tail-merge cost is O(recent deltas) per batch, flat in table
    //    size; total write volume amortizes O(n log n) like an LSM tree.
    //    Obsolete rows in kept base files are resolved away at read and
    //    reclaimed only by major compaction — the Iceberg minor/major
    //    split. File sizes come from a local stat; at cluster scale a
    //    manifest would carry them (Iceberg does exactly this).
    val grown: Map[String, Seq[String]] =
      (cur.files.keySet ++ deltaFiles.keySet).iterator.map { b =>
        b -> (cur.files.getOrElse(b, Nil) ++ deltaFiles.getOrElse(b, Nil))
      }.toMap
    val keepLargest = math.max(1, maxFilesPerBucket / 2)
    val tails: Map[String, Seq[String]] = grown
      .filter(_._2.size > maxFilesPerBucket)
      .map { case (b, fs) =>
        b -> fs.sortBy(f => -fileSize(f)).drop(keepLargest)
      }
      .filter(_._2.size > 1) // a 1-file tail has nothing to merge
    val finalFiles: Map[String, Seq[String]] =
      if (tails.isEmpty) grown
      else {
        val rewriteRel = s"data/v$newVersion/rewrite"
        val resolveW = Window.partitionBy(keyCols.map(col): _*)
          .orderBy(col(LsnMeta).desc, col(DeletedMeta).desc)
        readFiles(newSchema, tails.values.flatten.toSeq)
          .withColumn("__bucket", bucketExpr)
          .withColumn("__mrn", row_number().over(resolveW))
          .filter(col("__mrn") === 1).drop("__mrn")
          .repartition(tails.size, col("__bucket"))
          .write.mode(SaveMode.Overwrite)
          .partitionBy("__bucket")
          .parquet(s"$tablePath/$rewriteRel")
        val rewritten = enumerateBucketFiles(rewriteRel)
        grown.map { case (b, fs) =>
          tails.get(b) match {
            case Some(tail) =>
              b -> (fs.filterNot(tail.toSet) ++ rewritten.getOrElse(b, Nil))
            case None => b -> fs
          }
        }
      }

    val next = cur.copy(
      version = newVersion,
      schemaDdl = newSchema.toDDL,
      files = finalFiles,
      appliedUpTo = cur.appliedUpTo + (checkpointId -> batchId),
      lineage = cur.lineage ++ batchLineage.map { case (b, m) =>
        b -> math.max(m, cur.lineage.getOrElse(b, Long.MinValue)) },
      parentVersion = cur.version)
    commitSnapshot(next)
    MergeStats(newVersion, batchId, skippedAsApplied = false,
      nUpserts + nDeletes, nUpserts, nDeletes, touched.size, newCols)
  }

  /** Size of a table-relative data file (0 if missing — a lost file shows
    * up at read, not here).
    */
  private def fileSize(rel: String): Long =
    try Files.size(root.resolve(rel)) catch { case _: java.io.IOException => 0L }

  /** List `$tablePath/$rel/__bucket=B/` parquet files → bucket -> relative paths. */
  private def enumerateBucketFiles(rel: String): Map[String, Seq[String]] = {
    val dir = Paths.get(tablePath).resolve(rel)
    Files.list(dir).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("__bucket="))
      .map { p =>
        val b = p.getFileName.toString.stripPrefix("__bucket=")
        val fs = Files.list(p).iterator().asScala
          .filter(_.getFileName.toString.endsWith(".parquet"))
          .map(f => s"$rel/__bucket=$b/${f.getFileName}").toSeq
        b -> fs
      }.toMap
  }

  /** Compact the table: rewrite every bucket into one file. Preserves the
    * internal meta columns; with `dropTombstones=true` also garbage-
    * collects deleted keys (safe once no replayer can deliver events with
    * lsn below the per-bucket lineage watermark). Same snapshot mechanics.
    */
  def compact(dropTombstones: Boolean = false): Snapshot = {
    val cur = currentSnapshot.getOrElse(
      throw new IllegalStateException("no table"))
    val newVersion = cur.version + 1
    val dataRel = s"data/v$newVersion"
    val base = if (dropTombstones) readMeta().filter(!col(DeletedMeta))
      else readMeta()
    base.withColumn("__bucket", bucketExpr)
      .repartition(numBuckets, col("__bucket"))
      .write.mode(SaveMode.Overwrite).partitionBy("__bucket")
      .parquet(s"$tablePath/$dataRel")
    val vDir = Paths.get(tablePath, "data", s"v$newVersion")
    val newBucketFiles: Map[String, Seq[String]] =
      Files.list(vDir).iterator().asScala
        .filter(p => p.getFileName.toString.startsWith("__bucket="))
        .map { p =>
          val b = p.getFileName.toString.stripPrefix("__bucket=")
          val fs = Files.list(p).iterator().asScala
            .filter(_.getFileName.toString.endsWith(".parquet"))
            .map(f => s"$dataRel/__bucket=$b/${f.getFileName}").toSeq
          b -> fs
        }.toMap
    val next = cur.copy(version = newVersion, files = newBucketFiles,
      parentVersion = cur.version)
    commitSnapshot(next)
    next
  }
}

object LakeTable {

  /** JSON (de)serialization of snapshots via json4s (ships with Spark). */
  object SnapshotCodec {
    import org.json4s._
    import org.json4s.jackson.Serialization
    implicit val formats: Formats = Serialization.formats(NoTypeHints)
    def toJson(s: Snapshot): String = Serialization.writePretty(s)
    def fromJson(j: String): Snapshot = Serialization.read[Snapshot](j)
  }

  def apply(spark: SparkSession, path: String,
      keyCols: Seq[String] = Seq("repo", "path"),
      numBuckets: Int = 32,
      maxFilesPerBucket: Int = 8): LakeTable =
    new LakeTable(spark, path, keyCols, numBuckets, maxFilesPerBucket)
}
