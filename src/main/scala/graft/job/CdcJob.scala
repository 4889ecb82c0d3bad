package graft.job

import graft.dedup.LsnDedup
import graft.envelope.ChangeEvent
import graft.lake.{LakeTable, MergeStats}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

/** Configuration of the flagship CDC replay job — the Spark-native analog
  * of a draethos pipeline spec (`pkg/streams/specs/stream.go:3-65`):
  * one source (the ordered change log), one target (the lake table), one
  * DLQ, and the batch-size knob.
  */
final case class CdcJobConfig(
    logDir: String,
    tablePath: String,
    checkpointDir: String,
    dlqDir: Option[String] = None,
    keyCols: Seq[String] = ChangeEvent.keyCols,
    numBuckets: Int = 32,
    maxFilesPerTrigger: Int = 2,
    // runId-agnostic identity of this pipeline for the exactly-once ledger
    checkpointId: String = "cdc")

/** The flagship job: tail the ordered change log with a Structured
  * Streaming file source, LSN-dedup per key via keyed state, and MERGE
  * each micro-batch into the LakeTable inside `foreachBatch` with an
  * idempotent commit.
  *
  * Pipeline ≙ draethos `source → codec → Attach → CanFlush → Flush →
  * commit offsets` (`internal/source/kafka.go:84-118`), with the same
  * "sink write before offset commit" order — but upgraded from
  * at-least-once to exactly-once by the ledgered snapshot commit
  * (SURVEY.md §2.6).
  */
class CdcJob(spark: SparkSession, cfg: CdcJobConfig) {

  val lake: LakeTable = LakeTable(spark, cfg.tablePath, cfg.keyCols, cfg.numBuckets)

  /** Lake base schema = fixed envelope value columns (drift columns are
    * added by auto-ALTER as they appear).
    */
  private val baseSchema: StructType =
    StructType(ChangeEvent.schema.fields.filter(f =>
      ChangeEvent.lakeCols.contains(f.name)))

  /** Per-micro-batch merge stats, drained by callers for metrics. */
  val stats = new ConcurrentLinkedQueue[MergeStats]()
  def drainStats(): Seq[MergeStats] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[MergeStats]
    var s = stats.poll()
    while (s != null) { out += s; s = stats.poll() }
    out.toSeq
  }

  /** Build (but do not await) the streaming query. */
  def start(trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    import spark.implicits._
    lake.createIfAbsent(baseSchema)

    val raw = spark.readStream
      .schema(ChangeEvent.schema)
      .option("maxFilesPerTrigger", cfg.maxFilesPerTrigger)
      .parquet(s"${cfg.logDir}/seg=*")

    val events = raw
      .withColumn("extra", coalesce(col("extra"), map()))
      .as[ChangeEvent]

    val deduped = LsnDedup(events)

    deduped.writeStream
      .queryName(s"graft-cdc-${cfg.checkpointId}")
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", cfg.checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[ChangeEvent], batchId: Long) =>
        val st = lake.merge(batch.toDF(), cfg.checkpointId, batchId)
        stats.add(st)
        ()
      }
      .start()
  }

  /** Run to end-of-log (AvailableNow) and block until done. */
  def runToCompletion(): Seq[MergeStats] = {
    val q = start(Trigger.AvailableNow())
    q.awaitTermination()
    drainStats()
  }

  /** The independent one-batch oracle applied to an arbitrary envelope
    * DataFrame: latest-lsn winner per key, deletes dropped — what the
    * reference's key-idempotent sink converges to.
    */
  def oracleOf(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(cfg.keyCols.map(col): _*)
      .orderBy(col("lsn").desc, col("op").desc)
    events.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col("op") =!= "delete")
      .drop("__rn")
  }
}

object CdcJob {
  def apply(spark: SparkSession, cfg: CdcJobConfig): CdcJob = new CdcJob(spark, cfg)
}
