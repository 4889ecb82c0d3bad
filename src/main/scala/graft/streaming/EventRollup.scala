package graft.streaming

import graft.envelope.ChangeEvent
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/** Watermarked tumbling-window rollup over the change-event stream: the
  * per-micro-batch metrics the CDC job already emits through its
  * listener, re-expressed as a first-class Structured Streaming windowed
  * aggregation with late-data semantics.
  *
  *  - `withWatermark(ts, delay)`: events older than
  *    `max(seen ts) − delay` are DROPPED (the late-data policy the
  *    reference lacks — it processes order-blind, `SURVEY.md §2.7`);
  *  - tumbling `window(ts, windowLength)` × `op` aggregation with
  *    map-side partial counts — one shuffle keyed by (window, op);
  *  - `OutputMode.Append`: a window row is emitted exactly once, when
  *    the watermark passes its end (finalized — safe to append to an
  *    immutable sink); windows the final watermark has not passed stay
  *    in state, emitted on a later run from the same checkpoint;
  *  - at 10^10-event scale, state is bounded by (active windows × ops),
  *    not by data volume — the watermark is what makes unbounded streams
  *    aggregatable in finite state.
  */
object EventRollup {

  /** Build the rollup stream from a changelog directory. */
  def stream(spark: SparkSession, logDir: String,
      watermarkDelay: String, windowLength: String): DataFrame =
    rollup(
      spark.readStream.schema(ChangeEvent.schema).parquet(s"$logDir/seg=*"),
      watermarkDelay, windowLength)

  /** The transform itself, testable on any envelope-shaped frame. */
  def rollup(events: DataFrame, watermarkDelay: String,
      windowLength: String): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLength), col("op"))
      .agg(count(lit(1)).as("n_events"), max(col("lsn")).as("max_lsn"))
      .select(col("window.start").as("win_start"),
        col("window.end").as("win_end"),
        col("op"), col("n_events"), col("max_lsn"))

  /** Run to end-of-log, appending finalized windows to a parquet sink.
    * Returns the started query (AvailableNow; caller awaits).
    */
  def start(spark: SparkSession, logDir: String, outDir: String,
      checkpointDir: String, watermarkDelay: String = "10 minutes",
      windowLength: String = "1 hour"): StreamingQuery =
    stream(spark, logDir, watermarkDelay, windowLength)
      .writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .format("parquet")
      .option("path", outDir)
      .start()
}
