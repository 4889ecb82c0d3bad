package graft.envelope

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The CDC change-event envelope — the "binlog record" the flagship job
  * tails. This is the Spark-native analog of a draethos source event
  * (key + schemaless payload, reference `internal/source/kafka.go:127-136`),
  * extended with the ordering/idempotence fields the north rule requires
  * and the reference lacks (it is order-blind, see SURVEY.md §2.6):
  *
  *  - `lsn`: global monotone commit sequence (monotone per `(repo,path)`);
  *    the dedup / exactly-once key.
  *  - `op`: `insert | update | delete` (reference pgsql = insert-if-absent
  *    `ON CONFLICT DO NOTHING`, mysql = `REPLACE INTO` last-write-wins;
  *    we keep last-write-wins, i.e. max-LSN-per-key).
  *  - `extra`: open-ended drift carrier — the analog of new fields showing
  *    up in a schemaless draethos record mid-stream, which triggered
  *    `ALTER TABLE ... ADD COLUMN` (`internal/target/pgsql.go:162-238`).
  */
case class ChangeEvent(
    lsn: Long,
    op: String,
    ts: java.sql.Timestamp,
    repo: String,
    path: String,
    commit: String,
    lang: String,
    content: String,
    extra: Map[String, String])

object ChangeEvent {
  val Insert = "insert"
  val Update = "update"
  val Delete = "delete"

  implicit val encoder: Encoder[ChangeEvent] = Encoders.product[ChangeEvent]

  /** Envelope schema, fixed part. Drift fields ride in `extra`. */
  val schema: StructType = encoder.schema

  /** Lake-table key columns, per BASELINE.json input_hint. */
  val keyCols: Seq[String] = Seq("repo", "path")

  /** Fixed (non-drift) lake columns. */
  val lakeCols: Seq[String] = Seq("repo", "path", "commit", "lang", "content")

  /** Parse a raw JSON-lines change feed into (good envelopes, DLQ rows).
    * Draethos logs-and-skips malformed events and never writes its
    * configured DLQ (`internal/source/kafka.go:93-97`); we route them to a
    * real DLQ DataFrame instead.
    */
  def parseJson(spark: SparkSession, raw: DataFrame): (Dataset[ChangeEvent], DataFrame) = {
    import spark.implicits._
    val parsed = raw
      .withColumn("__parsed", from_json(col("value"), schema))
      .cache()
    val good = parsed
      .filter(col("__parsed.lsn").isNotNull && col("__parsed.op").isNotNull &&
        col("__parsed.repo").isNotNull && col("__parsed.path").isNotNull)
      .select(col("__parsed.*"))
      .withColumn("extra", coalesce(col("extra"), map()))
      .as[ChangeEvent]
    val bad = parsed
      .filter(col("__parsed.lsn").isNull || col("__parsed.op").isNull ||
        col("__parsed.repo").isNull || col("__parsed.path").isNull)
      .select(col("value").as("raw"), current_timestamp().as("dlq_ts"))
    (good, bad)
  }
}
