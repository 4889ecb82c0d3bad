package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch connectors for reference fidelity (SURVEY.md §2.1). These mirror
  * the observable record semantics of the reference's file sources, not
  * their line-at-a-time execution.
  */
object Sources {

  /** Column-name normalization: lowercase + spaces→underscores, the
    * draethos CSV header rule (`internal/source/csv.go:122`).
    */
  def normalizeHeader(name: String): String =
    name.toLowerCase.replace(" ", "_")

  /** Key derivation for keyless rows: md5 of all row values concatenated
    * with no separator, in column order (`internal/source/csv.go:137`:
    * `md5.Sum(strings.Join(records, ""))`). Null renders as empty.
    */
  def md5RowKey(df: DataFrame, cols: Seq[String]): org.apache.spark.sql.Column =
    md5(concat(cols.map(c => coalesce(col(c).cast("string"), lit(""))): _*))

  /** CSV source ≙ `internal/source/csv.go:40-157`: header row becomes
    * normalized column names; every row gets an md5-of-joined-values
    * `__key` column. Scales as a plain distributed scan — no driver loop.
    */
  def csv(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.option("header", "true").csv(path)
    val renamed = raw.toDF(raw.columns.map(normalizeHeader).toIndexedSeq: _*)
    renamed.withColumn("__key", md5RowKey(renamed, renamed.columns.toSeq))
  }

  /** JSONL source ≙ `internal/source/jsonl.go:40-130`: one JSON object per
    * line, key = md5(raw line) (`jsonl.go:110`). We read `text` first so
    * the key is over the exact raw bytes, then parse.
    */
  def jsonl(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    spark.read.text(path)
      .withColumn("__key", md5(col("value")))
      .withColumn("__rec", from_json(col("value"), schema))
      .select(col("__key"), col("__rec.*"))
  }

  /** Schema-inferred variant (two passes, like the reference's schemaless
    * map — acceptable for batch imports; the streaming path uses explicit
    * envelope schemas).
    */
  def jsonlInferred(spark: SparkSession, path: String): DataFrame = {
    val schema = spark.read.json(path).schema
    jsonl(spark, path, schema)
  }
}
