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

  // -- value-based type sniffing (≙ reference DDL inference) -------------------

  /** The reference's date/datetime regex ladder, applied at sink-write time
    * to pick column DDL (`internal/target/pgsql.go:326-363`):
    * `YYYY-MM-DD` → DATE; ISO datetime (T or space separated, optional
    * fraction) → TIMESTAMP; len > 255 → TEXT; else VARCHAR.
    */
  private val DateRe = "^\\d{4}-\\d{2}-\\d{2}$"
  private val DateTimeRe =
    "^\\d{4}-\\d{2}-\\d{2}[T ]\\d{2}:\\d{2}:\\d{2}(\\.\\d+)?(Z)?$"

  /** Sniff the draethos-inferred type of one string value. */
  def sniffType(v: String): String =
    if (v == null) "varchar"
    else if (v.matches(DateRe)) "date"
    else if (v.matches(DateTimeRe)) "timestamp"
    else if (v.length > 255) "text"
    else "varchar"

  /** Apply the type ladder to every string column of a DataFrame: a column
    * whose non-null values ALL match the date (resp. datetime) regex is
    * cast to DateType (resp. TimestampType) — the distributed analog of the
    * reference's per-value DDL sniffing, decided per column instead of
    * per record (per-record DDL flapping is a reference bug we don't keep).
    * One aggregation pass; cheap at any scale.
    */
  def sniffTypes(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.StringType
    val strCols = df.schema.fields.filter(_.dataType == StringType).map(_.name)
    if (strCols.isEmpty) return df
    val checks = strCols.flatMap { c =>
      Seq(
        min(coalesce(col(c).rlike(DateRe), lit(false))).as(s"${c}__d"),
        min(coalesce(col(c).rlike(DateTimeRe), lit(false))).as(s"${c}__t"))
    }
    val row = df.agg(checks.head, checks.tail.toIndexedSeq: _*).head()
    strCols.foldLeft(df) { (d, c) =>
      if (row.getAs[Boolean](s"${c}__d")) d.withColumn(c, to_date(col(c)))
      else if (row.getAs[Boolean](s"${c}__t"))
        d.withColumn(c, to_timestamp(regexp_replace(col(c), "T", " ")))
      else d
    }
  }
}
