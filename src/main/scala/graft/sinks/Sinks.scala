package graft.sinks

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Batch sink connectors for reference fidelity (SURVEY.md §2.5). */
object Sinks {

  /** Supported time tokens of the reference's S3 prefix template
    * (`internal/target/s3.go:205-235`): `%{YEAR}/%{MONTH}/%{DAY}/%{HOUR}/
    * %{MINUTE}/%{SECOND}` — Hive-style time-partition directories.
    */
  private val TokenCols: Seq[(String, Column => Column)] = Seq(
    "YEAR" -> (ts => year(ts)),
    "MONTH" -> (ts => lpad(month(ts).cast("string"), 2, "0")),
    "DAY" -> (ts => lpad(dayofmonth(ts).cast("string"), 2, "0")),
    "HOUR" -> (ts => lpad(hour(ts).cast("string"), 2, "0")),
    "MINUTE" -> (ts => lpad(minute(ts).cast("string"), 2, "0")),
    "SECOND" -> (ts => lpad(second(ts).cast("string"), 2, "0")))

  /** Tokens present in a prefix template, in template order. */
  def templateTokens(prefix: String): Seq[String] =
    TokenCols.map(_._1).filter(t => prefix.contains(s"%{$t}"))

  /** Partitioned JSON-lines sink ≙ the reference S3 target
    * (`internal/target/s3.go:157-199`): each record re-serialized to
    * compact JSON, laid out under time-partition directories derived from
    * the prefix template. Spark-native: `to_json` + `partitionBy` — one
    * distributed write, no driver buffering; partition pruning on read is
    * free for downstream consumers.
    */
  def partitionedJsonl(df: DataFrame, tsCol: String, prefix: String,
      outPath: String): Seq[String] = {
    val tokens = templateTokens(prefix)
    val partCols = tokens.map(_.toLowerCase)
    // internal "__"-prefixed columns (e.g. an injected wall-clock ts)
    // drive partitioning but are not serialized into the records
    val dataCols = df.columns.toSeq.filterNot(_.startsWith("__"))
    val withParts = TokenCols.filter(t => tokens.contains(t._1))
      .foldLeft(df) { case (d, (tok, f)) =>
        d.withColumn(tok.toLowerCase, f(col(tsCol))) }
    val out = withParts
      .withColumn("value", to_json(struct(dataCols.map(col): _*)))
      .select((partCols :+ "value").map(col): _*)
    val writer = out.write.mode(SaveMode.Overwrite)
    (if (partCols.nonEmpty) writer.partitionBy(partCols: _*) else writer)
      .text(outPath)
    partCols
  }
}
