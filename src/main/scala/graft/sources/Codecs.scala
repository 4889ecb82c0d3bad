package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import scala.jdk.CollectionConverters._

/** Codec layer ≙ reference `internal/codec/{json,yaml,xml}.go` +
  * dispatcher `internal/context/codec.go:15-27` (JSON default; note the
  * reference's dispatcher bug where requesting `xml` returns the YAML
  * codec, `codec.go:21-22` — we dispatch correctly).
  *
  * JSON and XML are Spark-native expressions (`from_json` / `from_xml`,
  * codegen-friendly, no UDF). YAML has no built-in; it decodes via
  * snakeyaml inside a typed map — the documented per-record imperative
  * case, used only by batch connectors.
  */
object Codecs {

  /** Codecs with a Column-level (expression) decode. YAML has no SQL
    * expression — it is supported only via the typed-map path
    * (`yamlToMap`), never through `decode`; keeping it out of this set
    * keeps `Supported` and `decode` consistent.
    */
  val Supported: Set[String] = Set("json", "xml")

  def decode(codec: String, raw: Column, schema: StructType): Column =
    codec match {
      case "json" => from_json(raw, schema)
      case "xml" => from_xml(raw, schema)
      case other => throw new IllegalArgumentException(
        s"codec $other not implemented") // ≙ context/codec.go default-to-json, but strict
    }

  def encodeJson(cols: Column): Column = to_json(cols)
  def encodeXml(cols: Column): Column = to_xml(cols)

  /** YAML record encode: map column → one YAML document per row
    * (≙ `internal/codec/yaml.go:25-33` Marshal). Typed-map path like the
    * decoder; used by batch exports only, never on the streaming hot path.
    */
  def mapToYaml(df: DataFrame, mapCol: String): DataFrame = {
    import df.sparkSession.implicits._
    val rendered = df.select(col(mapCol)).as[Map[String, String]]
      .mapPartitions { it =>
        val yaml = new org.yaml.snakeyaml.Yaml()
        it.map { m =>
          val jm = new java.util.LinkedHashMap[String, Object]()
          m.toSeq.sortBy(_._1).foreach { case (k, v) => jm.put(k, v) }
          yaml.dump(jm)
        }
      }
    rendered.toDF("yaml")
  }

  /** YAML record decode: one YAML document per row → MapType columns.
    * Typed-map path (snakeyaml is JVM-side, no SQL expression exists).
    */
  def yamlToMap(df: DataFrame, rawCol: String): DataFrame = {
    import df.sparkSession.implicits._
    val parsed = df.select(col(rawCol).cast("string")).as[String]
      .mapPartitions { it =>
        // one parser instance per partition (snakeyaml is not thread-safe)
        val yaml = new org.yaml.snakeyaml.Yaml()
        it.map { doc =>
          val m = yaml.load[java.util.Map[String, Object]](doc)
          if (m == null) Map.empty[String, String]
          else m.asScala.map { case (k, v) => k -> String.valueOf(v) }.toMap
        }
      }
    parsed.toDF("record")
  }
}
