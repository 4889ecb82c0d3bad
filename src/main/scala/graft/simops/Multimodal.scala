package graft.simops

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed by per-partition
  * batch transforms (the Scala analog of `mapInPandas` batch UDFs).
  *
  * The actual media decode is STUBBED — no image/audio codec libraries
  * ship in this container — behind `decodeStub`, a deterministic fake
  * that derives "features" from the payload bytes. Everything around it
  * is real and load-bearing at scale: the schema contract, the
  * partition-batched iteration (one buffer reuse per batch, not per
  * row), the typed output encoder, and the partitioning strategy
  * (repartition by modality so a heavy decoder sees homogeneous
  * batches).
  */
object Multimodal {

  /** Typed media row: payload + metadata. */
  final case class MediaRow(
      media_id: Long,
      modality: String, // image | audio | video
      payload: Array[Byte],
      width: Int,
      height: Int,
      sample_rate: Int,
      duration_ms: Long)

  /** Extracted feature row. */
  final case class MediaFeatures(
      media_id: Long,
      modality: String,
      n_bytes: Long,
      sha: String,
      // sum of unsigned payload bytes — payload-content-sensitive AND
      // pure-arithmetic, so a SQL oracle can recompute it (sha256 over
      // BLOB is not portable to the oracle engine)
      checksum: Long,
      // stub "embedding": deterministic 8-dim projection of the bytes
      features: Array[Float],
      // stub decode outputs (frame count for video, pixels for image...)
      decoded_units: Long)

  implicit val mediaRowEnc: Encoder[MediaRow] = Encoders.product[MediaRow]
  implicit val mediaFeaturesEnc: Encoder[MediaFeatures] = Encoders.product[MediaFeatures]

  val mediaSchema: StructType = mediaRowEnc.schema

  /** STUB decode ??? — deterministic fake standing in for a real codec
    * (e.g. libjpeg / ffmpeg invoked per batch). Real implementation would
    * decode `payload` and emit pixel/sample features; the fake hashes
    * byte windows so outputs are stable and testable.
    */
  private def decodeStub(m: MediaRow): MediaFeatures = {
    val sha = java.security.MessageDigest.getInstance("SHA-256")
      .digest(m.payload).map("%02x".format(_)).mkString
    var h = 0xcbf29ce484222325L
    var checksum = 0L
    val feat = new Array[Float](8)
    var i = 0
    while (i < m.payload.length) {
      h = (h ^ m.payload(i)) * 0x100000001b3L
      checksum += m.payload(i) & 0xff
      feat(i % 8) += (h % 1000L).toFloat / 1000f
      i += 1
    }
    val units = m.modality match {
      case "image" => m.width.toLong * m.height
      case "audio" => m.sample_rate.toLong * m.duration_ms / 1000
      case _ => m.duration_ms / 40 // ~25 fps frame count
    }
    MediaFeatures(m.media_id, m.modality, m.payload.length.toLong, sha,
      checksum, feat, units)
  }

  /** Feature extraction over a media table: repartition by modality
    * (homogeneous batches for the decoder), then per-partition batched
    * transform. `mapPartitions` is deliberate here — the decode step is
    * genuinely imperative per-batch work (the documented last-resort
    * case); everything before/after stays in the declarative plan.
    */
  def extractFeatures(media: Dataset[MediaRow],
      tasksPerModality: Int = 64): Dataset[MediaFeatures] = {
    // repartition on (modality, hash-slice): modality alone has ~3
    // distinct values, which collapses 100 TB of decode onto 3 tasks.
    // The hash slice restores parallelism while keeping each task's
    // batch homogeneous per modality (one decoder context per task).
    media
      .repartition(col("modality"),
        pmod(hash(col("media_id")), lit(tasksPerModality)))
      .mapPartitions { it: Iterator[MediaRow] =>
        // batch loop: a real decoder would allocate its native context
        // once here and reuse it across the partition's rows
        it.map(decodeStub)
      }
  }

  /** Deterministic synthetic media table for tests/benches (no external
    * data; payload bytes derived from media_id).
    */
  def synthetic(spark: SparkSession, n: Long): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0, n, 1, 8).map { i =>
      val mod = Seq("image", "audio", "video")((i % 3).toInt)
      val len = 64 + (i % 192).toInt
      val payload = Array.tabulate[Byte](len)(j =>
        ((i * 31 + j * 7) % 251).toByte)
      MediaRow(i, mod, payload,
        width = if (mod == "image") 64 + (i % 64).toInt else 0,
        height = if (mod == "image") 64 else 0,
        sample_rate = if (mod == "audio") 16000 else 0,
        duration_ms = if (mod == "image") 0L else 1000L + i % 5000)
    }
  }
}
