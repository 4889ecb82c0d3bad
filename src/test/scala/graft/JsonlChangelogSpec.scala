package graft

import graft.envelope.ChangeEvent
import graft.job.{CdcJob, CdcJobConfig}
import graft.log.ChangeLogGenerator
import org.apache.spark.sql.functions._

/** JSONL-codec changelog: raw text + JSON codec with malformed lines
  * routed to a real DLQ (the reference logs-and-drops,
  * `internal/source/kafka.go:93-97`; its configured DLQ is never written).
  */
class JsonlChangelogSpec extends SparkSpec {

  test("jsonl changelog replays to oracle; malformed lines land in the DLQ") {
    val every = 100
    val cfg = ChangeLogGenerator.Config(nEvents = 5000L, nRepos = 40,
      pathsPerRepo = 15, numSegments = 6)
    val logDir = tmpDir("jl-log")
    val tableDir = tmpDir("jl-lake")
    val ckptDir = tmpDir("jl-ckpt")
    val dlqDir = tmpDir("jl-dlq") + "/dlq"
    ChangeLogGenerator.writeJsonlSegments(spark, logDir, cfg, malformedEvery = every)

    val job = CdcJob(spark, CdcJobConfig(
      logDir = logDir, tablePath = tableDir, checkpointDir = ckptDir,
      dlqDir = Some(dlqDir), format = "jsonl", maxFilesPerTrigger = 3))
    val stats = job.runToCompletion()
    assert(stats.nonEmpty)

    // oracle over the SAME delivery stream minus the corrupted lines
    import spark.implicits._
    val oracle = ChangeLogGenerator.deliveryStream(spark, cfg)
      .select(col("ev.*")).as[ChangeEvent]
      .filter(e => e.lsn % every != every - 1)
      .groupByKey(e => (e.repo, e.path))
      .reduceGroups((a, b) => if (a.lsn >= b.lsn) a else b)
      .map(_._2)
      .filter(_.op != ChangeEvent.Delete)

    val got = job.lake.read().select(col("repo"), col("path"),
      sha2(col("content"), 256).as("sha"))
    val want = oracle.select(col("repo"), col("path"),
      sha2(col("content"), 256).as("sha"))
    assert(got.count() === want.count())
    assert(got.exceptAll(want).count() + want.exceptAll(got).count() === 0L)

    // DLQ holds the corrupted raw lines (deduped by content hash)
    val dlq = spark.read.parquet(dlqDir)
    assert(dlq.count() > 0)
    assert(dlq.columns.toSet === Set("raw", "dlq_ts"))
    assert(dlq.filter(col("raw").startsWith("{\"oops\":")).count() === dlq.count())
  }
}
