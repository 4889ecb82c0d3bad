package graft

import graft.envelope.ChangeEvent
import graft.streaming.EventRollup
import java.sql.Timestamp

/** Watermarked windowed rollup: append-once finalization and late-data
  * dropping, across a checkpointed restart (the watermark itself is
  * checkpoint state).
  */
class EventRollupSpec extends SparkSpec {

  private def ev(lsn: Long, ts: String): ChangeEvent =
    ChangeEvent(lsn, "insert", Timestamp.valueOf(ts), "r", s"p$lsn",
      "c", "scala", "x", Map.empty)

  private def writeSeg(logDir: String, name: String, events: Seq[ChangeEvent]): Unit = {
    import spark.implicits._
    events.toDS().coalesce(1).write.parquet(s"$logDir/seg=$name")
  }

  test("rollup target is YAML/CLI-reachable: graft.Main start with target.type rollup") {
    val root = tmpDir("cli-rollup")
    val logDir = s"$root/log"
    writeSeg(logDir, "000", Seq(
      ev(1, "2026-01-01 10:00:00"),
      ev(2, "2026-01-01 10:30:00"),
      ev(3, "2026-01-01 12:00:00")))
    val yaml =
      s"""stream:
         |  name: cli-rollup
         |  checkpointDir: $root/ckpt
         |  port: 0
         |  instance:
         |    source:
         |      type: changelog
         |      specs: { path: $logDir, format: parquet }
         |    target:
         |      type: rollup
         |      specs: { path: $root/out, window: 1 hour, watermark: 10 minutes }
         |""".stripMargin
    val yamlPath = s"$root/pipeline.yaml"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(yamlPath), yaml)

    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val cmd = new java.util.ArrayList[String]()
    cmd.add(javaBin)
    java.lang.management.ManagementFactory.getRuntimeMXBean.getInputArguments
      .forEach(a => if (!a.startsWith("-Xmx") && !a.startsWith("-Xms")) cmd.add(a))
    cmd.add("-Xmx3g")
    cmd.add("-cp"); cmd.add(System.getProperty("java.class.path"))
    cmd.add("graft.Main"); cmd.add("start"); cmd.add("-f"); cmd.add(yamlPath)
    val pb = new ProcessBuilder(cmd)
    pb.environment().put("SPARK_GRAFT_CPUS", "2")
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    assert(p.waitFor() === 0, s"child failed:\n$out")
    assert(out.contains("[graft] rollup done"), s"no rollup summary:\n$out")

    // only the watermark-finalized 10:00 window is in the sink
    val rows = spark.read.parquet(s"$root/out")
      .collect().map(r => (r.getTimestamp(0).toString, r.getLong(3), r.getLong(4)))
    assert(rows.toSeq === Seq(("2026-01-01 10:00:00.0", 2L, 2L)), s"got ${rows.toSeq}")
  }

  test("append-once window finalization; late events beyond the watermark are dropped") {
    val logDir = tmpDir("rolog")
    val outDir = tmpDir("roout")
    val ckpt = tmpDir("rockpt")

    // phase 1: two events in the 10:00 window, one at 12:00 that pushes
    // the watermark to 11:50 and finalizes [10:00, 11:00)
    writeSeg(logDir, "000", Seq(
      ev(1, "2026-01-01 10:00:00"),
      ev(2, "2026-01-01 10:30:00"),
      ev(3, "2026-01-01 12:00:00")))
    EventRollup.start(spark, logDir, outDir, ckpt,
      watermarkDelay = "10 minutes", windowLength = "1 hour")
      .awaitTermination()
    val after1 = spark.read.parquet(outDir)
      .collect().map(r => (r.getTimestamp(0).toString, r.getLong(3), r.getLong(4)))
    assert(after1.toSeq === Seq(("2026-01-01 10:00:00.0", 2L, 2L)),
      s"only the finalized 10:00 window should have been emitted, got ${after1.toSeq}")

    // phase 2 (same checkpoint): a LATE event for the already-finalized
    // 10:00 window (ts 10:45 < watermark 11:50 -> dropped) plus a fresh
    // 13:30 event that finalizes [12:00, 13:00)
    writeSeg(logDir, "001", Seq(
      ev(4, "2026-01-01 10:45:00"),
      ev(5, "2026-01-01 13:30:00")))
    EventRollup.start(spark, logDir, outDir, ckpt,
      watermarkDelay = "10 minutes", windowLength = "1 hour")
      .awaitTermination()
    val after2 = spark.read.parquet(outDir)
      .collect().map(r => (r.getTimestamp(0).toString, r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(after2.toSeq === Seq(
      ("2026-01-01 10:00:00.0", 2L, 2L),   // unchanged: late lsn=4 dropped
      ("2026-01-01 12:00:00.0", 1L, 3L)),  // newly finalized
      s"got ${after2.toSeq}")
  }
}
