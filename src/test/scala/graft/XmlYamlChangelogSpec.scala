package graft

import graft.job.{CdcJob, CdcJobConfig}

/** XML- and YAML-codec text changelogs through the streaming CDC path —
  * the full codec dispatch of the reference (`internal/context/codec.go:
  * 15-27`, minus its xml→yaml bug), reachable from the CLI spec. The xml
  * case additionally drives a forked `graft.Main start` end-to-end into a
  * converged lake.
  */
class XmlYamlChangelogSpec extends SparkSpec {

  private def xmlLine(lsn: Long, op: String, key: Int): String = {
    val content = if (op == "delete") "" else s"content-$lsn-k$key"
    s"<event><lsn>$lsn</lsn><op>$op</op><repo>r${key % 2}</repo>" +
      s"<path>p$key</path><commit>c$lsn</commit><lang>scala</lang>" +
      s"<content>$content</content></event>"
  }

  private def yamlLine(lsn: Long, op: String, key: Int): String = {
    val content = if (op == "delete") "" else s"content-$lsn-k$key"
    s"{lsn: $lsn, op: $op, repo: r${key % 2}, path: p$key, " +
      s"commit: c$lsn, lang: scala, content: $content}"
  }

  private def writeSeg(logDir: String, seg: Int, lines: Seq[String]): Unit = {
    val d = new java.io.File(f"$logDir/seg=$seg%05d")
    d.mkdirs()
    java.nio.file.Files.write(
      new java.io.File(d, f"part-$seg%05d.txt").toPath,
      lines.mkString("\n").getBytes("UTF-8"))
  }

  private def lakeState(tableDir: String): Map[String, String] =
    graft.lake.LakeTable(spark, tableDir).read()
      .select("path", "content").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap

  test("xml-codec changelog replays; malformed xml lands in the DLQ") {
    val root = tmpDir("xmlcdc")
    val logDir = s"$root/log"
    writeSeg(logDir, 0, Seq(
      xmlLine(1, "insert", 1), xmlLine(2, "insert", 2),
      "<event><lsn>broken", // malformed -> DLQ
      xmlLine(3, "update", 1)))
    writeSeg(logDir, 1, Seq(xmlLine(4, "delete", 2), xmlLine(5, "insert", 3)))

    val job = CdcJob(spark, CdcJobConfig(
      logDir = logDir, tablePath = s"$root/lake",
      checkpointDir = s"$root/ckpt", dlqDir = Some(s"$root/dlq"),
      format = "jsonl", codec = "xml", numBuckets = 2))
    job.runToCompletion()

    assert(lakeState(s"$root/lake") ===
      Map("p1" -> "content-3-k1", "p3" -> "content-5-k3"))
    val dlq = spark.read.parquet(s"$root/dlq")
    assert(dlq.count() === 1L)
    assert(dlq.select("raw").head().getString(0).startsWith("<event><lsn>broken"))
  }

  test("yaml-codec changelog replays; malformed yaml lands in the DLQ") {
    val root = tmpDir("yamlcdc")
    val logDir = s"$root/log"
    writeSeg(logDir, 0, Seq(
      yamlLine(1, "insert", 1), yamlLine(2, "insert", 2),
      "{lsn: [unclosed", // malformed -> passes through verbatim -> DLQ
      yamlLine(3, "update", 2)))

    val job = CdcJob(spark, CdcJobConfig(
      logDir = logDir, tablePath = s"$root/lake",
      checkpointDir = s"$root/ckpt", dlqDir = Some(s"$root/dlq"),
      format = "jsonl", codec = "yaml", numBuckets = 2))
    job.runToCompletion()

    assert(lakeState(s"$root/lake") ===
      Map("p1" -> "content-1-k1", "p2" -> "content-3-k2"))
    val dlq = spark.read.parquet(s"$root/dlq")
    assert(dlq.count() === 1L)
    assert(dlq.select("raw").head().getString(0) === "{lsn: [unclosed")
  }

  test("graft.Main drives an xml-codec changelog spec into a converged lake") {
    val root = tmpDir("xmlcli")
    val logDir = s"$root/log"
    writeSeg(logDir, 0, (1 to 20).map(i => xmlLine(i.toLong, "insert", i)))
    writeSeg(logDir, 1, Seq(xmlLine(21, "update", 3), xmlLine(22, "delete", 4)))
    val yaml =
      s"""stream:
         |  name: xml-cli
         |  checkpointDir: $root/ckpt
         |  port: 0
         |  instance:
         |    source:
         |      type: changelog
         |      specs: { path: $logDir, format: jsonl, codec: xml }
         |    target:
         |      type: lake
         |      specs: { path: $root/lake, keyColumns: [repo, path], numBuckets: 2 }
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
    cmd.add("--verify-oracle")
    val pb = new ProcessBuilder(cmd)
    pb.environment().put("SPARK_GRAFT_CPUS", "2")
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    assert(p.waitFor(180, java.util.concurrent.TimeUnit.SECONDS), s"timeout:\n$out")
    assert(p.exitValue() === 0, s"child failed:\n$out")
    assert(out.contains("oracle check: CONVERGED"), s"not converged:\n$out")

    val state = lakeState(s"$root/lake")
    assert(state.size === 19) // 20 inserts, one deleted
    assert(state("p3") === "content-21-k3")
    assert(!state.contains("p4"))
  }
}
