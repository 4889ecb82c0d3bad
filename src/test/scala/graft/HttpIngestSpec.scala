package graft

import graft.sources.HttpIngestServer

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8

/** HTTP webhook source ≙ `internal/source/http.go:54-182`: status-code
  * contract (202 buffering / 201 on flush / 400 malformed / 405 method),
  * md5(body) keying, query-param merge, atomic spool segments, health +
  * metrics endpoints, and the spool feeding the streaming CDC job
  * end-to-end into the lake.
  */
class HttpIngestSpec extends SparkSpec {

  private val client = HttpClient.newHttpClient()

  private def post(port: Int, path: String, body: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
      .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())

  private def get(port: Int, path: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
      .GET().build(), HttpResponse.BodyHandlers.ofString())

  private def send(port: Int, method: String, path: String,
      body: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
      .method(method, HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())

  test("status contract: 202 below threshold, 201 on flush, 400 bad json, 405 method") {
    val spool = tmpDir("http-spool")
    val srv = HttpIngestServer(0, "/ingest", spool, batchSize = 2)
    srv.start()
    try {
      val p = srv.boundPort
      assert(post(p, "/ingest", """{"a":1}""").statusCode() === 202)
      // second event reaches batchSize -> segment flushed -> 201 Created
      assert(post(p, "/ingest", """{"a":2}""").statusCode() === 201)
      assert(post(p, "/ingest", "not json at all").statusCode() === 400)
      assert(post(p, "/ingest", "").statusCode() === 400)
      assert(post(p, "/ingest", "[1,2]").statusCode() === 400) // non-object
      assert(send(p, "PUT", "/ingest", """{"a":3}""").statusCode() === 405)
      assert(post(p, "/nope", "{}").statusCode() === 404)
      val segs = new java.io.File(s"$spool/seg=http").listFiles()
      assert(segs.length === 1 && segs.head.getName.endsWith(".jsonl"))
      val lines = java.nio.file.Files.readAllLines(segs.head.toPath)
      assert(lines.size === 2)
      assert(lines.get(0).contains("\"a\":1") && lines.get(0).contains("\"__key\":"))
    } finally srv.stop()
  }

  test("byte budget wins over count: an oversized event flushes immediately") {
    val spool = tmpDir("http-bytes")
    // count threshold far away (100); byte budget tiny (64 B)
    val srv = HttpIngestServer(0, "/ingest", spool, batchSize = 100,
      bufferBytes = 64L)
    srv.start()
    try {
      val p = srv.boundPort
      val big = s"""{"blob":"${"z" * 200}"}"""
      // ≙ internal/target/s3.go:142-155 — the byte check runs FIRST, so
      // this single event flushes (201) instead of buffering (202)
      assert(post(p, "/ingest", big).statusCode() === 201)
      val segs = new java.io.File(s"$spool/seg=http").listFiles()
      assert(segs != null && segs.length === 1, "oversized event not spooled")
      // and a small event still buffers under both thresholds
      assert(post(p, "/ingest", """{"a":1}""").statusCode() === 202)
    } finally srv.stop()
  }

  test("query params merge into the payload; key is md5(body)") {
    val spool = tmpDir("http-qp")
    val srv = HttpIngestServer(0, "/hook", spool, batchSize = 1)
    srv.start()
    try {
      val body = """{"x":"1"}"""
      assert(post(srv.boundPort, "/hook?src=ci&tag=v1%202", body).statusCode() === 201)
      val seg = new java.io.File(s"$spool/seg=http").listFiles().head
      val line = java.nio.file.Files.readAllLines(seg.toPath).get(0)
      assert(line.contains("\"src\":\"ci\""))
      assert(line.contains("\"tag\":\"v1 2\"")) // url-decoded ≙ query-param merge
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(body.getBytes(UTF_8)).map("%02x".format(_)).mkString
      assert(line.contains(s"""\"__key\":\"$md5\""""))
    } finally srv.stop()
  }

  test("health + metrics endpoints ≙ internal/worker.go:93-108") {
    val spool = tmpDir("http-health")
    val srv = HttpIngestServer(0, "/ingest", spool, batchSize = 10)
    srv.start()
    try {
      val p = srv.boundPort
      assert(get(p, "/healthcheck/liveness").statusCode() === 200)
      assert(get(p, "/healthcheck/readiness").statusCode() === 200)
      post(p, "/ingest", """{"a":1}""")
      post(p, "/ingest", "bad")
      val m = get(p, "/metrics").body()
      assert(m.contains("graft_http_events_received_total 1"))
      assert(m.contains("graft_http_events_rejected_total 1"))
      assert(m.contains("graft_http_buffer_rows 1"))
    } finally srv.stop()
  }

  test("stop() drains the buffer — final flush ≙ the signal-handler drain") {
    val spool = tmpDir("http-drain")
    val srv = HttpIngestServer(0, "/ingest", spool, batchSize = 100)
    srv.start()
    assert(post(srv.boundPort, "/ingest", """{"z":9}""").statusCode() === 202)
    srv.stop()
    val segs = new java.io.File(s"$spool/seg=http").listFiles()
    assert(segs.length === 1)
  }

  test("e2e: webhook envelopes -> spool -> streaming CDC job -> lake") {
    import org.apache.spark.sql.functions._
    val root = tmpDir("http-e2e")
    val spool = s"$root/spool"
    val srv = HttpIngestServer(0, "/ingest", spool, batchSize = 3)
    srv.start()
    val envs = Seq(
      """{"lsn":1,"op":"insert","ts":"2025-01-01 00:00:01","repo":"r1","path":"a","commit":"c1","lang":"scala","content":"v1"}""",
      """{"lsn":2,"op":"update","ts":"2025-01-01 00:00:02","repo":"r1","path":"a","commit":"c2","lang":"scala","content":"v2"}""",
      """{"lsn":3,"op":"insert","ts":"2025-01-01 00:00:03","repo":"r2","path":"b","commit":"c3","lang":"go","content":"w1"}""",
      """{"lsn":4,"op":"delete","ts":"2025-01-01 00:00:04","repo":"r2","path":"b","commit":"c4","lang":"go","content":""}""",
      """{"lsn":5,"op":"insert","ts":"2025-01-01 00:00:05","repo":"r3","path":"c","commit":"c5","lang":"rust","content":"z1"}""")
    envs.foreach(e => assert(post(srv.boundPort, "/ingest", e).statusCode() / 100 === 2))
    srv.stop() // drains the partial second segment
    val cfg = graft.job.CdcJobConfig(
      logDir = spool, tablePath = s"$root/lake",
      checkpointDir = s"$root/ckpt", format = "jsonl",
      checkpointId = "http-e2e", numBuckets = 4)
    val job = graft.job.CdcJob(spark, cfg)
    job.runToCompletion()
    val state = job.lake.read()
      .select("repo", "path", "content").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).sorted
    assert(state.toSeq === Seq(("r1", "a", "v2"), ("r3", "c", "z1")))
  }
}
