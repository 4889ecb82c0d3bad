package graft.sources

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.security.MessageDigest
import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}

/** HTTP webhook source ≙ reference `internal/source/http.go:54-182`: a
  * configured endpoint accepts pushed records, keys each by md5(body),
  * decodes via the JSON codec (400 on failure), merges query params into
  * the payload (`http.go:147-150`), and buffers until the batch-size
  * threshold — 202 Accepted below threshold, 201 Created on the request
  * that triggers a flush (`http.go:164-181`).
  *
  * Spark-native architecture: HTTP is a *producer*, not a Spark source.
  * Each flush appends one atomically-renamed JSONL segment under
  * `spoolDir/seg=http/`, which IS the ordered change log the existing
  * Structured Streaming file source tails (CdcJob format=jsonl). The
  * durable spool is the Kafka-topic analog: producers ack only after the
  * segment is on disk, the streaming consumer gets replayable offsets for
  * free from file-source checkpointing, and the whole distributed side
  * (parse, dedup, merge) is the already-tested flagship path. At cluster
  * scale the spool dir is object storage / DFS and any number of webhook
  * receivers append segments concurrently (unique file names, atomic
  * rename) — no coordination with the Spark job needed.
  *
  * Also serves the reference worker's operational endpoints
  * (`internal/worker.go:93-108`): `/healthcheck/liveness`,
  * `/healthcheck/readiness`, `/metrics` (Prometheus text format).
  */
final class HttpIngestServer(
    port: Int,
    endpoint: String,
    methods: Set[String],
    spoolDir: String,
    batchSize: Int,
    /** Byte budget for the spool buffer ≙ the reference's `bufferSize`
      * (`internal/target/s3.go:142-155`): checked BEFORE the row-count
      * threshold, so one oversized event flushes immediately instead of
      * sitting in memory until `batchSize` more arrive.
      */
    bufferBytes: Long = 1L << 20) {

  private val buffer = new java.util.ArrayList[String]()
  private var bufferedBytes = 0L // guarded by buffer lock
  private val segSeq = new AtomicLong(0L)
  private val received = new AtomicLong(0L)
  private val flushed = new AtomicLong(0L)
  private val rejected = new AtomicLong(0L)
  private val ready = new AtomicBoolean(false)
  // one mapper for validation + re-encode; Jackson ships with Spark
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private val segDir: Path = Paths.get(spoolDir, "seg=http")
  Files.createDirectories(segDir)

  private val server = HttpServer.create(new InetSocketAddress(port), 0)
  server.createContext(endpoint, handle _)
  server.createContext("/healthcheck/liveness",
    (ex: HttpExchange) => reply(ex, 200, "ok"))
  server.createContext("/healthcheck/readiness",
    (ex: HttpExchange) => reply(ex, if (ready.get) 200 else 503,
      if (ready.get) "ok" else "starting"))
  server.createContext("/metrics", (ex: HttpExchange) => reply(ex, 200,
    // ≙ the reference's promhttp route (`worker.go:106-108`)
    s"""# TYPE graft_http_events_received_total counter
       |graft_http_events_received_total ${received.get}
       |# TYPE graft_http_events_rejected_total counter
       |graft_http_events_rejected_total ${rejected.get}
       |# TYPE graft_http_segments_flushed_total counter
       |graft_http_segments_flushed_total ${flushed.get}
       |# TYPE graft_http_buffer_rows gauge
       |graft_http_buffer_rows ${buffer.size}
       |""".stripMargin))

  /** The port actually bound (0 in the config = ephemeral, for tests). */
  def boundPort: Int = server.getAddress.getPort

  def start(): Unit = {
    server.start()
    ready.set(true)
  }

  /** Graceful stop: final flush ≙ the reference's signal-handler drain
    * (`http.go:114-117`). `stop(1)` waits up to a second for in-flight
    * exchanges — a handler racing with shutdown could otherwise append
    * to the buffer AFTER the final flush, losing an event it already
    * acked with 202.
    */
  def stop(): Unit = {
    ready.set(false)
    server.stop(1)
    buffer.synchronized(flushLocked())
  }

  private def handle(ex: HttpExchange): Unit =
    try {
      if (!(ex.getRequestURI.getPath == endpoint ||
            ex.getRequestURI.getPath == endpoint.stripSuffix("/"))) {
        reply(ex, 404, "not found")
      } else if (!methods.contains(ex.getRequestMethod.toUpperCase)) {
        // the reference's mux only routes configured methods (`http.go:85-87`)
        reply(ex, 405, "method not allowed")
      } else {
        val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
        // key = md5(body) ≙ `http.go:133`; the md5-of-now fallback for an
        // empty body (`http.go:125-131`) is deliberately NOT copied — it
        // breaks replay determinism; empty bodies are a 400 instead
        decodeMerged(body, ex.getRequestURI.getRawQuery) match {
          case None =>
            rejected.incrementAndGet()
            reply(ex, 400, "malformed payload") // ≙ `http.go:136-145`
          case Some(line) =>
            received.incrementAndGet()
            val didFlush = buffer.synchronized {
              buffer.add(line)
              bufferedBytes += line.getBytes(UTF_8).length + 1L
              // byte budget wins over count ≙ s3.go:142-155 check order
              if (bufferedBytes >= bufferBytes || buffer.size >= batchSize) {
                flushLocked(); true
              } else false
            }
            // 201 on the request that flushed, 202 while buffering
            // (≙ `http.go:164-181`)
            if (didFlush) reply(ex, 201, "created") else reply(ex, 202, "accepted")
        }
      }
    } catch {
      case scala.util.control.NonFatal(_) => reply(ex, 500, "internal error")
    }

  /** Decode the body as one JSON object, merge query params as top-level
    * string fields (`http.go:147-150`), inject the md5 key as `__key`
    * (≙ target-side key injection, `pgsql.go:111-113`), and re-encode
    * compact — one spool line.
    */
  private[sources] def decodeMerged(body: String, rawQuery: String): Option[String] =
    try {
      val node = mapper.readTree(body)
      if (node == null || !node.isObject) None
      else {
        val obj = node.asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
        for {
          q <- Option(rawQuery).toSeq
          kv <- q.split('&') if kv.nonEmpty
        } {
          val i = kv.indexOf('=')
          val (k, v) =
            if (i < 0) (kv, "")
            else (kv.substring(0, i), kv.substring(i + 1))
          obj.put(java.net.URLDecoder.decode(k, UTF_8),
            java.net.URLDecoder.decode(v, UTF_8))
        }
        obj.put("__key", md5Hex(body))
        Some(mapper.writeValueAsString(obj))
      }
    } catch { case _: java.io.IOException => None }

  /** Write the buffered lines as one spool segment, atomically (tmp +
    * rename — a reader never sees a partial file). Caller holds the
    * buffer lock.
    */
  private def flushLocked(): Unit =
    if (!buffer.isEmpty) {
      val n = segSeq.getAndIncrement()
      val name = f"part-$n%06d-${java.util.UUID.randomUUID().toString.take(8)}.jsonl"
      val tmp = segDir.resolve(s".$name.tmp")
      Files.writeString(tmp, String.join("\n", buffer) + "\n")
      Files.move(tmp, segDir.resolve(name), StandardCopyOption.ATOMIC_MOVE)
      buffer.clear()
      bufferedBytes = 0L
      flushed.incrementAndGet()
    }

  private def md5Hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes(UTF_8))
      .map("%02x".format(_)).mkString

  private def reply(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", "text/plain; charset=utf-8")
    ex.sendResponseHeaders(code, bytes.length)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }
}

object HttpIngestServer {
  /** Defaults mirror the reference (`http.go:36`: methods GET,POST;
    * `stream.go` batchSize). Port 0 binds an ephemeral port.
    */
  def apply(port: Int, endpoint: String, spoolDir: String,
      methods: Set[String] = Set("GET", "POST"),
      batchSize: Int = 100,
      bufferBytes: Long = 1L << 20): HttpIngestServer =
    new HttpIngestServer(port, endpoint, methods, spoolDir, batchSize, bufferBytes)
}
