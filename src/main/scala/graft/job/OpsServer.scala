package graft.job

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

/** Operational HTTP endpoints for pipelines whose SOURCE is not HTTP.
  * The reference spawns its ops server for every source type
  * (`internal/worker.go:82-90`: promhttp + healthchecks before the worker
  * loop); graft's http-source pipelines get these from `HttpIngestServer`
  * on the ingest port, and this class gives the same contract to
  * changelog-tailing pipelines — a follow-mode job without a liveness
  * probe can't run under an orchestrator.
  *
  *   /healthcheck/liveness   200 while the JVM serves
  *   /healthcheck/readiness  200 once `ready()` (query started), else 503
  *   /metrics                Prometheus text from `metricsText()`
  */
final class OpsServer(port: Int, ready: () => Boolean,
    metricsText: () => String) {

  private val server = HttpServer.create(new InetSocketAddress(port), 0)
  server.createContext("/healthcheck/liveness",
    (ex: HttpExchange) => reply(ex, 200, "ok"))
  server.createContext("/healthcheck/readiness",
    (ex: HttpExchange) =>
      if (ready()) reply(ex, 200, "ok") else reply(ex, 503, "starting"))
  server.createContext("/metrics",
    (ex: HttpExchange) => reply(ex, 200, metricsText()))

  def boundPort: Int = server.getAddress.getPort
  def start(): Unit = server.start()
  def stop(): Unit = server.stop(0)

  private def reply(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", "text/plain; charset=utf-8")
    ex.sendResponseHeaders(code, bytes.length)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }
}

object OpsServer {
  /** Bind-or-warn: a replay CLI run must not die because another pipeline
    * already holds the metrics port; the pipeline's work is unaffected.
    */
  def tryStart(port: Int, ready: () => Boolean,
      metricsText: () => String): Option[OpsServer] =
    try {
      val s = new OpsServer(port, ready, metricsText)
      s.start()
      Some(s)
    } catch {
      case e: java.io.IOException =>
        System.err.println(s"[graft] ops server not started on :$port (${e.getMessage})")
        None
    }
}
