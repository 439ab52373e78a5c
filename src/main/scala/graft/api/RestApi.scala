package graft.api

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.model.TableRef

/** HTTP serving layer for the control plane — the reference's goa
  * REST API (api/tables.go:29-103 tables listing, api/subscriptions.go
  * health + subscription actions) over the JDK's built-in
  * `com.sun.net.httpserver` (no external server dependency).
  *
  * Endpoints:
  *  - `GET /health`                        → `{"status":"healthy"}`
  *  - `GET /api/tables`                    → the [[ControlPlane.tablesListing]]
  *    rows as a JSON array (the supplier runs the Spark job on demand)
  *  - `GET /api/subscriptions/reconcile`   → `{"add":[...],"remove":[...]}`
  *    from [[ControlPlane.reconcilePublication]]
  *
  * The server is control-plane only: responses are catalog-sized, the
  * data plane never flows through it. Suppliers are pluggable so tests
  * and deployments wire their own session/state.
  */
final class RestApi(
    tables: () => Seq[Map[String, Any]],
    reconcile: () => (Seq[TableRef], Seq[TableRef])) {

  private var server: HttpServer = _

  /** Bind and start; port 0 picks an ephemeral port. Returns the
    * bound port. */
  def start(port: Int = 0): Int = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    server.createContext("/health", (ex: HttpExchange) =>
      respond(ex, 200, """{"status":"healthy"}"""))
    server.createContext("/api/tables", (ex: HttpExchange) =>
      guarded(ex) {
        val rows = tables().map(row =>
          row.map { case (k, v) => s"${q(k)}:${jsonValue(v)}" }
            .mkString("{", ",", "}"))
        rows.mkString("[", ",", "]")
      })
    server.createContext("/api/subscriptions/reconcile", (ex: HttpExchange) =>
      guarded(ex) {
        val (add, remove) = reconcile()
        def refs(ts: Seq[TableRef]) = ts.map(t =>
          s"""{"schema":${q(t.schema)},"name":${q(t.name)}}""").mkString("[", ",", "]")
        s"""{"add":${refs(add)},"remove":${refs(remove)}}"""
      })
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = if (server != null) server.stop(0)

  private def guarded(ex: HttpExchange)(body: => String): Unit =
    try respond(ex, 200, body)
    catch {
      case e: Exception =>
        respond(ex, 500, s"""{"error":${q(String.valueOf(e.getMessage))}}""")
    }

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length.toLong)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
    ex.close()
  }

  private def q(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"').toString()
  }

  private def jsonValue(v: Any): String = v match {
    case null | None => "null"
    case Some(x) => jsonValue(x)
    case s: String => q(s)
    case b: Boolean => b.toString
    case n @ (_: Long | _: Int | _: Short | _: Byte) => n.toString
    case d: Double => if (d.isFinite) d.toString else "null"
    case f: Float => if (f.isFinite) f.toString else "null"
    case other => q(other.toString)
  }
}
