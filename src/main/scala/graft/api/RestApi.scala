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
  *  - `GET /api/subscriptions`             → the subscription document
  *    (id + published tables; reference Get, api/subscriptions.go:31-49)
  *  - `POST /api/subscriptions/actions/add-table`  body
  *    `{"schema":…,"name":…}` → add + return the subscription
  *    (reference AddTable, api/subscriptions.go:51-80)
  *  - `POST /api/subscriptions/actions/stop-table` body as above →
  *    expire outstanding imports, remove, return the subscription
  *    (reference StopTable, api/subscriptions.go:82-126)
  *  - `GET /api/imports`                   → import jobs as JSON
  *    (reference List, api/imports.go:23-40)
  *
  * The server is control-plane only: responses are catalog-sized, the
  * data plane never flows through it. Suppliers are pluggable so tests
  * and deployments wire their own session/state.
  */
final class RestApi(
    tables: () => Seq[Map[String, Any]],
    reconcile: () => (Seq[TableRef], Seq[TableRef]),
    subscription: Option[SubscriptionService] = None,
    imports: () => Seq[graft.jobs.ImportJob] = () => Nil) {

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
        s"""{"add":${refs(add)},"remove":${refs(remove)}}"""
      })
    // longest-prefix routing: the reconcile/actions contexts above and
    // below take precedence over this one
    server.createContext("/api/subscriptions", (ex: HttpExchange) =>
      withSubscription(ex)(svc => guarded(ex)(subscriptionJson(svc, svc.published()))))
    server.createContext("/api/subscriptions/actions/add-table", (ex: HttpExchange) =>
      withSubscription(ex)(svc => post(ex)(body =>
        subscriptionJson(svc, svc.addTable(parseRef(body))))))
    server.createContext("/api/subscriptions/actions/stop-table", (ex: HttpExchange) =>
      withSubscription(ex)(svc => post(ex)(body =>
        subscriptionJson(svc, svc.stopTable(parseRef(body))))))
    server.createContext("/api/imports", (ex: HttpExchange) =>
      guarded(ex)(imports().map(jobJson).mkString("[", ",", "]")))
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = if (server != null) server.stop(0)

  private def refs(ts: Seq[TableRef]): String = ts.map(t =>
    s"""{"schema":${q(t.schema)},"name":${q(t.name)}}""").mkString("[", ",", "]")

  private def subscriptionJson(svc: SubscriptionService,
      published: Seq[TableRef]): String =
    s"""{"id":${q(svc.id)},"published_tables":${refs(published)}}"""

  /** 404 when no subscription service is wired (control plane running
    * without a live registry). */
  private def withSubscription(ex: HttpExchange)(
      body: SubscriptionService => Unit): Unit =
    subscription match {
      case Some(svc) => body(svc)
      case None => respond(ex, 404, """{"error":"no subscription configured"}""")
    }

  /** POST-only route: parse the body, 405 other methods, 400 bad JSON. */
  private def post(ex: HttpExchange)(body: String => String): Unit =
    if (ex.getRequestMethod != "POST")
      respond(ex, 405, """{"error":"method not allowed"}""")
    else {
      val in = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      val parsed = try Right(body(in)) catch {
        case e: IllegalArgumentException =>
          Left(400 -> s"""{"error":${q(String.valueOf(e.getMessage))}}""")
        case e: Exception =>
          Left(500 -> s"""{"error":${q(String.valueOf(e.getMessage))}}""")
      }
      parsed match {
        case Right(out) => respond(ex, 200, out)
        case Left((code, err)) => respond(ex, code, err)
      }
    }

  /** `{"schema":…,"name":…}` → TableRef; IllegalArgumentException on
    * malformed input (surfaced as 400). */
  private def parseRef(body: String): TableRef = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val j = try JsonMethods.parse(body) catch {
      case e: Exception =>
        throw new IllegalArgumentException(s"malformed JSON body: ${e.getMessage}")
    }
    (j \ "schema", j \ "name") match {
      case (JString(s), JString(n)) => TableRef(s, n)
      case _ => throw new IllegalArgumentException(
        """body must be {"schema":"…","name":"…"}""")
    }
  }

  private def tsJson(t: Option[java.sql.Timestamp]): String =
    t.map(x => q(x.toInstant.toString)).getOrElse("null")

  /** Serialize one import job — the reference's field set
    * (api/imports.go:42-57), snake_cased. */
  private def jobJson(j: graft.jobs.ImportJob): String =
    s"""{"id":${j.id},"subscription_id":${q(j.subscriptionId)},""" +
      s""""schema":${q(j.tableRef.schema)},"table_name":${q(j.tableRef.name)},""" +
      s""""cursor":${j.cursor.map(q).getOrElse("null")},""" +
      s""""completed_at":${tsJson(j.completedAt)},""" +
      s""""expired_at":${tsJson(j.expiredAt)},""" +
      s""""error":${j.error.map(q).getOrElse("null")},""" +
      s""""error_count":${j.errorCount},""" +
      s""""last_error_at":${tsJson(j.lastErrorAt)},""" +
      s""""rows_processed_total":${j.rowsProcessedTotal}}"""

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
