package graft.sinks

import graft.sinks.BigQueryMapping.BqTableMeta

/** Real HTTP binding for [[BigQueryTransport]] over the public
  * BigQuery v2 REST surface — the piece of the reference's sink
  * (pkg/sinks/bigquery/table.go:28-63, sink.go:40-79) that the
  * offline skeleton left behind a seam. Pure JDK (`java.net.http`),
  * no client SDK:
  *
  *  - `ensureTable`/`ensureView` run the mapping layer's Standard-SQL
  *    DDL through `POST /projects/{p}/queries` (jobs.query with
  *    `useLegacySql:false`) — the DDL is already idempotent
  *    (CREATE IF NOT EXISTS / CREATE OR REPLACE), matching the
  *    reference's create-or-update contract.
  *  - `insertRows` streams a partition through
  *    `POST /projects/{p}/datasets/{d}/tables/{t}/insertAll`,
  *    batched (`batchRows`) so a 100-TB partition never materializes
  *    a request body; rows arrive as JSON objects and embed verbatim
  *    as each entry's `json` field.
  *
  * Scale/fault posture: the transport serializes as configuration
  * only — each executor lazily builds its own HttpClient; 429 and
  * 5xx responses (and connect/IO errors) retry with exponential
  * backoff like the reference's sink retries, anything else fails
  * the task (Spark's task retry + the lsn-guard idempotence upstream
  * make redelivery safe). `token` supplies the `Authorization:
  * Bearer` credential per request (pluggable: a metadata-server
  * fetcher in production, a constant in tests) and must be a
  * serializable closure.
  *
  * Offline verification: HttpBigQueryTransportSpec drives the full
  * sink (DDL + distributed insert + truncate + retry) against a
  * loopback `com.sun.net.httpserver` fake; pointing `endpoint` at
  * `https://bigquery.googleapis.com/bigquery/v2` is the production
  * binding, exercised nowhere in this sandbox because it has no
  * network egress.
  */
final class HttpBigQueryTransport(
    endpoint: String,
    projectId: String,
    datasetId: String,
    token: () => String,
    maxRetries: Int = 4,
    batchRows: Int = 500) extends BigQueryTransport {

  @transient private lazy val client: java.net.http.HttpClient =
    java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(20)).build()

  private def jsonStr(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  private def post(path: String, body: String): Unit = {
    var attempt = 0
    var done = false
    while (!done) {
      val outcome: Either[String, Int] =
        try {
          val req = java.net.http.HttpRequest.newBuilder()
            .uri(java.net.URI.create(s"$endpoint$path"))
            .header("Authorization", s"Bearer ${token()}")
            .header("Content-Type", "application/json")
            .POST(java.net.http.HttpRequest.BodyPublishers.ofString(
              body, java.nio.charset.StandardCharsets.UTF_8))
            .build()
          val resp = client.send(req,
            java.net.http.HttpResponse.BodyHandlers.ofString())
          Right(resp.statusCode())
        } catch {
          case e: java.io.IOException => Left(e.getMessage)
          case e: InterruptedException => throw e
        }
      outcome match {
        case Right(code) if code / 100 == 2 => done = true
        case Right(code) if code != 429 && code / 100 != 5 =>
          throw new java.io.IOException(
            s"BigQuery POST $path failed with non-retryable HTTP $code")
        case failed =>
          attempt += 1
          if (attempt > maxRetries) throw new java.io.IOException(
            s"BigQuery POST $path failed after $maxRetries retries: " +
              failed.fold(identity, c => s"HTTP $c"))
          Thread.sleep(100L << (attempt - 1))
      }
    }
  }

  private def runDdl(sql: String): Unit =
    post(s"/projects/$projectId/queries",
      s"""{"query":${jsonStr(sql)},"useLegacySql":false}""")

  override def ensureTable(meta: BqTableMeta, ddl: String): Unit =
    runDdl(ddl)

  override def ensureView(meta: BqTableMeta): Unit =
    runDdl(BigQueryMapping.ddl(datasetId, meta))

  override def insertRows(table: String, rows: Iterator[String]): Unit =
    rows.grouped(batchRows).foreach { batch =>
      val body = batch.map(r => s"""{"json":$r}""")
        .mkString("""{"kind":"bigquery#tableDataInsertAllRequest","rows":[""",
          ",", "]}")
      post(s"/projects/$projectId/datasets/$datasetId/tables/$table/insertAll",
        body)
    }
}
