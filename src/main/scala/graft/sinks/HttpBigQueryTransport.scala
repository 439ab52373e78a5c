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
  * Response bodies are CHECKED, not just status codes — BigQuery
  * reports per-row insert failures as HTTP 200 with an
  * `insertErrors` array, and jobs.query reports job failures as 200
  * with `errors` / `jobComplete:false`. The reference surfaces the
  * same rows via `Inserter().Put`'s PutMultiError
  * (pkg/sinks/bigquery/table.go:62); here a 200-with-insertErrors
  * fails the Spark task loudly, naming the failing row indices and
  * messages, so Spark's task retry + the lsn-guard idempotence
  * upstream decide redelivery — rows are never silently dropped.
  * An incomplete DDL job (`jobComplete:false`) is POLLED to
  * completion via jobs.getQueryResults on the RETURNED jobReference —
  * never resubmitted (a fresh jobs.query restarts the server wait
  * clock each attempt and piles up duplicate concurrent jobs, so a
  * DDL slower than one wait window would never be observed done).
  *
  * Scale/fault posture: the transport serializes as configuration
  * only — each executor lazily builds its own HttpClient; 429 and
  * 5xx responses (and connect/IO errors) retry with exponential
  * backoff like the reference's sink retries, anything else fails
  * the task. `token` supplies the `Authorization: Bearer` credential
  * per request (pluggable: [[MetadataServerTokenSource]] in
  * production, a constant in tests) and must be a serializable
  * closure.
  *
  * Offline verification: HttpBigQueryTransportSpec drives the full
  * sink (DDL + distributed insert + truncate + retry + the
  * 200-with-insertErrors and jobs.query error/incomplete paths)
  * against a loopback `com.sun.net.httpserver` fake; pointing
  * `endpoint` at `https://bigquery.googleapis.com/bigquery/v2` is
  * the production binding, exercised nowhere in this sandbox because
  * it has no network egress.
  */
final class HttpBigQueryTransport(
    endpoint: String,
    projectId: String,
    datasetId: String,
    token: () => String,
    maxRetries: Int = 4,
    batchRows: Int = 500,
    maxPollSecs: Long = 600L,
    pollIntervalMillis: Long = 500L) extends BigQueryTransport {

  import HttpBigQueryTransport._

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

  /** One POST attempt: Left(transient message) on IO error, Right on
    * any HTTP response. */
  private def sendPost(path: String,
      body: String): Either[String, (Int, String)] =
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
      Right((resp.statusCode(), resp.body()))
    } catch {
      case e: java.io.IOException => Left(e.getMessage)
      case e: InterruptedException => throw e
    }

  /** Status-level triage shared by every POST path: 2xx → run the
    * body check; 429/5xx → Left (transient, caller backs off);
    * anything else → fail the task. */
  private def triage(path: String, outcome: Either[String, (Int, String)],
      check: String => BodyVerdict): Either[String, BodyVerdict] =
    outcome match {
      case Right((code, respBody)) if code / 100 == 2 =>
        Right(check(respBody))
      case Right((code, respBody)) if code != 429 && code / 100 != 5 =>
        throw new java.io.IOException(
          s"BigQuery POST $path failed with non-retryable HTTP $code: " +
            respBody.take(500))
      case Right((code, _)) => Left(s"HTTP $code")
      case Left(io) => Left(io)
    }

  /** One shared backoff step for the POST retry loops: returns the
    * incremented attempt count, or fails the task once the budget is
    * spent — one definition, so the two loops' retry policy cannot
    * diverge. */
  private def backoffOrFail(path: String, attempt: Int, msg: String): Int = {
    val next = attempt + 1
    if (next > maxRetries) throw new java.io.IOException(
      s"BigQuery POST $path failed after $maxRetries retries: $msg")
    Thread.sleep(100L << (next - 1))
    next
  }

  /** POST with status- AND body-level checking. A 2xx response still
    * runs `check` over the body: `BodyFail` fails the task
    * immediately (schema mismatches / invalid rows are not
    * transient), `BodyRetry` re-enters the backoff loop (incomplete
    * idempotent DDL jobs). `BodyRetryRows` is a contract violation
    * here — only the insertAll loop (which can rebuild a smaller
    * body) knows how to honor it. Returns the statement's DML row
    * count when the completed response carried one. */
  private def post(path: String, body: String,
      check: String => BodyVerdict): Option[Long] = {
    var attempt = 0
    while (true) {
      triage(path, sendPost(path, body), check) match {
        case Right(BodyOk) => return None
        case Right(BodyOkRows(n)) => return Some(n)
        case Right(BodyFail(msg)) =>
          throw new java.io.IOException(
            s"BigQuery POST $path returned 2xx but failed: $msg")
        case Right(BodyPoll(jobId, location)) =>
          return pollQueryResults(jobId, location)
        case Right(BodyRetry(msg)) =>
          attempt = backoffOrFail(path, attempt, msg)
        case Right(BodyRetryRows(_, msg)) =>
          throw new IllegalStateException(
            s"BigQuery POST $path: row-level retry verdict outside the " +
              s"insertAll loop: $msg")
        case Left(msg) => attempt = backoffOrFail(path, attempt, msg)
      }
    }
    None
  }

  /** jobs.getQueryResults for an accepted-but-incomplete job: GET the
    * SAME jobId (server-side wait) until `jobComplete:true`. A
    * still-running job is NOT an error — it waits against the
    * `maxPollSecs` deadline, not the transient-error retry budget
    * (counting healthy polls against maxRetries would fail a slow
    * DDL after ~5 polls and push the caller right back into the
    * duplicate-resubmission pileup this path exists to prevent).
    * Only 429/5xx/IO spend `maxRetries`. Never resubmits — one job,
    * observed to completion, the reference client's wait semantics.
    * Returns the completed statement's DML row count when present. */
  private def pollQueryResults(jobId: String,
      location: Option[String]): Option[Long] = {
    val path = s"/projects/$projectId/queries/$jobId" +
      location.map(l => s"?location=$l").getOrElse("")
    val deadline = System.nanoTime() + maxPollSecs * 1000000000L
    var attempt = 0
    while (true) {
      val outcome: Either[String, (Int, String)] =
        try {
          val req = java.net.http.HttpRequest.newBuilder()
            .uri(java.net.URI.create(s"$endpoint$path"))
            .header("Authorization", s"Bearer ${token()}")
            .GET().build()
          val resp = client.send(req,
            java.net.http.HttpResponse.BodyHandlers.ofString())
          Right((resp.statusCode(), resp.body()))
        } catch {
          case e: java.io.IOException => Left(e.getMessage)
          case e: InterruptedException => throw e
        }
      val verdict: Either[String, BodyVerdict] = outcome match {
        case Right((code, respBody)) if code / 100 == 2 =>
          Right(checkQueryResponse(respBody))
        case Right((code, respBody)) if code != 429 && code / 100 != 5 =>
          throw new java.io.IOException(
            s"BigQuery GET $path failed with non-retryable HTTP $code: " +
              respBody.take(500))
        case Right((code, _)) => Left(s"HTTP $code")
        case Left(io) => Left(io)
      }
      verdict match {
        case Right(BodyOk) => return None
        case Right(BodyOkRows(n)) => return Some(n)
        case Right(BodyFail(msg)) =>
          throw new java.io.IOException(
            s"BigQuery GET $path returned 2xx but failed: $msg")
        case Right(_) =>
          // healthy, still running (or an unparseable poll body —
          // re-polling the same job is the safe read): wait on the
          // deadline clock
          if (System.nanoTime() > deadline) throw new java.io.IOException(
            s"BigQuery job $jobId still incomplete after ${maxPollSecs}s")
          Thread.sleep(pollIntervalMillis)
        case Left(msg) =>
          attempt += 1
          if (attempt > maxRetries) throw new java.io.IOException(
            s"BigQuery GET $path failed after $maxRetries retries: $msg")
          Thread.sleep(100L << (attempt - 1))
      }
    }
    None
  }

  /** Run one Standard-SQL STATEMENT (DDL or DML) through jobs.query,
    * observed to completion, returning `numDmlAffectedRows` when the
    * response carries one (DML; DDL returns None) — the reference
    * sink's rowsAffected surface. Row-RETURNING queries are outside
    * this transport's contract: a completed response carrying a
    * pageToken fails loudly (results would otherwise be silently
    * truncated to the first page). */
  def runStatement(sql: String): Option[Long] =
    post(s"/projects/$projectId/queries",
      s"""{"query":${jsonStr(sql)},"useLegacySql":false}""",
      checkQueryResponse)

  override def ensureTable(meta: BqTableMeta, ddl: String): Unit = {
    runStatement(ddl); ()
  }

  override def ensureView(meta: BqTableMeta): Unit = {
    runStatement(BigQueryMapping.ddl(datasetId, meta)); ()
  }

  override def insertRows(table: String, rows: Iterator[String]): Unit =
    rows.grouped(batchRows).foreach(batch =>
      insertBatch(table, batch.toIndexedSeq))

  /** One insertAll batch with PER-ROW retry: a 200 whose
    * `insertErrors` carry only TRANSIENT reasons (`timeout`,
    * `backendError`, `internalError`, `rateLimitExceeded`, plus
    * `stopped` — rows aborted because a sibling failed) resends ONLY
    * the failed subset under the existing backoff budget, the
    * canonical client's behavior; any PERMANENT reason (`invalid`,
    * schema mismatch, …) fails the task naming the rows — retrying an
    * invalid row can never succeed, and silently dropping it would
    * un-deliver data. Resending only failed rows cannot duplicate:
    * rows named in `insertErrors` were NOT inserted (and rows outside
    * it were), so the resend's content is exactly the not-yet-
    * delivered remainder. Indices in each response are relative to
    * the body JUST sent, so the pending list re-indexes every round.
    */
  private def insertBatch(table: String, batch: IndexedSeq[String]): Unit = {
    val path =
      s"/projects/$projectId/datasets/$datasetId/tables/$table/insertAll"
    var pending = batch
    var attempt = 0
    var done = false
    while (!done) {
      val body = pending.map(r => s"""{"json":$r}""")
        .mkString("""{"kind":"bigquery#tableDataInsertAllRequest","rows":[""",
          ",", "]}")
      triage(path, sendPost(path, body), checkInsertResponse) match {
        case Right(BodyOk) => done = true
        case Right(BodyFail(msg)) =>
          throw new java.io.IOException(
            s"BigQuery POST $path returned 2xx but failed: $msg")
        case Right(BodyRetryRows(indices, msg)) =>
          attempt = backoffOrFail(path, attempt, msg)
          // checkInsertResponse guarantees a non-empty index list for
          // this verdict, but a server echoing ANY index past the sent
          // batch poisons the whole mapping: the in-range subset may
          // not be the full set of not-inserted rows, so resending
          // only it would silently un-deliver the row behind the bad
          // index. Fall back to the idempotent full-batch resend
          // (pending unchanged) exactly as the index-less case does —
          // upstream dedup-at-read absorbs the replay.
          if (indices.forall(i => i >= 0 && i < pending.size))
            pending = indices.map(pending).toIndexedSeq
        case Right(BodyRetry(msg)) =>
          attempt = backoffOrFail(path, attempt, msg)
        case Right(_: BodyPoll) | Right(_: BodyOkRows) =>
          // not insertAll verdicts: declaring the batch delivered on
          // them would be a silent drop — fail the contract loudly,
          // the post() treatment of ITS unreachable verdict
          throw new IllegalStateException(
            s"BigQuery POST $path: query-path verdict on an insertAll response")
        case Left(msg) => attempt = backoffOrFail(path, attempt, msg)
      }
    }
  }
}

object HttpBigQueryTransport {

  /** Outcome of inspecting a 2xx response body. */
  private[sinks] sealed trait BodyVerdict
  private[sinks] case object BodyOk extends BodyVerdict
  /** Completed jobs.query/getQueryResults carrying
    * `numDmlAffectedRows` — a DML statement's row count, surfaced to
    * [[HttpBigQueryTransport.runStatement]] callers. */
  private[sinks] final case class BodyOkRows(rows: Long) extends BodyVerdict
  private[sinks] final case class BodyFail(msg: String) extends BodyVerdict
  private[sinks] final case class BodyRetry(msg: String) extends BodyVerdict
  /** jobComplete:false WITH a jobReference: the job is accepted and
    * still running — poll jobs.getQueryResults for THAT job instead
    * of resubmitting a fresh one (resubmission restarts the server
    * wait clock every attempt and piles up duplicate concurrent
    * jobs; a DDL slower than one jobs.query wait would then never be
    * observed completing). */
  private[sinks] final case class BodyPoll(jobId: String,
      location: Option[String]) extends BodyVerdict
  /** insertAll 200 whose failed rows ALL carry transient reasons:
    * resend exactly these indices (relative to the body just sent)
    * under the backoff budget. Only [[HttpBigQueryTransport.insertBatch]]
    * can honor this — it owns the row list the indices point into. */
  private[sinks] final case class BodyRetryRows(indices: Seq[Int],
      msg: String) extends BodyVerdict

  /** Per-row `reason` values live BigQuery reports for rows that
    * failed for host-side (retriable) causes, per the insertAll docs
    * and the canonical client's retry predicate; `stopped` marks rows
    * aborted because a sibling row failed — not inserted, safe to
    * resend. Anything else (`invalid`, `notFound`, …) is a property
    * of the ROW and can never succeed on retry. */
  private[sinks] val TransientRowReasons: Set[String] =
    Set("timeout", "backendError", "internalError", "rateLimitExceeded",
      "stopped")

  import org.json4s._
  import org.json4s.jackson.JsonMethods

  private def parseOrNone(body: String): Option[JValue] =
    try Some(JsonMethods.parse(body)) catch { case _: Exception => None }

  /** insertAll: HTTP 200 with a non-empty `insertErrors` array means
    * those rows were NOT inserted. Split on each error's `reason`:
    * if EVERY failed row carries only transient reasons
    * ([[TransientRowReasons]]), return [[BodyRetryRows]] so the
    * insert loop resends just that subset; any permanent reason fails
    * the task with the row indices and messages (first 5) so the
    * error names the cure. An unparseable 2xx body (proxy HTML, a
    * truncated stream) is NOT success — the insert has no body-level
    * evidence — so it re-enters the backoff loop (the request is a
    * full-batch resend, idempotent upstream via the lsn guard). */
  private[sinks] def checkInsertResponse(body: String): BodyVerdict =
    parseOrNone(body) match {
      case None =>
        BodyRetry("insertAll returned 2xx with an unparseable body")
      case Some(j) => j \ "insertErrors" match {
        case JArray(errs) if errs.nonEmpty =>
          def idxOf(e: JValue): Int = e \ "index" match {
            case JInt(i) => i.toInt
            case JLong(i) => i.toInt
            case _ => -1
          }
          def reasonsOf(e: JValue): Seq[String] = e \ "errors" match {
            case JArray(es) => es.flatMap { x =>
              x \ "reason" match {
                case JString(r) => Some(r)
                case _ => None
              }
            }
            case _ => Seq.empty
          }
          def msgsOf(e: JValue): String = e \ "errors" match {
            case JArray(es) => es.flatMap { x =>
              x \ "message" match {
                case JString(m) => Some(m)
                case _ => None
              }
            }.mkString("; ")
            case _ => ""
          }
          // an entry with NO reason field is indistinguishable from
          // permanent — failing loudly beats resending a row the
          // server may consider invalid forever
          val permanent = errs.filter(e => reasonsOf(e).isEmpty ||
            reasonsOf(e).exists(!TransientRowReasons.contains(_)))
          if (permanent.nonEmpty) {
            val detail = permanent.take(5).map { e =>
              val idx = idxOf(e) match {
                case -1 => "?"
                case i => i.toString
              }
              s"row $idx: ${msgsOf(e)}"
            }.mkString(" | ")
            BodyFail(s"insertAll returned ${permanent.size} permanent " +
              s"insertErrors of ${errs.size} (rows were NOT inserted): " +
              detail)
          } else {
            val indices = errs.map(idxOf).filter(_ >= 0).distinct.sorted
            // a transient entry WITHOUT an index cannot be mapped to a
            // row — dropping it would silently un-deliver data (the
            // missing-reason principle above, applied to the index).
            // The full-batch resend is safe: rows outside insertErrors
            // were inserted, and upstream dedup-at-read absorbs the
            // at-least-once replay, same as the unparseable-2xx path.
            if (indices.size < errs.size)
              BodyRetry(s"insertAll returned ${errs.size} transient " +
                s"insertErrors but only ${indices.size} carried row " +
                "indices — resending the full batch")
            else BodyRetryRows(indices,
              s"insertAll returned ${errs.size} transient insertErrors " +
                s"(reasons: ${errs.flatMap(reasonsOf).distinct.sorted
                  .mkString(",")})")
          }
        case _ => BodyOk
      }
    }

  /** jobs.query / jobs.getQueryResults: 200 with `errors` fails;
    * `jobComplete:false` polls the RETURNED job (BodyPoll) — the
    * response carries a jobReference for exactly this purpose — and
    * only falls back to resubmission (BodyRetry; the DDL is
    * idempotent) if a jobReference is somehow absent. */
  private[sinks] def checkQueryResponse(body: String): BodyVerdict =
    parseOrNone(body) match {
      case Some(j) =>
        j \ "errors" match {
          case JArray(errs) if errs.nonEmpty =>
            val detail = errs.take(5).flatMap { e =>
              e \ "message" match {
                case JString(m) => Some(m)
                case _ => None
              }
            }.mkString(" | ")
            BodyFail(s"jobs.query returned ${errs.size} errors: $detail")
          case _ => j \ "jobComplete" match {
            case JBool(false) =>
              j \ "jobReference" \ "jobId" match {
                case JString(id) =>
                  BodyPoll(id, j \ "jobReference" \ "location" match {
                    case JString(l) => Some(l)
                    case _ => None
                  })
                case _ => BodyRetry("jobComplete=false")
              }
            case _ =>
              // completed. This transport's query path is
              // STATEMENT-ONLY (DDL/DML): it never reads result rows,
              // so a completed response carrying a pageToken means a
              // row-returning query was issued whose further pages
              // would be silently dropped — fail the contract loudly
              // instead (the BodyPoll-outside-insertAll treatment).
              // DML row counts (numDmlAffectedRows — an int64 BigQuery
              // serializes as a JSON string) surface to runStatement.
              j \ "pageToken" match {
                case JString(tok) if tok.nonEmpty =>
                  BodyFail("jobs.query returned a multi-page result " +
                    "(pageToken present): this transport's query path " +
                    "is statement-only (DDL/DML) and never pages " +
                    "result rows")
                case _ => j \ "numDmlAffectedRows" match {
                  // a malformed count is a body defect, not a crash:
                  // surface it as BodyFail with context like every
                  // other malformed-body case, instead of throwing
                  // NumberFormatException out of the inspection layer
                  case JString(n) => scala.util.Try(n.toLong) match {
                    case scala.util.Success(v) => BodyOkRows(v)
                    case scala.util.Failure(_) => BodyFail(
                      s"unparseable numDmlAffectedRows: '$n'")
                  }
                  case JInt(n) => BodyOkRows(n.toLong)
                  case JLong(n) => BodyOkRows(n)
                  case _ => BodyOk
                }
              }
          }
        }
      // an unparseable 2xx body is not evidence the job succeeded —
      // resubmit (the DDL is idempotent) rather than assume done
      case None => BodyRetry("jobs.query returned 2xx with an unparseable body")
    }
}

/** Metadata-server credential supplier for [[HttpBigQueryTransport]]
  * — the production shape of the reference's default-credentials
  * path (pkg/sinks/bigquery/sink.go:40-79, which leans on the cloud
  * SDK's application-default credentials). On GCE/GKE the instance
  * metadata server vends OAuth2 access tokens for the attached
  * service account at
  * `http://metadata.google.internal/computeMetadata/v1/instance/service-accounts/default/token`
  * (a GET with the mandatory `Metadata-Flavor: Google` header,
  * returning `{"access_token":…,"expires_in":…,"token_type":…}`).
  *
  * This class is that fetcher behind the transport's existing
  * `token: () => String` seam: serializable as configuration (URL +
  * margin only), with a per-JVM `@transient` cache so each executor
  * fetches lazily and refreshes `refreshMarginSecs` before expiry.
  * Production binding needs only the endpoint string (or none — the
  * default is the well-known metadata URL). */
final class MetadataServerTokenSource(
    url: String = MetadataServerTokenSource.DefaultUrl,
    refreshMarginSecs: Long = 60L) extends (() => String) with Serializable {

  @transient private var cachedToken: String = _
  @transient private var expiresAtEpochSec: Long = 0L

  @transient private lazy val client: java.net.http.HttpClient =
    java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(10)).build()

  override def apply(): String = synchronized {
    val now = System.currentTimeMillis() / 1000L
    if (cachedToken == null || now >= expiresAtEpochSec - refreshMarginSecs)
      fetch(now)
    cachedToken
  }

  private def fetch(now: Long): Unit = {
    val req = java.net.http.HttpRequest.newBuilder()
      .uri(java.net.URI.create(url))
      .header("Metadata-Flavor", "Google")
      .GET().build()
    val resp = client.send(req,
      java.net.http.HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() != 200)
      throw new java.io.IOException(
        s"metadata token fetch failed: HTTP ${resp.statusCode()} from $url")
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val j = JsonMethods.parse(resp.body())
    val tok = j \ "access_token" match {
      case JString(t) if t.nonEmpty => t
      case _ => throw new java.io.IOException(
        s"metadata token response from $url carried no access_token")
    }
    val ttl = j \ "expires_in" match {
      case JInt(s) => s.toLong
      case JLong(s) => s
      case JDouble(s) => s.toLong
      case _ => 0L
    }
    cachedToken = tok
    expiresAtEpochSec = now + ttl
  }
}

object MetadataServerTokenSource {
  /** The well-known GCE/GKE instance metadata token endpoint. */
  val DefaultUrl: String =
    "http://metadata.google.internal/computeMetadata/v1/instance/service-accounts/default/token"
}
