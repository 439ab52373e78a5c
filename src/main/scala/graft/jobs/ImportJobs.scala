package graft.jobs

import java.sql.Timestamp
import graft.model.TableRef

/** The import-job queue: one row per (subscription, table) snapshot,
  * with resumable cursor, retry bookkeeping, and expiry — the columns
  * replicate the reference's `pgsink.import_jobs` table
  * (reference: structure.sql:36-50).
  */
final case class ImportJob(
    id: Long,
    subscriptionId: String,
    tableRef: TableRef,
    cursor: Option[String] = None,
    completedAt: Option[Timestamp] = None,
    expiredAt: Option[Timestamp] = None,
    error: Option[String] = None,
    errorCount: Int = 0,
    lastErrorAt: Option[Timestamp] = None,
    rowsProcessedTotal: Long = 0)

/** Single-driver job manager + worker semantics. The reference runs
  * this as SQL against Postgres with `FOR UPDATE SKIP LOCKED`
  * (pkg/imports/worker.go:139-200) and a 30s reconcile poll
  * (pkg/imports/manager.go:59-89); on one Spark driver the
  * coordination degrades to JVM synchronization, exactly as SURVEY
  * §7.1 plans. All predicates mirror the reference's SQL.
  */
final class ImportJobStore {
  private var jobs = Vector.empty[ImportJob]
  private var nextId = 1L
  private val locked = scala.collection.mutable.Set.empty[Long]

  /** Reconcile: create jobs for published tables with no live
    * (non-expired) job — published ∖ imported
    * (reference: pkg/imports/manager.go:93-128). */
  def reconcile(subscriptionId: String, published: Seq[TableRef],
      now: Timestamp): Seq[ImportJob] = synchronized {
    val live = jobs.filter(j => j.expiredAt.isEmpty).map(_.tableRef)
    val missing = TableRef.diff(published, live)
    val created = missing.map { t =>
      val j = ImportJob(nextId, subscriptionId, t)
      nextId += 1
      j
    }
    jobs ++= created
    created
  }

  /** Eligibility: not completed, not expired, and past the
    * exponential-backoff deadline
    * (reference: pkg/imports/worker.go:174-184). */
  def eligible(j: ImportJob, now: Timestamp,
      baseSeconds: Double = 5.0, exponent: Double = 3.0,
      maxSeconds: Double = 3600.0): Boolean =
    j.completedAt.isEmpty && j.expiredAt.isEmpty &&
      (j.errorCount < 1 || j.lastErrorAt.forall { at =>
        val backoff = math.min(maxSeconds,
          baseSeconds * math.pow(exponent, j.errorCount.toDouble))
        now.getTime > at.getTime + (backoff * 1000).toLong
      })

  /** Acquire one job, preferring never-errored jobs, skipping locked
    * rows — `ORDER BY error IS NULL DESC LIMIT 1 FOR UPDATE SKIP
    * LOCKED` (reference: pkg/imports/worker.go:185-187). */
  def acquire(now: Timestamp): Option[ImportJob] = synchronized {
    val candidate = jobs
      .filter(j => eligible(j, now) && !locked.contains(j.id))
      .sortBy(j => (j.error.isDefined, j.id))
      .headOption
    candidate.foreach(j => locked += j.id)
    candidate
  }

  /** Completion: cursor update, completed_at iff the scan finished
    * (not early-exited, short page), error reset, rows accumulated
    * (reference: pkg/imports/importer.go:133-166). */
  def complete(id: Long, cursor: Option[String], done: Boolean,
      rows: Long, now: Timestamp): Unit = synchronized {
    update(id)(j => j.copy(
      cursor = cursor,
      completedAt = if (done) Some(now) else j.completedAt,
      error = None, errorCount = 0, lastErrorAt = None,
      rowsProcessedTotal = j.rowsProcessedTotal + rows))
    locked -= id
  }

  /** Failure: record error, bump count — feeds the backoff
    * (reference: pkg/imports/worker.go:202-214). */
  def fail(id: Long, error: String, now: Timestamp): Unit = synchronized {
    update(id)(j => j.copy(error = Some(error),
      errorCount = j.errorCount + 1, lastErrorAt = Some(now)))
    locked -= id
  }

  /** Expire: the job no longer runs; a later reconcile may recreate
    * it. Matches the reference's UPDATE — every non-expired job for
    * the table, including completed ones, so a stopped table's
    * history reads `expired` (reference: api/subscriptions.go:128-150
    * `WHERE … expired_at IS NULL`). */
  def expire(table: TableRef, now: Timestamp): Unit = synchronized {
    jobs = jobs.map(j =>
      if (j.tableRef == table && j.expiredAt.isEmpty)
        j.copy(expiredAt = Some(now))
      else j)
  }

  def all: Seq[ImportJob] = synchronized(jobs)

  private def update(id: Long)(f: ImportJob => ImportJob): Unit =
    jobs = jobs.map(j => if (j.id == id) f(j) else j)
}
