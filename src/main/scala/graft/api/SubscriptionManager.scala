package graft.api

import java.sql.Timestamp

import graft.jobs.ImportJobStore
import graft.model.TableRef

/** The subscription actions behind the REST layer — the reference's
  * subscriptions service (api/subscriptions.go:31-126): read the
  * published set, add a table, stop a table. Pluggable so tests and
  * deployments wire their own registry/job-store.
  */
trait SubscriptionService {
  def id: String
  def published(): Seq[TableRef]
  /** Idempotent add; returns the resulting membership. */
  def addTable(t: TableRef): Seq[TableRef]
  /** Expire outstanding imports, then remove; returns the resulting
    * membership. */
  def stopTable(t: TableRef): Seq[TableRef]
}

/** Production wiring: JDBC publication registry + import-job store.
  * `stopTable` expires the table's outstanding import jobs BEFORE
  * touching publication membership — the reference's ordering, since
  * membership removal can't be rolled back once committed
  * (api/subscriptions.go:87-97).
  */
final class SubscriptionManager(
    store: JdbcPublicationStore,
    publication: String,
    jobs: ImportJobStore,
    now: () => Timestamp = () => new Timestamp(System.currentTimeMillis()))
  extends SubscriptionService {

  override def id: String = publication
  override def published(): Seq[TableRef] = store.published(publication)
  override def addTable(t: TableRef): Seq[TableRef] =
    store.addTable(publication, t)
  override def stopTable(t: TableRef): Seq[TableRef] = {
    jobs.expire(t, now())
    store.removeTable(publication, t)
  }
}
