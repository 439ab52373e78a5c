package graft.api

import java.sql.{Connection, DriverManager}
import java.util.Properties

import graft.model.TableRef

/** Live publication membership DDL over JDBC — the reference's
  * `ALTER PUBLICATION ... ADD/DROP TABLE` under an advisory lock
  * (pkg/subscription/publication.go:111-196), re-expressed against a
  * portable registry table so any JDBC database can hold it (the
  * Postgres publication catalog is engine-specific; the semantics —
  * serialized reconcile converging the published set onto the watched
  * set — are not).
  *
  * Schema (created on demand):
  * {{{
  *   publications(publication, schema_name, table_name)   -- membership
  *   publication_locks(publication PRIMARY KEY)           -- lock rows
  * }}}
  *
  * [[reconcile]] runs in ONE transaction holding `SELECT ... FOR
  * UPDATE` on the publication's lock row — the advisory-lock
  * analogue: concurrent reconciles of the same publication serialize
  * at the database, each sees the previous committed membership, and
  * a crash mid-reconcile rolls back atomically (the reference gets
  * the same from `pg_advisory_lock` + DDL transactionality).
  */
final class JdbcPublicationStore(url: String,
    props: Properties = new Properties) {

  private def connect(): Connection = {
    val c = DriverManager.getConnection(url, props)
    c.setAutoCommit(false)
    c.setTransactionIsolation(Connection.TRANSACTION_READ_COMMITTED)
    c
  }

  /** Idempotently create the registry tables. */
  def ensureSchema(): Unit = withConn { conn =>
    val st = conn.createStatement()
    def createIfMissing(ddl: String): Unit =
      try { st.execute(ddl); conn.commit() }
      catch { case _: java.sql.SQLException => conn.rollback() } // exists
    createIfMissing(
      """CREATE TABLE publications (
        |  publication VARCHAR(128) NOT NULL,
        |  schema_name VARCHAR(128) NOT NULL,
        |  table_name  VARCHAR(128) NOT NULL,
        |  PRIMARY KEY (publication, schema_name, table_name))""".stripMargin)
    createIfMissing(
      "CREATE TABLE publication_locks (publication VARCHAR(128) PRIMARY KEY)")
  }

  /** Current membership, ordered for determinism. */
  def published(publication: String): Seq[TableRef] = withConn { conn =>
    val ps = conn.prepareStatement(
      "SELECT schema_name, table_name FROM publications " +
        "WHERE publication = ? ORDER BY schema_name, table_name")
    ps.setString(1, publication)
    val rs = ps.executeQuery()
    val out = Seq.newBuilder[TableRef]
    while (rs.next()) out += TableRef(rs.getString(1), rs.getString(2))
    out.result()
  }

  /** Converge the published set onto `watched` in one serialized
    * transaction. Returns (added, removed) in deterministic order.
    */
  def reconcile(publication: String,
      watched: Seq[TableRef]): (Seq[TableRef], Seq[TableRef]) = withConn { conn =>
    takeLock(conn, publication)
    val current = membership(conn, publication)
    val toAdd = TableRef.diff(watched, current)
      .sortBy(t => (t.schema, t.name))
    val toRemove = TableRef.diff(current, watched)
      .sortBy(t => (t.schema, t.name))
    insertAll(conn, publication, toAdd)
    deleteAll(conn, publication, toRemove)
    (toAdd, toRemove)
  }

  /** Add ONE table under the publication lock — the reference's
    * AddTable session: get tables, no-op if already published, else
    * set (api/subscriptions.go:51-80). The check and the insert share
    * the transaction, so concurrent adders serialize instead of
    * last-writer-wins clobbering each other. Returns the resulting
    * membership. */
  def addTable(publication: String, t: TableRef): Seq[TableRef] = withConn { conn =>
    takeLock(conn, publication)
    val current = membership(conn, publication)
    if (!current.contains(t)) insertAll(conn, publication, Seq(t))
    (current :+ t).distinct.sortBy(x => (x.schema, x.name))
  }

  /** Remove ONE table under the publication lock — the membership half
    * of the reference's StopTable (api/subscriptions.go:82-126); the
    * caller expires outstanding import jobs BEFORE invoking this,
    * matching the reference's ordering ("better to block and fail here
    * than remove from publication, which can't be rolled back").
    * No-op when the table isn't published. Returns the resulting
    * membership. */
  def removeTable(publication: String, t: TableRef): Seq[TableRef] = withConn { conn =>
    takeLock(conn, publication)
    val current = membership(conn, publication)
    if (current.contains(t)) deleteAll(conn, publication, Seq(t))
    current.filterNot(_ == t).sortBy(x => (x.schema, x.name))
  }

  /** Advisory-lock analogue: ensure the lock row exists, then take it
    * FOR UPDATE — a second session blocks here until commit. */
  private def takeLock(conn: Connection, publication: String): Unit = {
    val ins = conn.prepareStatement(
      "INSERT INTO publication_locks VALUES (?)")
    ins.setString(1, publication)
    try ins.executeUpdate()
    catch { case _: java.sql.SQLIntegrityConstraintViolationException =>
      () // lock row already present
    }
    val lock = conn.prepareStatement(
      "SELECT publication FROM publication_locks WHERE publication = ? FOR UPDATE")
    lock.setString(1, publication)
    lock.executeQuery().next()
  }

  private def membership(conn: Connection, publication: String): Seq[TableRef] = {
    val ps = conn.prepareStatement(
      "SELECT schema_name, table_name FROM publications WHERE publication = ?")
    ps.setString(1, publication)
    val rs = ps.executeQuery()
    val out = Seq.newBuilder[TableRef]
    while (rs.next()) out += TableRef(rs.getString(1), rs.getString(2))
    out.result()
  }

  private def insertAll(conn: Connection, publication: String,
      ts: Seq[TableRef]): Unit = {
    val add = conn.prepareStatement("INSERT INTO publications VALUES (?, ?, ?)")
    ts.foreach { t =>
      add.setString(1, publication); add.setString(2, t.schema)
      add.setString(3, t.name); add.addBatch()
    }
    add.executeBatch()
    ()
  }

  private def deleteAll(conn: Connection, publication: String,
      ts: Seq[TableRef]): Unit = {
    val del = conn.prepareStatement(
      "DELETE FROM publications WHERE publication = ? AND schema_name = ? " +
        "AND table_name = ?")
    ts.foreach { t =>
      del.setString(1, publication); del.setString(2, t.schema)
      del.setString(3, t.name); del.addBatch()
    }
    del.executeBatch()
    ()
  }

  private def withConn[T](body: Connection => T): T = {
    val conn = connect()
    try {
      val r = body(conn)
      conn.commit()
      r
    } catch {
      case e: Throwable => try conn.rollback() finally (); throw e
    } finally conn.close()
  }
}
