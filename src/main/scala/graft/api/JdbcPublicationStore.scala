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
    // advisory-lock analogue: ensure the lock row exists, then take it
    // FOR UPDATE — second reconciler blocks here until commit
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

    val current = {
      val ps = conn.prepareStatement(
        "SELECT schema_name, table_name FROM publications WHERE publication = ?")
      ps.setString(1, publication)
      val rs = ps.executeQuery()
      val out = Seq.newBuilder[TableRef]
      while (rs.next()) out += TableRef(rs.getString(1), rs.getString(2))
      out.result()
    }
    val toAdd = TableRef.diff(watched, current)
      .sortBy(t => (t.schema, t.name))
    val toRemove = TableRef.diff(current, watched)
      .sortBy(t => (t.schema, t.name))

    val add = conn.prepareStatement(
      "INSERT INTO publications VALUES (?, ?, ?)")
    toAdd.foreach { t =>
      add.setString(1, publication); add.setString(2, t.schema)
      add.setString(3, t.name); add.addBatch()
    }
    add.executeBatch()
    val del = conn.prepareStatement(
      "DELETE FROM publications WHERE publication = ? AND schema_name = ? " +
        "AND table_name = ?")
    toRemove.foreach { t =>
      del.setString(1, publication); del.setString(2, t.schema)
      del.setString(3, t.name); del.addBatch()
    }
    del.executeBatch()
    (toAdd, toRemove)
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
