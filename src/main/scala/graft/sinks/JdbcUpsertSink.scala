package graft.sinks

import java.sql.{Connection, DriverManager}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.{Envelope, TableSchema}

/** Live-database UPSERT sink: maintains the LATEST STATE of every
  * table in an external JDBC database — the materialized form of the
  * warehouse sink's `latest view`, for serving stores that want rows,
  * not changelogs (the reference's BigQuery sink streams the
  * changelog and serves a view; pkg/sinks/bigquery/table.go:28-63 —
  * this sink is the same contract with the dedup applied at WRITE
  * time because a row store has no view layer).
  *
  * Correctness under at-least-once delivery rests on two moves:
  *
  *  1. The batch REDUCES BEFORE it writes: one window keeps only each
  *     key's final modification (changelog order: timestamp, lsn,
  *     sequence), so the database sees one statement per key per
  *     batch however many times the key changed inside it.
  *  2. Every write carries a VERSION GUARD — `UPDATE … WHERE pk = ?
  *     AND _lsn <= ?` (insert-on-miss; a newer resident row makes the
  *     insert hit the duplicate key, which is swallowed) — so
  *     replaying a batch is a no-op rather than a regression, and a
  *     stale update can never overwrite a newer row. Deletes are
  *     guarded the same way but leave NO tombstone: the sink assumes
  *     the pipeline's checkpointed monotone replay (a batch replays
  *     only until its successor commits — the frame-source contract),
  *     which is what makes tombstone-free deletes safe.
  *
  * Writes run per partition with one connection and one transaction
  * per partition — the standard Spark JDBC shape: parallelism =
  * partitions, each commit atomic, a failed partition retries whole
  * and the guards make the retry idempotent.
  */
final class JdbcUpsertSink(url: String) extends Sink {

  private val handler = new SchemaHandler(ensureTable)

  override def handleSchema(schema: TableSchema): SchemaOutcome =
    handler.handle(schema)

  override def insert(table: TableSchema, batch: DataFrame): InsertResult = {
    val result = InsertResult.of(batch.cache())
    val pks = table.primaryKeys
    require(pks.size == 1, s"JdbcUpsertSink needs a single-column PK, got $pks")
    val pk = pks.head
    val payloadCols = table.payloadStruct.fields.map(_.name).toSeq
    val image = coalesce(col(Envelope.AfterCol), col(Envelope.BeforeCol))
    val rowPos = struct(col(Envelope.TimestampCol),
      coalesce(col(Envelope.LsnCol), lit(Long.MaxValue)),
      coalesce(col(Envelope.SequenceCol), lit(Long.MaxValue)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_pk")).orderBy(col("_pos").desc)
    val finals = batch
      .select(col(Envelope.OperationCol).as("_op"),
        coalesce(col(Envelope.LsnCol), lit(0L)).as("_lsn"),
        rowPos.as("_pos"), image.as("_img"))
      .withColumn("_pk", col(s"_img.$pk"))
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
      .select(Seq(col("_op"), col("_lsn")) ++
        payloadCols.map(c => col(s"_img.$c").as(c)): _*)
    val tbl = sqlName(table)
    val colList = payloadCols
    val jdbcUrl = url
    finals.foreachPartition { (rows: Iterator[Row]) =>
      val conn = DriverManager.getConnection(jdbcUrl)
      try {
        conn.setAutoCommit(false)
        rows.foreach(r => JdbcUpsertSink.applyRow(conn, tbl, pk, colList, r))
        conn.commit()
      } catch {
        case e: Throwable => conn.rollback(); throw e
      } finally conn.close()
    }
    batch.unpersist()
    result
  }

  override def truncate(table: TableSchema, at: java.sql.Timestamp,
      lsn: Option[Long], sequence: Option[Long]): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.prepareStatement(
        s"""DELETE FROM ${sqlName(table)} WHERE "_lsn" <= ?""")
      try {
        st.setLong(1, lsn.getOrElse(Long.MaxValue))
        st.executeUpdate(); ()
      } finally st.close()
    } finally conn.close()
  }

  private def sqlName(t: TableSchema): String =
    s""""${t.namespace}_${t.name}""""

  /** Create-if-absent + add-missing-columns DDL (the SchemaHandler
    * fingerprint gate means this runs once per schema VERSION). */
  private def ensureTable(schema: TableSchema): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val tbl = sqlName(schema)
      val pk = schema.primaryKeys.headOption.getOrElse(
        sys.error(s"no PK for ${schema.ref.qualified}"))
      val exists = {
        val rs = conn.getMetaData.getTables(null, null,
          s"${schema.namespace}_${schema.name}", null)
        try rs.next() finally rs.close()
      }
      val st = conn.createStatement()
      try {
        if (!exists) {
          val colDefs = schema.payloadStruct.fields.map { f =>
            s""""${f.name}" ${sqlType(f.dataType)}""" +
              (if (f.name == pk) " NOT NULL" else "")
          }.mkString(", ")
          st.executeUpdate(
            s"""CREATE TABLE $tbl ($colDefs, "_lsn" BIGINT,
               | PRIMARY KEY ("$pk"))""".stripMargin)
        } else {
          // evolution: add any column the live table lacks
          val have = {
            val rs = conn.getMetaData.getColumns(null, null,
              s"${schema.namespace}_${schema.name}", null)
            val b = Seq.newBuilder[String]
            try while (rs.next()) b += rs.getString("COLUMN_NAME")
            finally rs.close()
            b.result().map(_.toLowerCase).toSet
          }
          schema.payloadStruct.fields
            .filterNot(f => have.contains(f.name.toLowerCase))
            .foreach { f =>
              st.executeUpdate(
                s"""ALTER TABLE $tbl ADD COLUMN "${f.name}" ${sqlType(f.dataType)}""")
            }
        }
      } finally st.close()
    } finally conn.close()
  }

  private def sqlType(dt: DataType): String = dt match {
    case LongType => "BIGINT"
    case IntegerType => "INTEGER"
    case DoubleType => "DOUBLE"
    case FloatType => "REAL"
    case BooleanType => "BOOLEAN"
    case TimestampType | TimestampNTZType => "TIMESTAMP"
    case DateType => "DATE"
    case _ => "VARCHAR(4000)"
  }
}

object JdbcUpsertSink {

  /** One guarded statement per final row: DELETE with the version
    * guard, or update-first upsert. Static so the partition closure
    * captures only strings — never the sink (whose SchemaHandler is
    * not serializable). */
  private[sinks] def applyRow(conn: Connection, tbl: String, pk: String,
      cols: Seq[String], r: Row): Unit = {
    val op = r.getString(0)
    val lsn = r.getLong(1)
    val pkIdx = 2 + cols.indexOf(pk)
    if (op == "DELETE") {
      val st = conn.prepareStatement(
        s"""DELETE FROM $tbl WHERE "$pk" = ? AND "_lsn" <= ?""")
      try {
        st.setObject(1, r.get(pkIdx)); st.setLong(2, lsn)
        st.executeUpdate(); ()
      } finally st.close()
    } else {
      val sets = cols.filterNot(_ == pk)
      val upd = conn.prepareStatement(
        s"""UPDATE $tbl SET ${sets.map(c => s""""$c" = ?""").mkString(", ")},
           | "_lsn" = ? WHERE "$pk" = ? AND "_lsn" <= ?""".stripMargin)
      val updated =
        try {
          sets.zipWithIndex.foreach { case (c, i) =>
            upd.setObject(i + 1, r.get(2 + cols.indexOf(c)))
          }
          upd.setLong(sets.size + 1, lsn)
          upd.setObject(sets.size + 2, r.get(pkIdx))
          upd.setLong(sets.size + 3, lsn)
          upd.executeUpdate()
        } finally upd.close()
      if (updated == 0) {
        // either the key is absent (insert) or a NEWER version holds
        // the row (the guard failed — then the insert must not fire).
        // Distinguish with a SELECT in the SAME transaction before
        // inserting: Postgres aborts the open transaction on a failed
        // INSERT, so the old insert-then-swallow-duplicate-key path
        // would kill the whole partition transaction on the one DB
        // family this sink is modeled after. The duplicate-key catch
        // below remains as a backstop for the residual race (a
        // concurrent writer landing between SELECT and INSERT) and
        // matches SQLState — 23505 (Postgres/Derby unique violation)
        // or the 23xxx integrity class (MySQL/Oracle report 23000) —
        // because drivers like PostgreSQL's PSQLException are plain
        // SQLException subclasses, invisible to a class match. The
        // INSERT runs under a SAVEPOINT: on Postgres a failed INSERT
        // aborts the OPEN transaction (every later statement dies
        // with 25P02), so swallowing the duplicate without rolling
        // back to the savepoint would kill the partition's remaining
        // rows and pay a task retry for a race the lsn guard already
        // makes idempotent.
        val present = {
          val sel = conn.prepareStatement(
            s"""SELECT 1 FROM $tbl WHERE "$pk" = ?""")
          try {
            sel.setObject(1, r.get(pkIdx))
            val rs = sel.executeQuery()
            try rs.next() finally rs.close()
          } finally sel.close()
        }
        if (!present) {
          val sp = conn.setSavepoint()
          val ins = conn.prepareStatement(
            s"""INSERT INTO $tbl (${cols.map(c => s""""$c"""").mkString(", ")},
               | "_lsn") VALUES (${cols.map(_ => "?").mkString(", ")}, ?)"""
              .stripMargin)
          try {
            cols.zipWithIndex.foreach { case (c, i) =>
              ins.setObject(i + 1, r.get(2 + cols.indexOf(c)))
            }
            ins.setLong(cols.size + 1, lsn)
            ins.executeUpdate()
            conn.releaseSavepoint(sp)
          } catch {
            case e: java.sql.SQLException
                if e.getSQLState != null && e.getSQLState.startsWith("23") =>
              conn.rollback(sp)
          } finally ins.close()
        }
      }
    }
  }
}
