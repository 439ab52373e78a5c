package graft

import java.sql.DriverManager

import org.scalatest.funsuite.AnyFunSuite

import graft.model._
import graft.sinks._

/** The live-database upsert sink against embedded Derby: latest-state
  * rows, version-guarded idempotence, delete semantics, and
  * add-column schema evolution — the serving-store complement to the
  * warehouse sink's changelog + view.
  */
class JdbcUpsertSinkSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val url = "jdbc:derby:memory:graftupsert;create=true"

  private val schema = TableSchema(7, "public", "acct", Seq(
    ColumnSpec("id", PgTypes.Int8, key = true),
    ColumnSpec("msg", PgTypes.Text)))

  /** Envelope batch builder: (ts, lsn, seq, op, id, msg) — the
    * SinkSpec fixture shape. */
  private def sinkSpecEnvelopes(
      rows: (String, Option[Long], Option[Long], String, Long, String)*) = {
    import org.apache.spark.sql.types._
    val payload = StructType(Seq(
      StructField("id", LongType), StructField("msg", StringType)))
    val data = rows.map { case (ts, lsn, seq, op, id, msg) =>
      val img = new org.apache.spark.sql.catalyst.expressions.GenericRow(
        Array[Any](id, msg))
      org.apache.spark.sql.Row(
        java.sql.Timestamp.valueOf(ts), lsn.orNull, seq.orNull, op,
        if (op == "INSERT" || op == "IMPORT") null else img,
        if (op == "DELETE") null else img)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(data.toSeq),
      Envelope.schemaFor(payload))
  }

  private def stateOf(table: String = "public_acct",
      valueCol: String = "msg"): Map[Long, (String, Long)] = {
    val conn = DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement().executeQuery(
        s"""SELECT "id", "$valueCol", "_lsn" FROM "$table"""")
      val b = Map.newBuilder[Long, (String, Long)]
      while (rs.next()) b += rs.getLong(1) -> ((rs.getString(2), rs.getLong(3)))
      b.result()
    } finally conn.close()
  }

  test("insert, update, delete land as latest state; replay and stale writes are no-ops") {
    val sink = new JdbcUpsertSink(url)
    assert(sink.handleSchema(schema) == SchemaOutcome.Update)

    // batch 1: two inserts + an in-batch update of id 1 — the batch
    // reduces, the database sees one row per key
    val b1 = sinkSpecEnvelopes(
      ("2024-01-01 10:00:00", Some(100L), Some(1L), "INSERT", 1L, "a"),
      ("2024-01-01 10:00:00", Some(100L), Some(2L), "UPDATE", 1L, "a2"),
      ("2024-01-01 10:00:01", Some(101L), Some(1L), "INSERT", 2L, "b"))
    val r1 = sink.insert(schema, b1)
    assert(r1 == InsertResult(3, Some(101L)))
    assert(stateOf() == Map(1L -> (("a2", 100L)), 2L -> (("b", 101L))))

    // batch 2: update id 2, delete id 1
    val b2 = sinkSpecEnvelopes(
      ("2024-01-01 10:01:00", Some(200L), Some(1L), "UPDATE", 2L, "b2"),
      ("2024-01-01 10:01:00", Some(200L), Some(2L), "DELETE", 1L, "a2"))
    sink.insert(schema, b2)
    assert(stateOf() == Map(2L -> (("b2", 200L))))

    // replaying batch 2 changes nothing (at-least-once safety)
    sink.insert(schema, b2)
    assert(stateOf() == Map(2L -> (("b2", 200L))))

    // a stale straggler (older lsn for id 2) must not regress the row
    val stale = sinkSpecEnvelopes(
      ("2024-01-01 10:00:30", Some(150L), Some(1L), "UPDATE", 2L, "OLD"))
    sink.insert(schema, stale)
    assert(stateOf() == Map(2L -> (("b2", 200L))))

    // truncate at the current position clears state
    sink.truncate(schema, java.sql.Timestamp.valueOf("2024-01-01 10:02:00"),
      Some(200L), None)
    assert(stateOf() == Map.empty)
  }

  test("binary CDC frames stream end-to-end into the live database") {
    import graft.sources._
    import graft.sources.PgOutput._
    import graft.streaming.{CdcPipeline, FrameStreamPipeline}
    def tmp() = java.nio.file.Files.createTempDirectory("graft-jdbc-pipe").toString
    val rel = Relation(1L, "public", "pets", 'd'.toByte, Seq(
      RelationColumn(key = true, "id", PgTypes.Int8, -1),
      RelationColumn(key = false, "name", PgTypes.Text, -1)))
    def cell(v: String) = Element('t'.toByte, Some(v.getBytes("UTF-8")))
    def ins(id: Long, name: String) =
      encodeInsert(Insert(1L, TupleData(Seq(cell(id.toString), cell(name)))))
    def upd(id: Long, name: String) =
      encodeUpdate(Update(1L, Some('K'.toByte),
        Some(TupleData(Seq(cell(id.toString), Element('n'.toByte, None)))),
        TupleData(Seq(cell(id.toString), cell(name)))))
    def del(id: Long) =
      encodeDelete(Delete(1L, 'K'.toByte,
        TupleData(Seq(cell(id.toString), Element('n'.toByte, None)))))

    val frameDir = tmp(); val ckpt = tmp()
    val sink = new JdbcUpsertSink(url)
    val wm = new CdcPipeline.AckWatermark
    PgOutputFrameLog.append(frameDir, "seg-000",
      Seq(encodeBegin(Begin(100L, 0L, 1L)), encodeRelation(rel),
        ins(1L, "rex"), ins(2L, "whiskers"),
        encodeCommit(Commit(0, 100L, 101L, 0L))))
    val q1 = FrameStreamPipeline.start(spark, frameDir, sink, wm, ckpt, "1 seconds")
    try q1.processAllAvailable() finally q1.stop()
    assert(stateOf("public_pets", "name").view.mapValues(_._1).toMap ==
      Map(1L -> "rex", 2L -> "whiskers"))

    // epoch 2: update + delete through a restarted query
    PgOutputFrameLog.append(frameDir, "seg-001",
      Seq(encodeBegin(Begin(200L, 0L, 2L)), encodeRelation(rel),
        upd(1L, "rex II"), del(2L),
        encodeCommit(Commit(0, 200L, 201L, 0L))))
    val q2 = FrameStreamPipeline.start(spark, frameDir, sink, wm, ckpt, "1 seconds")
    try q2.processAllAvailable() finally q2.stop()
    assert(stateOf("public_pets", "name").view.mapValues(_._1).toMap ==
      Map(1L -> "rex II"))
  }

  test("schema evolution adds the new column to the live table") {
    val sink = new JdbcUpsertSink(url)
    val t2 = TableSchema(8, "public", "evolve", Seq(
      ColumnSpec("id", PgTypes.Int8, key = true),
      ColumnSpec("msg", PgTypes.Text)))
    assert(sink.handleSchema(t2) == SchemaOutcome.Update)
    val evolved = t2.copy(columns =
      t2.columns :+ ColumnSpec("extra", PgTypes.Text))
    assert(sink.handleSchema(evolved) == SchemaOutcome.Update)
    val conn = DriverManager.getConnection(url)
    try {
      val rs = conn.getMetaData.getColumns(null, null, "public_evolve", null)
      val cols = Iterator.continually(rs)
        .takeWhile(_.next()).map(_.getString("COLUMN_NAME")).toSet
      assert(cols.map(_.toLowerCase) == Set("id", "msg", "extra", "_lsn"))
    } finally conn.close()
  }
}
