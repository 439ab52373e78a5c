package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

import graft.model.PgTypes
import graft.sinks.WarehouseSink
import graft.sources._
import graft.streaming.{CdcPipeline, FrameStreamPipeline}

/** End-to-end streaming CDC: binary frames → DSv2 source → decode →
  * warehouse raw → latest view, across multiple flush epochs with the
  * relation cache carried between them.
  */
class FrameStreamPipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  import PgOutput._

  def tmp(): String = Files.createTempDirectory("graft-pipe").toString

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

  test("frames stream end-to-end into the warehouse latest view across epochs") {
    val frameDir = tmp(); val ckpt = tmp(); val wh = tmp()
    val sink = new WarehouseSink(spark, wh)
    val wm = new CdcPipeline.AckWatermark

    // epoch 1: relation + two inserts in one txn
    PgOutputFrameLog.append(frameDir, "seg-000",
      Seq(encodeBegin(Begin(100L, 0L, 1L)), encodeRelation(rel),
        ins(1L, "rex"), ins(2L, "whiskers"),
        encodeCommit(Commit(0, 100L, 101L, 0L))))
    val q1 = FrameStreamPipeline.start(spark, frameDir, sink, wm, ckpt, "1 seconds")
    try q1.processAllAvailable() finally q1.stop()
    assert(wm.position.contains(100L))

    // epoch 2 (restarted query, same checkpoint): update + delete,
    // NO relation re-emit — schema must come from the builder cache.
    // Note: a restarted driver would replay the relation (the
    // reference re-reads it from the slot); here the builder instance
    // is fresh per start(), so re-emit the relation like a real
    // reconnect does.
    PgOutputFrameLog.append(frameDir, "seg-001",
      Seq(encodeBegin(Begin(200L, 0L, 2L)), encodeRelation(rel),
        upd(1L, "rex II"), del(2L),
        encodeCommit(Commit(0, 200L, 201L, 0L))))
    val q2 = FrameStreamPipeline.start(spark, frameDir, sink, wm, ckpt, "1 seconds")
    try q2.processAllAvailable() finally q2.stop()
    assert(wm.position.contains(200L))

    val table = graft.model.TableSchema(1L, "public", "pets", Seq(
      graft.model.ColumnSpec("id", PgTypes.Int8, key = true),
      graft.model.ColumnSpec("name", PgTypes.Text)))
    val latest = sink.latestView(table)
      .select("id", "name").as[(Long, String)].collect().toMap
    assert(latest == Map(1L -> "rex II"))
    // raw keeps full history: 2 inserts + 1 update + 1 delete
    assert(sink.raw(table).count() == 4)
  }

  test("multi-table frames route to separate raw tables in one epoch") {
    val frameDir = tmp(); val ckpt = tmp(); val wh = tmp()
    val sink = new WarehouseSink(spark, wh)
    val wm = new CdcPipeline.AckWatermark
    val rel2 = Relation(2L, "public", "owners", 'd'.toByte, Seq(
      RelationColumn(key = true, "id", PgTypes.Int8, -1),
      RelationColumn(key = false, "email", PgTypes.Varchar, -1)))
    PgOutputFrameLog.append(frameDir, "seg-000",
      Seq(encodeBegin(Begin(300L, 0L, 3L)),
        encodeRelation(rel), encodeRelation(rel2),
        ins(10L, "buddy"),
        encodeInsert(Insert(2L, TupleData(Seq(cell("7"), cell("a@b.c"))))),
        encodeCommit(Commit(0, 300L, 301L, 0L))))
    val q = FrameStreamPipeline.start(spark, frameDir, sink, wm, ckpt, "1 seconds")
    try q.processAllAvailable() finally q.stop()

    val pets = graft.model.TableSchema(1L, "public", "pets", Seq(
      graft.model.ColumnSpec("id", PgTypes.Int8, key = true),
      graft.model.ColumnSpec("name", PgTypes.Text)))
    val owners = graft.model.TableSchema(2L, "public", "owners", Seq(
      graft.model.ColumnSpec("id", PgTypes.Int8, key = true),
      graft.model.ColumnSpec("email", PgTypes.Varchar)))
    assert(sink.latestView(pets).count() == 1)
    assert(sink.latestView(owners)
      .select("email").as[String].collect().toSeq == Seq("a@b.c"))
    assert(wm.position.contains(300L))
  }

  test("retainLog drops segments behind the read position as epochs advance") {
    val frameDir = tmp(); val ckpt = tmp(); val wh = tmp()
    val sink = new WarehouseSink(spark, wh)
    val wm = new CdcPipeline.AckWatermark
    // two 5-frame transactions in two segments; maxFramesPerTrigger=5
    // forces one epoch per segment, so epoch 2's start position (5)
    // lets retention drop segment 0
    def seg(name: String, lsn: Long, a: Long, b: Long): Unit =
      PgOutputFrameLog.append(frameDir, name,
        Seq(encodeBegin(Begin(lsn, 0L, lsn)), encodeRelation(rel),
          ins(a, s"pet$a"), ins(b, s"pet$b"),
          encodeCommit(Commit(0, lsn, lsn + 1, 0L))))
    seg("seg-000", 100L, 1L, 2L)
    seg("seg-001", 200L, 3L, 4L)
    val q = FrameStreamPipeline.start(spark, frameDir, sink, wm, ckpt,
      "1 seconds", maxFramesPerTrigger = Some(5L), retainLog = true)
    try q.processAllAvailable() finally q.stop()
    assert(wm.position.contains(200L))

    // segment 0 is gone, the floor records its 5 frames, and the
    // warehouse kept everything that flowed through
    assert(!new java.io.File(frameDir, "seg-000").exists())
    assert(PgOutputFrameLog.retainInfo(frameDir) == (5L, "seg-000"))
    assert(PgOutputFrameLog.frameCount(frameDir) == 10L)
    val pets = graft.model.TableSchema(1L, "public", "pets", Seq(
      graft.model.ColumnSpec("id", PgTypes.Int8, key = true),
      graft.model.ColumnSpec("name", PgTypes.Text)))
    assert(sink.latestView(pets).count() == 4)

    // the same checkpoint keeps consuming new segments after retention
    seg("seg-002", 300L, 5L, 6L)
    val q2 = FrameStreamPipeline.start(spark, frameDir, sink, wm, ckpt,
      "1 seconds", maxFramesPerTrigger = Some(5L), retainLog = true)
    try q2.processAllAvailable() finally q2.stop()
    assert(wm.position.contains(300L))
    assert(sink.latestView(pets).count() == 6)
    // and the floor advanced past segment 1
    assert(PgOutputFrameLog.retainInfo(frameDir) == (10L, "seg-001"))
  }
}
