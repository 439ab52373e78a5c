package graft

import java.nio.file.Files
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.model.{PgTypes, TableSchema}
import graft.sinks.{InsertResult, SchemaOutcome, Sink}
import graft.sources._
import graft.streaming.{CdcPipeline, FrameStreamPipeline}

/** Time-compressed soak of the ROUTED multi-table pipeline — the
  * pooled per-table concurrent-insert path (FrameStreamPipeline's
  * shared 8-thread pool), which the r11 socket soak did not cover:
  * that soak proved transport + log; this one proves the flush
  * epoch's fan-out over hundreds of epochs with 8 tables and ONE
  * table artificially slow.
  *
  * Asserts, per epoch and in aggregate:
  *  - acks never overtake the slow table's flush: the watermark must
  *    not ADVANCE while the slow table's insert is in flight — the
  *    epoch's confirm is the only confirm and it must wait for every
  *    insert (deterministic per epoch, not a sampling race). The
  *    invariant is deliberately NOT "wm < this batch's max lsn":
  *    admission slices by frame count, so a transaction can straddle
  *    two epochs and its early rows' LSN is legitimately confirmed by
  *    the earlier epoch — safe, because durability rides the frame
  *    log (appended before any ack), not the remote ack;
  *  - exactly-once per (table, lsn): no loss AND no replay
  *    double-insert across the whole run;
  *  - the watermark ends exactly at the last transaction's LSN;
  *  - pool reuse: after hundreds of epochs the process still holds at
  *    most the pool's 8 `graft-table-insert-*` threads — per-epoch
  *    executor churn would leak a thread set per epoch.
  */
class RoutedPipelineSoakSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import PgOutput._

  def tmp(): String = Files.createTempDirectory("graft-rsoak").toString

  private val nTables = 8
  private val relations = (1 to nTables).map { i =>
    Relation(i.toLong, "public", s"t$i", 'd'.toByte, Seq(
      RelationColumn(key = true, "id", PgTypes.Int8, -1),
      RelationColumn(key = false, "v", PgTypes.Text, -1)))
  }
  private def cell(v: String) = Element('t'.toByte, Some(v.getBytes("UTF-8")))

  /** Sink that records every (table, lsn) it lands, sleeps on the
    * slow table, and asserts the overtake invariant at insert time. */
  private final class RecordingSink(slowTable: String, slowMs: Long,
      wm: CdcPipeline.AckWatermark) extends Sink {
    val landed = new ConcurrentHashMap[(String, Long), Integer]()
    @volatile var overtakes: List[String] = Nil

    override def handleSchema(schema: TableSchema): SchemaOutcome =
      SchemaOutcome.Update
    override def insert(table: TableSchema, batch: DataFrame): InsertResult =
      fail("routed path must use insertCounted (fold already known)")
    override def insertCounted(table: TableSchema, batch: DataFrame,
        known: InsertResult): InsertResult = {
      val name = table.ref.qualified
      if (name == slowTable) {
        // the epoch's confirm is the ONLY confirm and must wait for
        // every insert: the watermark advancing while this insert is
        // asleep means the ack overtook an in-flight flush
        val before = wm.position
        Thread.sleep(slowMs)
        val after = wm.position
        if (before != after)
          overtakes ::= s"ack advanced $before -> $after while $name's " +
            s"insert (lsns ${known.lsn}) was in flight"
      }
      // LocalRelation batch: executeCollect is driver-local, no job
      batch.select("lsn").collect().foreach { r =>
        landed.merge((name, r.getLong(0)), Integer.valueOf(1),
          (a, b) => Integer.valueOf(a.intValue + b.intValue))
      }
      known
    }
    override def truncate(table: TableSchema, at: java.sql.Timestamp,
        lsn: Option[Long], sequence: Option[Long]): Unit = ()
  }

  test("routed 8-table pipeline: 250 epochs with one slow table — acks never overtake, exactly-once, pool reused") {
    val frameDir = tmp(); val ckpt = tmp()
    val nTxns = 250
    val framesPerTxn = 2 + nTables // begin + 8 inserts + commit
    // segment 0 additionally carries the 8 relation frames
    (0 until nTxns).grouped(50).zipWithIndex.foreach { case (txns, seg) =>
      val frames = txns.flatMap { i =>
        val lsn = 1000L + i
        Seq(encodeBegin(Begin(lsn, 0L, i.toLong))) ++
          relations.map(r => encodeInsert(Insert(r.id,
            TupleData(Seq(cell(i.toString), cell(s"v$i-${r.name}")))))) ++
          Seq(encodeCommit(Commit(0, lsn, lsn + 1, 0L)))
      }
      val withRels =
        if (seg == 0) relations.map(encodeRelation) ++ frames else frames
      PgOutputFrameLog.append(frameDir, f"seg-$seg%03d", withRels)
    }

    val wm = new CdcPipeline.AckWatermark
    val sink = new RecordingSink("public.t8", slowMs = 2L, wm)
    // one txn per flush epoch (relations ride epoch 1's admission),
    // trigger 0 → epochs run back-to-back
    val q = FrameStreamPipeline.start(spark, frameDir, sink, wm, ckpt,
      "0 seconds", maxFramesPerTrigger = Some(framesPerTxn.toLong))
    try q.processAllAvailable() finally q.stop()

    assert(sink.overtakes.isEmpty,
      s"ack overtook the slow table: ${sink.overtakes.take(3)}")
    assert(wm.position.contains(1000L + nTxns - 1),
      s"watermark ${wm.position} != last txn lsn ${1000L + nTxns - 1}")
    // exactly-once per (table, lsn): 8 tables × 250 txns, each once
    import scala.jdk.CollectionConverters._
    val counts = sink.landed.asScala
    assert(counts.size == nTables * nTxns,
      s"expected ${nTables * nTxns} (table, lsn) cells, got ${counts.size}")
    val dupes = counts.filter(_._2.intValue != 1)
    assert(dupes.isEmpty, s"replayed inserts: ${dupes.take(3)}")
    relations.foreach { r =>
      (0 until nTxns).foreach { i =>
        assert(counts.contains((s"public.${r.name}", 1000L + i)),
          s"lost: public.${r.name} lsn ${1000L + i}")
      }
    }
    // pool reuse: the shared 8-thread pool, not per-epoch executors
    val poolThreads = Thread.getAllStackTraces.keySet.asScala
      .filter(_.getName.startsWith("graft-table-insert-"))
    assert(poolThreads.size <= 8,
      s"insert pool leaked: ${poolThreads.map(_.getName)}")
  }
}
