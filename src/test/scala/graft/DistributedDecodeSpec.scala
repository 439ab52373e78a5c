package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.model.PgTypes
import graft.sources.PgOutput
import graft.sources.PgOutput._
import graft.streaming.{DistributedDecode, GenericPlane}

class DistributedDecodeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val relDogs = Relation(16001L, "public", "dogs", 'd'.toByte, Seq(
    RelationColumn(key = true, "id", PgTypes.Int8, -1),
    RelationColumn(key = false, "name", PgTypes.Text, -1)))
  private val relDogsV2 = Relation(16001L, "public", "dogs", 'd'.toByte, Seq(
    RelationColumn(key = true, "id", PgTypes.Int8, -1),
    RelationColumn(key = false, "name", PgTypes.Text, -1),
    RelationColumn(key = false, "toy", PgTypes.Text, -1)))
  private val relCats = Relation(16002L, "public", "cats", 'd'.toByte, Seq(
    RelationColumn(key = true, "id", PgTypes.Int8, -1),
    RelationColumn(key = false, "lives", PgTypes.Int4, -1)))

  private def tup(cells: (Char, String)*): TupleData = TupleData(cells.map {
    case ('t', v) => Element('t', Some(v.getBytes("UTF-8")))
    case (k, _) => Element(k.toByte, None)
  })

  /** A two-transaction log with a mid-stream schema change, nulls,
    * an unchanged-TOAST cell, and two tables. */
  private def frames: Seq[Array[Byte]] = Seq(
    encodeRelation(relDogs),
    encodeRelation(relCats),
    encodeBegin(Begin(1000L, 777000000L, 1L)),
    encodeInsert(Insert(16001L, tup('t' -> "1", 't' -> "rex"))),
    encodeInsert(Insert(16002L, tup('t' -> "9", 't' -> "9"))),
    encodeUpdate(Update(16001L, None, None,
      tup('t' -> "1", 'u' -> ""))), // unchanged-TOAST name
    encodeCommit(Commit(0, 1000L, 1001L, 777000001L)),
    encodeBegin(Begin(2000L, 888000000L, 2L)),
    encodeDelete(Delete(16002L, 'K'.toByte, tup('t' -> "9", 'n' -> ""))),
    encodeRelation(relDogsV2), // schema change mid-transaction
    encodeInsert(Insert(16001L,
      tup('t' -> "2", 't' -> "fido", 't' -> "ball"))),
    encodeInsert(Insert(16001L, tup('t' -> "3", 'n' -> "", 't' -> "bone"))),
    encodeCommit(Commit(0, 2000L, 2001L, 888000001L)))

  private def driverRows: Seq[Row] = {
    val entries = graft.sources.ChangelogBuilder
      .build(frames.iterator.map(PgOutput.decode)).toVector
    val mods = entries.collect {
      case m: graft.sources.ChangelogBuilder.ModificationEntry => m
    }
    GenericPlane.toGeneric(spark, mods).collect().toSeq
  }

  private def canon(rows: Seq[Row]) =
    rows.map(_.toSeq.map {
      case m: Map[_, _] => m.toSeq.sortBy(_._1.toString).toString
      case v => String.valueOf(v)
    }).sortBy(_.toString)

  test("distributed decode equals the ordered driver path (single batch)") {
    val d = new DistributedDecode
    val batch = frames.zipWithIndex.map { case (f, i) => (i.toLong, f) }
      .toDF("position", "frame")
    val (schemas, out) = d.processBatch(spark, batch)
    assert(schemas.map(_.schema.ref.qualified) ==
      Seq("public.dogs", "public.cats", "public.dogs"))
    assert(schemas.last.schema.columns.map(_.name) == Seq("id", "name", "toy"))
    assert(canon(out.collect().toSeq) == canon(driverRows))
  }

  test("distributed decode equals the driver path when a transaction spans batches") {
    val d = new DistributedDecode
    val all = frames.zipWithIndex.map { case (f, i) => (i.toLong, f) }
    // split inside txn 2: delete + schema change land in batch 1, the
    // inserts + commit in batch 2 — sequence numbers must continue
    val (b1, b2) = all.splitAt(10)
    val (_, out1) = d.processBatch(spark, b1.toDF("position", "frame"))
    val r1 = out1.collect().toSeq // consume before state advances
    val (_, out2) = d.processBatch(spark, b2.toDF("position", "frame"))
    assert(canon(r1 ++ out2.collect().toSeq) == canon(driverRows))
  }

  test("distributed streaming pipeline: frames -> generic plane -> ack") {
    import java.nio.file.Files
    def tmp() = Files.createTempDirectory("graft-ddq").toString
    val dir = tmp(); val ckpt = tmp(); val plane = tmp()
    graft.sources.PgOutputFrameLog.append(dir, "seg-000", frames)
    val watermark = new graft.streaming.CdcPipeline.AckWatermark
    val q = DistributedDecode.start(spark, dir, plane, watermark, ckpt,
      flushInterval = "1 seconds")
    try q.processAllAvailable() finally q.stop()

    assert(watermark.position.contains(2000L)) // txn 2's commit lsn
    val raw = GenericPlane.raw(spark, plane)
    assert(raw.count() == 6) // 3 + 3 modifications across both txns
    // latest state of dogs out of the generic plane, typed
    val dogs = GenericPlane.latestRows(spark, plane, "public", "dogs",
        Seq("id"), Map("id" -> org.apache.spark.sql.types.LongType,
          "name" -> org.apache.spark.sql.types.StringType))
      .select($"id", $"name").as[(Long, Option[String])].collect().toMap
    assert(dogs == Map(1L -> None, 2L -> Some("fido"), 3L -> None))
  }

  test("row frames decode in executors, not on the driver") {
    val d = new DistributedDecode
    val batch = frames.zipWithIndex.map { case (f, i) => (i.toLong, f) }
      .toDF("position", "frame").repartition(4)
    val (_, out) = d.processBatch(spark, batch)
    // the modification path is a distributed plan — the decode runs
    // as MapPartitions over the frame rows, not as a parallelize of a
    // driver-collected array (which would plan as only ExistingRDD,
    // the FrameStreamPipeline shape)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("MapPartitions"), s"decode not distributed:\n$plan")
    assert(plan.contains("Exchange"), "per-txn sequencing must shuffle on the txn id")
  }
}
