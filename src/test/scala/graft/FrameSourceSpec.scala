package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

import graft.model.PgTypes
import graft.sources._

class FrameSourceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  import PgOutput._

  def tmp(): String = Files.createTempDirectory("graft-frames").toString

  val rel = Relation(1L, "public", "one", 'd'.toByte, Seq(
    RelationColumn(key = true, "id", PgTypes.Int8, -1),
    RelationColumn(key = false, "msg", PgTypes.Text, -1)))
  def cell(v: String) = Element('t'.toByte, Some(v.getBytes("UTF-8")))
  def txn(lsn: Long, inserts: (Long, String)*): Seq[Array[Byte]] =
    encodeBegin(Begin(lsn, 0L, lsn)) +:
      encodeRelation(rel) +:
      inserts.map { case (id, msg) =>
        encodeInsert(Insert(1L, TupleData(Seq(cell(id.toString), cell(msg)))))
      } :+ encodeCommit(Commit(0, lsn, lsn + 1, 0L))

  test("maxFramesPerTrigger bounds each micro-batch (backpressure)") {
    val dir = tmp(); val ckpt = tmp()
    PgOutputFrameLog.append(dir, "seg-000",
      txn(100L, 1L -> "a", 2L -> "b") ++ txn(200L, 3L -> "c", 4L -> "d"))
    val total = PgOutputFrameLog.frameCount(dir)
    val batchSizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream
      .format("graft.sources.PgOutputFrameSource")
      .option("path", dir)
      .option("maxFramesPerTrigger", "3")
      .load()
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batchSizes.synchronized { batchSizes += batch.count() }
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(batchSizes.sum == total)
    assert(batchSizes.forall(_ <= 3), s"batches exceeded limit: $batchSizes")
    assert(batchSizes.length >= (total / 3).toInt)
  }

  test("Trigger.AvailableNow drains the backlog in bounded batches, then stops") {
    val dir = tmp(); val ckpt = tmp()
    PgOutputFrameLog.append(dir, "seg-000",
      txn(100L, 1L -> "a", 2L -> "b") ++ txn(200L, 3L -> "c", 4L -> "d"))
    val backlog = PgOutputFrameLog.frameCount(dir)
    val batchSizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    def drain(): Unit = {
      val q = spark.readStream
        .format("graft.sources.PgOutputFrameSource")
        .option("path", dir)
        .option("maxFramesPerTrigger", "3")
        .load()
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batchSizes.synchronized { batchSizes += batch.count() }
          ()
        }
        .start()
      // AvailableNow terminates on its own once the captured backlog
      // is drained — the "catch up then exit" operational mode
      assert(q.awaitTermination(60000), "query did not self-terminate")
    }
    drain()
    assert(batchSizes.sum == backlog)
    assert(batchSizes.forall(_ <= 3), s"batches exceeded limit: $batchSizes")
    assert(batchSizes.length >= (backlog / 3).toInt, "admission bound ignored")

    // frames appended later are NOT part of the finished run; a second
    // AvailableNow run resumes from the checkpoint and takes only them
    PgOutputFrameLog.append(dir, "seg-001", txn(300L, 5L -> "e"))
    val added = PgOutputFrameLog.frameCount(dir) - backlog
    batchSizes.clear()
    drain()
    assert(batchSizes.sum == added, s"second run must take only the new frames: $batchSizes")
  }

  test("a segment torn mid-record (writer crash) hides the torn frame, not the stream") {
    val dir = tmp()
    val frames = txn(100L, 1L -> "a", 2L -> "b") // 5 frames
    PgOutputFrameLog.append(dir, "seg-000", frames)
    val full = PgOutputFrameLog.frameCount(dir)
    assert(full == frames.size.toLong)

    // tear the tail: chop the last frame's body short (crash mid-write)
    val f = new java.io.File(dir, "seg-000")
    val chan = new java.io.RandomAccessFile(f, "rw")
    try chan.setLength(f.length() - 2) finally chan.close()

    // the torn frame is invisible — counted out and never delivered
    assert(PgOutputFrameLog.frameCount(dir) == full - 1)
    val read = PgOutputFrameLog.readRange(dir, 0, full)
    assert(read.length == (full - 1).toInt)
    assert(read.toSeq.map(_.toSeq) == frames.dropRight(1).map(_.toSeq))

    // new complete segments after the torn one still deliver
    PgOutputFrameLog.append(dir, "seg-001", txn(200L, 3L -> "c"))
    val total = PgOutputFrameLog.frameCount(dir)
    assert(total == full - 1 + 4)
    assert(PgOutputFrameLog.readRange(dir, 0, total).length == total.toInt)
  }

  test("append truncates a predecessor's torn tail and rejects renumbering names") {
    val dir = tmp()
    val frames = txn(100L, 1L -> "a") // 4 frames
    PgOutputFrameLog.append(dir, "seg-000", frames)
    val f = new java.io.File(dir, "seg-000")
    val intact = f.length()
    // crash mid-write of a 5th frame: header + partial body
    val out = new java.io.DataOutputStream(
      new java.io.FileOutputStream(f, true))
    try { out.writeInt(100); out.write(Array[Byte](1, 2, 3)) }
    finally out.close()
    assert(PgOutputFrameLog.frameCount(dir) == frames.size.toLong)

    // recovery appends the next segment: the torn bytes must be CUT,
    // not left to complete later — a completed tail would renumber
    // every later position and break checkpointed offsets
    PgOutputFrameLog.append(dir, "seg-001", txn(200L, 2L -> "b"))
    assert(f.length() == intact, "torn tail must be truncated on recovery")
    assert(PgOutputFrameLog.frameCount(dir) == frames.size.toLong + 4)

    // names that sort at-or-before the live tail renumber history (or
    // silently overwrite a segment): refused
    assertThrows[IllegalArgumentException](
      PgOutputFrameLog.append(dir, "seg-001", txn(300L, 3L -> "c")))
    assertThrows[IllegalArgumentException](
      PgOutputFrameLog.append(dir, "seg-0001", txn(300L, 3L -> "c")))
  }

  test("segment-count cache: growth stays visible, range reads skip cached segments exactly") {
    val dir = tmp()
    // warm the cache on a multi-segment log
    val segs = (0 until 5).map { i =>
      val fs = txn(100L * (i + 1), (i * 2 + 1).toLong -> s"a$i",
        (i * 2 + 2).toLong -> s"b$i")
      PgOutputFrameLog.append(dir, f"seg-$i%03d", fs)
      fs
    }
    val total = PgOutputFrameLog.frameCount(dir)
    assert(total == segs.map(_.size).sum.toLong)
    // repeated polls (the latestOffset path) must serve from cache and
    // agree with the first count
    (0 until 3).foreach(_ => assert(PgOutputFrameLog.frameCount(dir) == total))

    // mid-log reads skip whole cached segments; every offset window
    // must equal the corresponding slice of the appended frames
    val all = segs.flatten
    Seq((0L, 3L), (5L, 11L), (total - 4, total), (0L, total)).foreach {
      case (s, e) =>
        val read = PgOutputFrameLog.readRange(dir, s, e)
        assert(read.toSeq.map(_.toSeq) ==
          all.slice(s.toInt, e.toInt).map(_.toSeq), s"range [$s,$e)")
    }

    // growth after caching is visible immediately (new segment) and
    // readable at the old high-water mark
    PgOutputFrameLog.append(dir, "seg-005", txn(900L, 99L -> "tail"))
    assert(PgOutputFrameLog.frameCount(dir) == total + 4)
    val tail = PgOutputFrameLog.readRange(dir, total, total + 4)
    assert(tail.length == 4)
  }

  test("retention drops acked segments; positions stay stable and readers below the floor fail loudly") {
    val dir = tmp()
    val segs = (0 until 5).map { i =>
      val fs = txn(100L * (i + 1), (i + 1).toLong -> s"m$i") // 4 frames each
      PgOutputFrameLog.append(dir, f"seg-$i%03d", fs)
      fs
    }
    val all = segs.flatten
    val total = PgOutputFrameLog.frameCount(dir)

    // drop everything strictly below position 9: only whole segments
    // go, so segments 0-1 (8 frames) are dropped, segment 2 survives
    val dropped = PgOutputFrameLog.retain(dir, 9L)
    assert(dropped == 8L)
    assert(PgOutputFrameLog.retainInfo(dir) == (8L, "seg-001"))
    assert(new java.io.File(dir, "seg-000").exists() == false)

    // positions are STABLE: the count still reports the full history
    // and reads at-or-past the floor return the same frames as before
    assert(PgOutputFrameLog.frameCount(dir) == total)
    val read = PgOutputFrameLog.readRange(dir, 8L, total)
    assert(read.toSeq.map(_.toSeq) == all.drop(8).map(_.toSeq))
    // a reader below the floor lost data: that must be an error, not
    // silently-shifted frames
    assertThrows[IllegalArgumentException](PgOutputFrameLog.readRange(dir, 7L, total))

    // retaining nothing new is a no-op; a mid-segment position keeps
    // the segment holding it
    assert(PgOutputFrameLog.retain(dir, 9L) == 0L)
    assert(PgOutputFrameLog.retain(dir, 10L) == 0L)

    // append ordering still honors DELETED history
    assertThrows[IllegalArgumentException](
      PgOutputFrameLog.append(dir, "seg-001", txn(999L, 9L -> "x")))

    // crash window: sidecar committed but a dropped file still on
    // disk (deletion interrupted) — readers must ignore it by name
    java.nio.file.Files.write(new java.io.File(dir, "seg-000").toPath,
      Array[Byte](0, 0, 0, 1, 42)) // a 1-byte frame, orphaned
    assert(PgOutputFrameLog.frameCount(dir) == total)
    assert(PgOutputFrameLog.readRange(dir, 8L, total).length == (total - 8).toInt)
  }

  test("streaming checkpoint survives retention of its acked prefix; fresh streams start at the floor") {
    val dir = tmp(); val ckpt = tmp()
    PgOutputFrameLog.append(dir, "seg-000", txn(100L, 1L -> "early"))
    val got = scala.collection.mutable.ArrayBuffer.empty[String]
    def run(checkpoint: String): Unit = {
      val q = spark.readStream
        .format("graft.sources.PgOutputFrameSource")
        .option("path", dir).load()
        .writeStream.option("checkpointLocation", checkpoint)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          val frames = batch.collect().sortBy(_.getLong(0))
            .map(_.getAs[Array[Byte]]("frame"))
          got.synchronized {
            got ++= ChangelogBuilder.build(frames.iterator.map(PgOutput.decode))
              .collect { case m: ChangelogBuilder.ModificationEntry =>
                m.after.get("msg").asInstanceOf[String] }
          }
          ()
        }.start()
      try q.processAllAvailable() finally q.stop()
    }
    run(ckpt)
    assert(got.toSeq == Seq("early"))

    // ack + retain the consumed prefix, then continue from the same
    // checkpoint: no error, no redelivery, new frames flow
    assert(PgOutputFrameLog.retain(dir, PgOutputFrameLog.frameCount(dir)) == 4L)
    PgOutputFrameLog.append(dir, "seg-001", txn(200L, 2L -> "late"))
    run(ckpt)
    assert(got.toSeq == Seq("early", "late"))

    // a FRESH checkpoint on the retained log starts at the floor —
    // it must not try to read the deleted prefix
    got.clear()
    run(tmp())
    assert(got.toSeq == Seq("late"))
  }

  test("primary key discovery: single key ok, none/composite rejected") {
    import graft.model.{ColumnSpec, TableSchema}
    import graft.sources.ImportSource._
    val ok = TableSchema(1, "public", "one", Seq(
      ColumnSpec("id", PgTypes.Int8, key = true), ColumnSpec("msg", PgTypes.Text)))
    assert(primaryKeyColumn(ok) == "id")
    val keyless = TableSchema(1, "public", "keyless", Seq(
      ColumnSpec("id", PgTypes.Int8), ColumnSpec("msg", PgTypes.Text)))
    assertThrows[NoPrimaryKeyError](primaryKeyColumn(keyless))
    val composite = TableSchema(1, "public", "composite", Seq(
      ColumnSpec("id", PgTypes.Int8, key = true),
      ColumnSpec("msg", PgTypes.Text, key = true)))
    val e = intercept[MultiplePrimaryKeysError](primaryKeyColumn(composite))
    assert(e.getMessage.contains("id,msg")) // deterministic sorted order
  }

  test("frame log round-trips ranges across segments") {
    val dir = tmp()
    val frames = txn(100L, 1L -> "a", 2L -> "b")
    PgOutputFrameLog.append(dir, "seg-000", frames.take(3))
    PgOutputFrameLog.append(dir, "seg-001", frames.drop(3))
    assert(PgOutputFrameLog.frameCount(dir) == frames.length)
    val mid = PgOutputFrameLog.readRange(dir, 2, 4)
    assert(mid.length == 2)
    assert(mid.map(_.toSeq).toSeq == frames.slice(2, 4).map(_.toSeq))
  }

  test("micro-batch stream delivers frames once, decodable, and survives restart") {
    val dir = tmp(); val ckpt = tmp()
    PgOutputFrameLog.append(dir, "seg-000", txn(100L, 1L -> "meow"))

    val decoded = scala.collection.mutable.ArrayBuffer.empty[ChangelogBuilder.Entry]
    def run(): Unit = {
      val q = spark.readStream
        .format("graft.sources.PgOutputFrameSource")
        .option("path", dir)
        .load()
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          // ordered decode: frames sorted by position inside the batch
          val frames = batch.orderBy("position").collect()
            .map(_.getAs[Array[Byte]]("frame"))
          decoded.synchronized {
            decoded ++= ChangelogBuilder.build(
              frames.iterator.map(PgOutput.decode))
          }
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }

    run()
    val mods1 = decoded.collect { case m: ChangelogBuilder.ModificationEntry => m }
    assert(mods1.map(_.after.get("msg")) == Seq("meow"))
    assert(mods1.head.lsn.contains(100L))

    // restart with the same checkpoint + new data: old frames are NOT
    // redelivered (confirmed_flush_lsn semantics), new ones are
    PgOutputFrameLog.append(dir, "seg-001", txn(200L, 2L -> "woof"))
    run()
    val msgs = decoded.collect { case m: ChangelogBuilder.ModificationEntry =>
      m.after.get("msg")
    }
    assert(msgs == Seq("meow", "woof"), s"got $msgs")
  }
}
