package graft

import java.io.{DataInputStream, DataOutputStream}
import java.net.ServerSocket
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.concurrent.{ConcurrentLinkedQueue, CountDownLatch, TimeUnit}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources._
import graft.sources.PgOutput._

/** The live replication transport against an in-process mock server
  * speaking the PostgreSQL v3 streaming-replication wire protocol:
  * startup/auth, START_REPLICATION → CopyBoth, XLogData frames,
  * keepalive round-trips, StandbyStatusUpdate acks, and slot-replay
  * resumption. No Postgres exists in this environment, so the mock
  * IS the integration surface — the bytes on the wire are the real
  * protocol's, and the client cannot tell the difference.
  */
class ReplicationSocketSpec extends AnyFunSuite {

  /** Minimal mock of a Postgres walsender: serves one connection per
    * `expectConnection` call; replays `frames` (walStart, bytes) from
    * the client's requested LSN; records acked flush positions.
    */
  final class MockWalSender(frames: Seq[(Long, Array[Byte])]) {
    private val server = new ServerSocket(0)
    val port: Int = server.getLocalPort
    val ackedFlush = new ConcurrentLinkedQueue[Long]()
    @volatile var startedFrom: Long = -1L
    @volatile var sawReplicationParam = false
    @volatile var startCommand: String = ""
    private var thread: Thread = _

    /** Serve one client connection on a daemon thread.
      * @param keepaliveFirst send a reply-requested keepalive before
      *   any data (exercises the keepalive answer path)
      */
    def expectConnection(keepaliveFirst: Boolean = false,
        dropAfterServing: Boolean = false,
        ready: CountDownLatch = new CountDownLatch(0)): Unit = {
      thread = new Thread(() => {
        val sock = server.accept()
        sock.setTcpNoDelay(true)
        val in = new DataInputStream(sock.getInputStream)
        val out = new DataOutputStream(sock.getOutputStream)
        // --- startup: [len][protocol][k\0v\0...\0]
        val len = in.readInt()
        val body = new Array[Byte](len - 4)
        in.readFully(body)
        val proto = ByteBuffer.wrap(body, 0, 4).getInt()
        assert(proto == 196608, s"protocol $proto")
        val params = new String(body, 4, body.length - 5, StandardCharsets.UTF_8)
          .split("\u0000").grouped(2).collect { case Array(k, v) => k -> v }.toMap
        sawReplicationParam = params.get("replication").contains("database")
        // AuthenticationOk + ReadyForQuery
        out.writeByte('R'); out.writeInt(8); out.writeInt(0)
        out.writeByte('Z'); out.writeInt(5); out.writeByte('I')
        out.flush()
        // --- START_REPLICATION query
        val (q, qBody) = readMsg(in)
        assert(q == 'Q', s"expected Query, got $q")
        startCommand = new String(qBody, 0, qBody.length - 1, StandardCharsets.UTF_8)
        val lsnRe = "([0-9A-Fa-f]+)/([0-9A-Fa-f]+)".r
        startedFrom = lsnRe.findFirstMatchIn(startCommand).map { m =>
          (java.lang.Long.parseLong(m.group(1), 16) << 32) |
            java.lang.Long.parseLong(m.group(2), 16)
        }.getOrElse(0L)
        // CopyBothResponse (format 0, zero columns)
        out.writeByte('W'); out.writeInt(7); out.writeByte(0); out.writeShort(0)
        out.flush()
        if (keepaliveFirst) sendKeepalive(out, 5L, replyRequested = true)
        // replay from the requested position INCLUSIVE — a real
        // walsender resends the boundary LSN's frames (confirmed_flush
        // only guarantees no redelivery of earlier commits)
        frames.filter(_._1 >= math.max(startedFrom, 1L)).foreach {
          case (walStart, bytes) => sendXLogData(out, walStart, bytes)
        }
        out.flush()
        ready.countDown()
        if (!dropAfterServing) {
          // read acks until the client closes
          try {
            var open = true
            while (open) {
              val (t, b) = readMsg(in)
              t match {
                case 'd' if b.nonEmpty && b(0) == 'r'.toByte =>
                  ackedFlush.add(ByteBuffer.wrap(b, 9, 8).getLong) // flushed
                case 'X' | 'c' => open = false
                case _ =>
              }
            }
          } catch { case _: java.io.IOException => }
        }
        sock.close()
      })
      thread.setDaemon(true)
      thread.start()
    }

    private def readMsg(in: DataInputStream): (Char, Array[Byte]) = {
      val t = in.readByte().toChar
      val l = in.readInt()
      val b = new Array[Byte](l - 4)
      in.readFully(b)
      (t, b)
    }

    private def sendXLogData(out: DataOutputStream, walStart: Long,
        payload: Array[Byte]): Unit = {
      out.writeByte('d'); out.writeInt(4 + 1 + 24 + payload.length)
      out.writeByte('w')
      // real logical walsenders stamp walEnd == walStart (the output
      // record's own LSN) — several frames can share one position
      out.writeLong(walStart); out.writeLong(walStart); out.writeLong(0L)
      out.write(payload)
    }

    private def sendKeepalive(out: DataOutputStream, walEnd: Long,
        replyRequested: Boolean): Unit = {
      out.writeByte('d'); out.writeInt(4 + 1 + 17)
      out.writeByte('k')
      out.writeLong(walEnd); out.writeLong(0L)
      out.writeByte(if (replyRequested) 1 else 0)
      out.flush()
    }

    def close(): Unit = server.close()
  }

  private val rel = Relation(77, "public", "example", 'd'.toByte,
    Seq(RelationColumn(key = true, "id", graft.model.PgTypes.Int8, -1),
      RelationColumn(key = false, "msg", graft.model.PgTypes.Text, -1)))

  private def txn(lsn: Long, id: Long, msg: String): Seq[Array[Byte]] = Seq(
    encodeBegin(Begin(lsn, 0L, lsn)),
    encodeInsert(Insert(rel.id, TupleData(Seq(
      Element('t', Some(id.toString.getBytes(StandardCharsets.UTF_8))),
      Element('t', Some(msg.getBytes(StandardCharsets.UTF_8))))))),
    encodeCommit(Commit(0, lsn, lsn, lsn)))

  /** (walStart, frame) pairs with strictly increasing positions. */
  private def walFrames(framesets: Seq[Seq[Array[Byte]]], base: Long)
      : Seq[(Long, Array[Byte])] =
    framesets.flatten.zipWithIndex.map { case (f, i) => (base + i + 1, f) }

  test("tailer lands wire frames in the log, acks after the durable append") {
    val frames = walFrames(Seq(
      Seq(encodeRelation(rel)), txn(100L, 1L, "hello"), txn(200L, 2L, "world")), 10L)
    val mock = new MockWalSender(frames)
    val ready = new CountDownLatch(1)
    mock.expectConnection(ready = ready)
    val dir = Files.createTempDirectory("graft-repl").toString
    val client = new PgReplicationClient("127.0.0.1", mock.port, "db", "repl")
    val tailer = new ReplicationTailer(client, dir)
    try {
      tailer.start("graft_slot", "graft_pub")
      assert(ready.await(5, TimeUnit.SECONDS))
      var landed = 0
      val deadline = System.currentTimeMillis() + 5000
      while (landed < frames.size && System.currentTimeMillis() < deadline)
        landed += tailer.tailOnce(maxFrames = 100, timeoutMs = 200)
      assert(landed == frames.size)
      // the mock saw the replication startup parameter and the real
      // START_REPLICATION grammar
      assert(mock.sawReplicationParam)
      assert(mock.startCommand.matches(
        "START_REPLICATION SLOT graft_slot LOGICAL [0-9A-F]+/[0-9A-F]+ " +
          "\\(proto_version '1', publication_names 'graft_pub'\\)"))
      // log contents decode to the original messages, in order
      val logged = PgOutputFrameLog
        .readRange(dir, 0, PgOutputFrameLog.frameCount(dir))
        .map(PgOutput.decode)
      assert(logged.length == frames.size)
      assert(logged.count(_.isInstanceOf[Insert]) == 2)
      assert(logged.head.isInstanceOf[Relation])
      // ack-after-durable: the acked flush position is the WAL end of
      // the last durably appended frame
      val deadline2 = System.currentTimeMillis() + 2000
      while (mock.ackedFlush.isEmpty && System.currentTimeMillis() < deadline2)
        Thread.sleep(20)
      val acked = mock.ackedFlush.toArray(Array.empty[java.lang.Long])
      assert(acked.nonEmpty && acked.last == frames.map(_._1).max)
      assert(tailer.durableWalPosition == frames.map(_._1).max)
    } finally { client.close(); mock.close() }
  }

  test("keepalive with reply-requested is answered with the flushed position") {
    val mock = new MockWalSender(Nil)
    mock.expectConnection(keepaliveFirst = true)
    val dir = Files.createTempDirectory("graft-repl-ka").toString
    val client = new PgReplicationClient("127.0.0.1", mock.port, "db", "repl")
    val tailer = new ReplicationTailer(client, dir)
    try {
      tailer.start("s", "p")
      tailer.tailOnce(maxFrames = 10, timeoutMs = 300)
      val deadline = System.currentTimeMillis() + 2000
      while (mock.ackedFlush.isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(20)
      assert(!mock.ackedFlush.isEmpty) // answered the keepalive
    } finally { client.close(); mock.close() }
  }

  test("socket transport feeds the same DSv2 streaming source as the offline log") {
    // the "two transports, one engine" contract: frames tailed off the
    // wire land in a frame log that the existing streaming pipeline
    // consumes unchanged — same source format, same offsets, same sink
    val spark = SparkTestSession.spark
    val frames = walFrames(Seq(
      Seq(encodeRelation(rel)), txn(100L, 1L, "wire-a"), txn(200L, 2L, "wire-b")), 10L)
    val mock = new MockWalSender(frames)
    mock.expectConnection()
    val dir = Files.createTempDirectory("graft-repl-e2e").toString
    val client = new PgReplicationClient("127.0.0.1", mock.port, "db", "repl")
    val tailer = new ReplicationTailer(client, dir)
    try {
      tailer.start("s", "p")
      var landed = 0
      val deadline = System.currentTimeMillis() + 5000
      while (landed < frames.size && System.currentTimeMillis() < deadline)
        landed += tailer.tailOnce(maxFrames = 100, timeoutMs = 200)
      assert(landed == frames.size)
    } finally { client.close(); mock.close() }

    val wh = Files.createTempDirectory("graft-repl-wh").toString
    val sink = new graft.sinks.WarehouseSink(spark, wh)
    val wm = new graft.streaming.CdcPipeline.AckWatermark
    val ckpt = Files.createTempDirectory("graft-repl-ckpt").toString
    val q = graft.streaming.FrameStreamPipeline.start(
      spark, dir, sink, wm, ckpt, flushInterval = "1 seconds")
    try q.processAllAvailable() finally q.stop()
    val table = graft.model.TableSchema(77L, "public", "example", Seq(
      graft.model.ColumnSpec("id", graft.model.PgTypes.Int8, key = true),
      graft.model.ColumnSpec("msg", graft.model.PgTypes.Text)))
    import spark.implicits._
    val latest = sink.latestView(table)
      .select("id", "msg").as[(Long, String)].collect().toMap
    assert(latest == Map(1L -> "wire-a", 2L -> "wire-b"))
    assert(wm.position.contains(200L))
  }

  test("frames sharing one LSN survive drain splits and boundary replay exactly once") {
    // realistic wire shape: a transaction's frames all carry the same
    // LSN (Begin/Relation/Insert/.../Commit at pos 50), so an LSN
    // alone cannot tell which boundary frames are already durable.
    // Force a drain boundary INSIDE the same-LSN run (maxFrames=3),
    // then crash/reconnect with the server replaying from the
    // boundary LSN inclusive — the (walPos, framesAtPos) position
    // must drop exactly the already-appended prefix.
    val txnFrames = Seq(encodeRelation(rel)) ++ txn(50L, 1L, "a") // 4 frames
    val sameLsn = txnFrames.map(f => (50L, f)) ++
      txn(60L, 2L, "b").map(f => (60L, f)) // 3 more at pos 60
    val dir = Files.createTempDirectory("graft-repl-samelsn").toString

    val mock1 = new MockWalSender(sameLsn)
    mock1.expectConnection()
    val c1 = new PgReplicationClient("127.0.0.1", mock1.port, "db", "repl")
    val t1 = new ReplicationTailer(c1, dir)
    try {
      t1.start("s", "p")
      var landed = 0
      val deadline = System.currentTimeMillis() + 5000
      while (landed < sameLsn.size && System.currentTimeMillis() < deadline)
        landed += t1.tailOnce(maxFrames = 3, timeoutMs = 200) // split the LSN run
      assert(landed == sameLsn.size)
      assert(t1.durablePosition == (60L, 3L))
    } finally { c1.close(); mock1.close() }
    assert(PgOutputFrameLog.frameCount(dir) == 7)

    // restart: server replays everything from pos 60 inclusive (the
    // 3 frames at 60) plus two new frames ALSO at pos 60 — the tailer
    // must skip exactly the 3 durable ones and land the 2 new ones
    val more = txn(60L, 3L, "c").take(2).map(f => (60L, f))
    val mock2 = new MockWalSender(sameLsn ++ more)
    mock2.expectConnection()
    val c2 = new PgReplicationClient("127.0.0.1", mock2.port, "db", "repl")
    val t2 = new ReplicationTailer(c2, dir)
    try {
      t2.start("s", "p")
      assert(mock2.startedFrom == 60L)
      var landed = 0
      val deadline = System.currentTimeMillis() + 5000
      while (landed < 2 && System.currentTimeMillis() < deadline)
        landed += t2.tailOnce(maxFrames = 100, timeoutMs = 200)
      assert(landed == 2)
      assert(PgOutputFrameLog.frameCount(dir) == 9) // no duplicates
      assert(t2.durablePosition == (60L, 5L))
    } finally { c2.close(); mock2.close() }
  }

  test("SocketCdcPipeline: live socket -> log -> streaming query -> warehouse, one call") {
    val spark = SparkTestSession.spark
    val frames = walFrames(Seq(
      Seq(encodeRelation(rel)), txn(100L, 1L, "live-a"), txn(200L, 2L, "live-b")), 10L)
    val mock = new MockWalSender(frames)
    mock.expectConnection()
    val dir = Files.createTempDirectory("graft-live").toString
    val wh = Files.createTempDirectory("graft-live-wh").toString
    val sink = new graft.sinks.WarehouseSink(spark, wh)
    val wm = new graft.streaming.CdcPipeline.AckWatermark
    val handle = graft.streaming.SocketCdcPipeline.start(
      spark,
      connect = () => new PgReplicationClient("127.0.0.1", mock.port, "db", "repl"),
      slot = "s", publication = "p", logDir = dir, sink = sink,
      watermark = wm,
      checkpoint = Files.createTempDirectory("graft-live-ckpt").toString,
      flushInterval = "1 seconds")
    try {
      // tailer and query run CONCURRENTLY; wait for the ack watermark
      // to reach the last commit
      val deadline = System.currentTimeMillis() + 20000
      while (!wm.position.contains(200L) && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
    } finally handle.stop()
    assert(wm.position.contains(200L))
    val table = graft.model.TableSchema(77L, "public", "example", Seq(
      graft.model.ColumnSpec("id", graft.model.PgTypes.Int8, key = true),
      graft.model.ColumnSpec("msg", graft.model.PgTypes.Text)))
    import spark.implicits._
    val latest = sink.latestView(table)
      .select("id", "msg").as[(Long, String)].collect().toMap
    assert(latest == Map(1L -> "live-a", 2L -> "live-b"))
  }

  test("supervised run loop survives a server drop: reconnect, resume, no duplicates") {
    val first = walFrames(Seq(Seq(encodeRelation(rel)), txn(100L, 1L, "a")), 10L)
    val second = first ++ walFrames(Seq(txn(200L, 2L, "b")), 50L)
    val dir = Files.createTempDirectory("graft-repl-run").toString
    // connection 1 serves the first batch then DROPS the socket;
    // connection 2 (fresh port) replays everything plus new frames
    val mock1 = new MockWalSender(first)
    mock1.expectConnection(dropAfterServing = true)
    val mock2 = new MockWalSender(second)
    mock2.expectConnection()
    val target = second.size.toLong
    val deadline = System.currentTimeMillis() + 15000
    val tailer = new ReplicationTailer(
      new PgReplicationClient("127.0.0.1", mock1.port, "db", "repl"), dir)
    try {
      tailer.run("s", "p",
        stop = () => System.currentTimeMillis() > deadline ||
          PgOutputFrameLog.frameCount(dir) >= target,
        connect = () =>
          new PgReplicationClient("127.0.0.1", mock2.port, "db", "repl"),
        maxFrames = 100, timeoutMs = 100, backoffBaseSeconds = 0.01)
      assert(PgOutputFrameLog.frameCount(dir) == target, "no loss, no dupes")
      val logged = PgOutputFrameLog.readRange(dir, 0, target).map(PgOutput.decode)
      assert(logged.count(_.isInstanceOf[Insert]) == 2)
      assert(mock2.startedFrom == first.map(_._1).max,
        "second connection must resume from the durable position")
    } finally { mock1.close(); mock2.close() }
  }

  test("reconnect resumes from the durable WAL position; slot replay does not double-append") {
    val first = walFrames(Seq(Seq(encodeRelation(rel)), txn(100L, 1L, "a")), 10L)
    val dir = Files.createTempDirectory("graft-repl-resume").toString

    // session 1: land the first batch
    val mock1 = new MockWalSender(first)
    mock1.expectConnection()
    val c1 = new PgReplicationClient("127.0.0.1", mock1.port, "db", "repl")
    val t1 = new ReplicationTailer(c1, dir)
    try {
      t1.start("s", "p")
      var landed = 0
      val deadline = System.currentTimeMillis() + 5000
      while (landed < first.size && System.currentTimeMillis() < deadline)
        landed += t1.tailOnce(maxFrames = 100, timeoutMs = 200)
      assert(landed == first.size)
    } finally { c1.close(); mock1.close() }
    val positionAfterFirst = PgOutputFrameLog.frameCount(dir)
    val durable = new ReplicationTailer(
      new PgReplicationClient("x", 0, "d", "u"), dir).durableWalPosition

    // session 2: server replays EVERYTHING from the slot start plus
    // new frames; the tailer must ask to start from `durable` and
    // filter any replay at or below it
    val second = first ++ walFrames(Seq(txn(200L, 2L, "b")), durable + 5)
    val mock2 = new MockWalSender(second)
    mock2.expectConnection()
    val c2 = new PgReplicationClient("127.0.0.1", mock2.port, "db", "repl")
    val t2 = new ReplicationTailer(c2, dir)
    try {
      t2.start("s", "p")
      var landed = 0
      val deadline = System.currentTimeMillis() + 5000
      while (landed < 3 && System.currentTimeMillis() < deadline)
        landed += t2.tailOnce(maxFrames = 100, timeoutMs = 200)
      assert(mock2.startedFrom == durable,
        s"client must resume from $durable, asked ${mock2.startedFrom}")
      // exactly the 3 new frames landed; no duplicates of the first 4
      assert(PgOutputFrameLog.frameCount(dir) == positionAfterFirst + 3)
      val all = PgOutputFrameLog.readRange(dir, 0, positionAfterFirst + 3)
        .map(PgOutput.decode)
      assert(all.count(_.isInstanceOf[Insert]) == 2)
    } finally { c2.close(); mock2.close() }
  }
}
