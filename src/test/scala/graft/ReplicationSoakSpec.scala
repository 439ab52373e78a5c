package graft

import java.io.{DataInputStream, DataOutputStream}
import java.net.ServerSocket
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue

import org.scalatest.funsuite.AnyFunSuite

import graft.sources._
import graft.sources.PgOutput._

/** Time-compressed soak of the live socket path: thousands of drain
  * epochs against a mock walsender, WAL-drop retention racing the
  * tailer the whole run, a consumer stall under keepalive pressure,
  * and one forced mid-stream disconnect. ReplicationSocketSpec proves
  * each protocol surface in isolation; this proves the OPERATIONAL
  * composition — hours of wall-clock behavior compressed into one
  * green test:
  *
  *  - ~12k frames drained 8 at a time → ~1,500 append/ack epochs
  *    (each epoch = segment append + StandbyStatusUpdate);
  *  - a retention thread continuously drops acked history
  *    ([[PgOutputFrameLog.retain]]) while the tailer appends — the
  *    race a deployment runs forever;
  *  - the consumer stalls 300 ms mid-stream while the server keeps
  *    sending data and reply-requested keepalives (TCP buffers the
  *    pressure; the drain must absorb it);
  *  - the first connection DROPS mid-stream; the supervised run loop
  *    reconnects and resumes from the durable position.
  *
  * Asserted across the whole soak: zero frame loss and zero
  * duplicates (landed == sent exactly, and the logical frame count
  * agrees), ack monotonicity within and ACROSS the reconnect, and
  * retention actually reclaiming thousands of frames mid-flight.
  */
class ReplicationSoakSpec extends AnyFunSuite {

  /** Walsender mock for soak shape: accepts connections in a loop
    * (the supervised tailer may reconnect any number of times), each
    * served from the client's requested LSN; sends a reply-requested
    * keepalive every `keepaliveEvery` frames; reads acks on a
    * dedicated thread so a large ack backlog can never deadlock the
    * frame writer; optionally hard-drops the FIRST connection after
    * `dropFirstAfter` frames. */
  final class SoakWalSender(frames: Seq[(Long, Array[Byte])],
      keepaliveEvery: Int, dropFirstAfter: Option[Int]) {
    private val server = new ServerSocket(0)
    val port: Int = server.getLocalPort
    /** (connection ordinal, acked flush LSN) in receive order. */
    val acks = new ConcurrentLinkedQueue[(Int, Long)]()
    @volatile var connections = 0

    private val acceptor = new Thread(() => {
      try {
        while (true) {
          val sock = server.accept()
          connections += 1
          val conn = connections
          sock.setTcpNoDelay(true)
          try serve(sock, conn) catch { case _: java.io.IOException => }
          finally sock.close()
        }
      } catch { case _: java.io.IOException => } // server closed
    })
    acceptor.setDaemon(true)
    acceptor.start()

    private def readMsg(in: DataInputStream): (Char, Array[Byte]) = {
      val t = in.readByte().toChar
      val l = in.readInt()
      val b = new Array[Byte](l - 4)
      in.readFully(b)
      (t, b)
    }

    private def serve(sock: java.net.Socket, conn: Int): Unit = {
      val in = new DataInputStream(sock.getInputStream)
      val out = new DataOutputStream(sock.getOutputStream)
      // startup handshake (protocol 3.0, replication=database)
      val len = in.readInt()
      val body = new Array[Byte](len - 4)
      in.readFully(body)
      assert(ByteBuffer.wrap(body, 0, 4).getInt() == 196608)
      out.writeByte('R'); out.writeInt(8); out.writeInt(0)
      out.writeByte('Z'); out.writeInt(5); out.writeByte('I')
      out.flush()
      val (q, qBody) = readMsg(in)
      assert(q == 'Q')
      val cmd = new String(qBody, 0, qBody.length - 1, StandardCharsets.UTF_8)
      val lsnRe = "([0-9A-Fa-f]+)/([0-9A-Fa-f]+)".r
      val startedFrom = lsnRe.findFirstMatchIn(cmd).map { m =>
        (java.lang.Long.parseLong(m.group(1), 16) << 32) |
          java.lang.Long.parseLong(m.group(2), 16)
      }.getOrElse(0L)
      out.writeByte('W'); out.writeInt(7); out.writeByte(0); out.writeShort(0)
      out.flush()
      // ack reader on its own thread: the writer below must never
      // block because acks filled a socket buffer nobody drains
      val ackReader = new Thread(() => {
        try {
          var open = true
          while (open) {
            val (t, b) = readMsg(in)
            t match {
              case 'd' if b.nonEmpty && b(0) == 'r'.toByte =>
                acks.add((conn, ByteBuffer.wrap(b, 9, 8).getLong)) // flushed
              case 'X' | 'c' => open = false
              case _ =>
            }
          }
        } catch { case _: java.io.IOException => }
      })
      ackReader.setDaemon(true)
      ackReader.start()
      // replay from the requested LSN inclusive (real walsender
      // semantics: confirmed_flush only bounds earlier commits)
      var sent = 0
      val toSend = frames.filter(_._1 >= math.max(startedFrom, 1L))
      val dropAt = if (conn == 1) dropFirstAfter else None
      toSend.foreach { case (walStart, payload) =>
        if (dropAt.exists(sent >= _)) { sock.close(); return }
        out.writeByte('d'); out.writeInt(4 + 1 + 24 + payload.length)
        out.writeByte('w')
        out.writeLong(walStart); out.writeLong(walStart); out.writeLong(0L)
        out.write(payload)
        sent += 1
        if (sent % keepaliveEvery == 0) {
          out.writeByte('d'); out.writeInt(4 + 1 + 17)
          out.writeByte('k')
          out.writeLong(walStart); out.writeLong(0L); out.writeByte(1)
          out.flush()
        }
      }
      out.flush()
      // drained: keep the stream alive with periodic keepalives until
      // the client disconnects (the idle steady state of a live slot)
      try {
        while (!sock.isClosed) {
          out.writeByte('d'); out.writeInt(4 + 1 + 17)
          out.writeByte('k')
          out.writeLong(frames.lastOption.map(_._1).getOrElse(0L))
          out.writeLong(0L); out.writeByte(0)
          out.flush()
          Thread.sleep(20)
        }
      } catch { case _: java.io.IOException => }
    }

    def close(): Unit = server.close()
  }

  private val rel = Relation(77, "public", "example", 'd'.toByte,
    Seq(RelationColumn(key = true, "id", graft.model.PgTypes.Int8, -1),
      RelationColumn(key = false, "msg", graft.model.PgTypes.Text, -1)))

  test("soak: ~1500 epochs, retention racing the tailer, stall + forced reconnect — no loss, acks monotonic") {
    // 4000 txns × 3 frames + leading Relation = 12001 frames,
    // strictly increasing WAL positions from 11
    val framesets: Seq[Array[Byte]] =
      encodeRelation(rel) +: (0 until 4000).flatMap { x =>
        val lsn = 100L + x
        Seq(
          encodeBegin(Begin(lsn, 0L, lsn)),
          encodeInsert(Insert(rel.id, TupleData(Seq(
            Element('t', Some(x.toString.getBytes(StandardCharsets.UTF_8))),
            Element('t', Some(s"soak-$x".getBytes(StandardCharsets.UTF_8))))))),
          encodeCommit(Commit(0, lsn, lsn, lsn)))
      }
    val frames = framesets.zipWithIndex.map { case (f, i) => (11L + i, f) }
    val finalPos = frames.last._1

    val mock = new SoakWalSender(frames,
      keepaliveEvery = 200, dropFirstAfter = Some(6000))
    val dir = Files.createTempDirectory("graft-soak").toString

    // retention races the tailer for the entire run: drop everything
    // more than 64 frames behind the durable log head, as a deployed
    // retention job following the ack watermark would. Races with a
    // concurrent append/delete are retried next tick — retention is a
    // background sweep, not a correctness dependency.
    @volatile var stopRetention = false
    @volatile var framesReclaimed = 0L
    @volatile var retentionPasses = 0L
    val retention = new Thread(() => {
      while (!stopRetention) {
        try {
          val upTo = PgOutputFrameLog.frameCount(dir) - 64
          if (upTo > 0) {
            framesReclaimed += PgOutputFrameLog.retain(dir, upTo)
            retentionPasses += 1
          }
        } catch { case scala.util.control.NonFatal(_) => }
        Thread.sleep(2)
      }
    })
    retention.setDaemon(true)
    retention.start()

    val tailer = new ReplicationTailer(
      new PgReplicationClient("127.0.0.1", mock.port, "db", "repl"), dir)

    val deadline = System.currentTimeMillis() + 60000
    val stallAtPos = frames(4000)._1 // ~one third in
    var stalled = false
    var landed = 0L
    try {
      landed = tailer.run("s", "p",
        stop = () => {
          // consumer stall mid-soak: freeze the drain loop for 300 ms
          // while the server keeps pushing frames and reply-requested
          // keepalives — TCP buffers the pressure; the next drains
          // inherit (and must absorb) the backlog
          if (!stalled && tailer.durablePosition._1 >= stallAtPos) {
            stalled = true
            Thread.sleep(300)
          }
          tailer.durablePosition._1 >= finalPos ||
            System.currentTimeMillis() > deadline
        },
        connect = () =>
          new PgReplicationClient("127.0.0.1", mock.port, "db", "repl"),
        maxFrames = 8, timeoutMs = 20, backoffBaseSeconds = 0.01)
    } finally {
      stopRetention = true
      mock.close()
    }
    assert(stalled, "the stall phase never engaged")

    // ---- no loss, no duplicates: the log's logical frame count
    // (retained base + on-disk) is EXACTLY the sent count — a lost
    // frame would read below it, a replay double-append above it.
    // The run loop's own counter may undercount by up to one drain
    // batch per disconnect: the forced drop can land AFTER an epoch's
    // durable append but BEFORE its ack returns (append-before-ack is
    // the design), in which case the frames are in the log but the
    // IOException swallows the count — and the reconnect's replay
    // filter must NOT re-append them, which the exact frameCount
    // proves.
    assert(PgOutputFrameLog.frameCount(dir) == frames.size.toLong,
      s"log holds ${PgOutputFrameLog.frameCount(dir)} of ${frames.size}")
    assert(landed >= frames.size.toLong - 8 && landed <= frames.size.toLong,
      s"landed $landed of ${frames.size} frames")
    assert(tailer.durablePosition == ((finalPos, 1L)),
      s"durable position ${tailer.durablePosition}")

    // ---- the forced drop actually exercised the reconnect path
    assert(mock.connections >= 2,
      s"expected a reconnect, saw ${mock.connections} connection(s)")

    // ---- ack monotonicity, within each connection and ACROSS the
    // reconnect boundary (a regressed ack would move
    // confirmed_flush_lsn backwards on a real slot)
    // the mock's ack-reader threads drain their sockets ASYNCHRONOUSLY
    // — the final StandbyStatusUpdate is written by the tailer just
    // before run() returns and may still be in flight when the run
    // loop exits, so give the queue a bounded settle window before
    // snapshotting (a flake under suite-wide CPU contention otherwise)
    def snapshot(): Vector[(Int, Long)] = {
      import scala.jdk.CollectionConverters._
      mock.acks.asScala.toVector
    }
    val settleDeadline = System.currentTimeMillis() + 5000
    while (!snapshot().exists(_._2 == finalPos) &&
        System.currentTimeMillis() < settleDeadline)
      Thread.sleep(20)
    val ackSeq = snapshot()
    assert(ackSeq.size >= 1000,
      s"soak expected >=1000 ack epochs, saw ${ackSeq.size}")
    // within each connection the TCP stream preserves order, so the
    // recorded sequence must never regress
    ackSeq.groupBy(_._1).foreach { case (conn, as) =>
      as.map(_._2).sliding(2).foreach {
        case Vector(a1, a2) =>
          assert(a2 >= a1, s"ack regressed $a1 -> $a2 on connection $conn")
        case _ =>
      }
    }
    // across the reconnect: nothing acked on a later connection may
    // sit below anything acked on an earlier one (a regression would
    // move a real slot's confirmed_flush_lsn backwards)
    val byConn = ackSeq.groupBy(_._1).toSeq.sortBy(_._1)
    byConn.sliding(2).foreach {
      case Seq((c1, as1), (c2, as2)) =>
        assert(as2.map(_._2).min >= as1.map(_._2).max,
          s"connection $c2 acked below connection $c1's high water")
      case _ =>
    }
    assert(ackSeq.map(_._2).max == finalPos,
      s"high-water ack ${ackSeq.map(_._2).max} != $finalPos")

    // ---- retention genuinely raced the appends and reclaimed the
    // acked prefix (the log never grew unbounded)
    assert(framesReclaimed > 5000L,
      s"retention reclaimed only $framesReclaimed frames")
    assert(retentionPasses > 10L, s"retention ran $retentionPasses passes")
    val (retainedBase, _) = PgOutputFrameLog.retainInfo(dir)
    assert(retainedBase > 5000L)

    // ---- and the surviving tail still DECODES: the retained log is
    // a valid pgoutput stream suffix (readers at/past the floor work)
    val tail = PgOutputFrameLog.readRange(dir, retainedBase,
      PgOutputFrameLog.frameCount(dir)).map(PgOutput.decode)
    assert(tail.nonEmpty)
    assert(tail.exists(_.isInstanceOf[Commit]))
  }
}
