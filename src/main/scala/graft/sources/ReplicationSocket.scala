package graft.sources

import java.io.{DataInputStream, DataOutputStream, EOFException}
import java.net.Socket
import java.nio.charset.StandardCharsets

/** Live replication transport: a minimal PostgreSQL v3 wire-protocol
  * client speaking the streaming-replication sub-protocol
  * (`START_REPLICATION SLOT ... LOGICAL`), paired with a tailer that
  * lands received pgoutput frames in the durable frame log the DSv2
  * source ([[PgOutputFrameSource]]) already reads.
  *
  * Reference semantics (pkg/subscription/stream.go:78-232): the
  * reference consumes CopyData frames from a replication slot,
  * tracks the server's WAL position, and acknowledges with
  * StandbyStatusUpdate so `confirmed_flush_lsn` only moves past data
  * the sink has durably handled. This implementation keeps that
  * contract with Spark-shaped responsibilities:
  *
  *  - the SOCKET loop is a thin transport: it drains XLogData frames,
  *    appends them to the frame log (fsync'd segment), and only then
  *    acks the flushed WAL position — ack-after-durable, so a crash
  *    between receive and append replays from the slot;
  *  - the frame LOG is the replayable boundary Spark checkpoints
  *    against (frame positions), exactly as in offline mode — the
  *    streaming query is byte-identical across transports;
  *  - resumption state travels in the segment NAMES (see
  *    [[ReplicationTailer]]): the append that lands frames is the
  *    same atomic step that records how far the log reaches, and on
  *    reconnect the tailer skips the slot's replayed prefix by
  *    (position, frame-count-at-position) — the slot's at-least-once
  *    replay becomes an exactly-once log.
  *
  * Wire messages used (PostgreSQL protocol 3.0): StartupMessage with
  * `replication=database`, AuthenticationOk / cleartext password,
  * Query, CopyBothResponse, CopyData carrying XLogData ('w') and
  * Primary keepalive ('k'), StandbyStatusUpdate ('r'), ErrorResponse.
  */
object PgWire {
  /** Microseconds since the PostgreSQL epoch (2000-01-01), the clock
    * format StandbyStatusUpdate carries. */
  def nowPgMicros(): Long =
    System.currentTimeMillis() * 1000L - PgOutput.PostgresEpochMicros

  def writeStartup(out: DataOutputStream, params: Seq[(String, String)]): Unit = {
    val body = new java.io.ByteArrayOutputStream()
    params.foreach { case (k, v) =>
      body.write(k.getBytes(StandardCharsets.UTF_8)); body.write(0)
      body.write(v.getBytes(StandardCharsets.UTF_8)); body.write(0)
    }
    body.write(0)
    out.writeInt(4 + 4 + body.size())
    out.writeInt(196608) // protocol 3.0
    out.write(body.toByteArray)
    out.flush()
  }

  /** One backend message: (type byte, payload without the length). */
  def readMessage(in: DataInputStream): (Char, Array[Byte]) = {
    val tpe = in.readByte().toChar
    val len = in.readInt()
    if (len < 4) throw new EOFException(s"bad message length $len for '$tpe'")
    val body = new Array[Byte](len - 4)
    in.readFully(body)
    (tpe, body)
  }

  def writeMessage(out: DataOutputStream, tpe: Char, body: Array[Byte]): Unit = {
    out.writeByte(tpe)
    out.writeInt(4 + body.length)
    out.write(body)
    out.flush()
  }

  def cstring(s: String): Array[Byte] = {
    val b = s.getBytes(StandardCharsets.UTF_8)
    java.util.Arrays.copyOf(b, b.length + 1)
  }

  def errorMessage(body: Array[Byte]): String = {
    // ErrorResponse: sequence of (code byte, cstring) fields until \0
    val fields = scala.collection.mutable.Map[Char, String]()
    var i = 0
    while (i < body.length && body(i) != 0) {
      val code = body(i).toChar
      val end = body.indexOf(0.toByte, i + 1)
      fields(code) = new String(body, i + 1, end - (i + 1), StandardCharsets.UTF_8)
      i = end + 1
    }
    s"${fields.getOrElse('S', "ERROR")}: ${fields.getOrElse('M', "(no message)")}"
  }

  /** LSN as PostgreSQL renders it (`X/Y` hex form). */
  def lsnString(lsn: Long): String =
    f"${(lsn >>> 32).toHexString.toUpperCase}%s/${(lsn & 0xffffffffL).toHexString.toUpperCase}%s"
}

/** A received XLogData frame. */
final case class WalFrame(walStart: Long, walEnd: Long, frame: Array[Byte])

/** Blocking replication client over one socket. Single-threaded
  * pull model (the reference's receive loop is too); [[poll]] returns
  * the frames available within the timeout and answers keepalives.
  */
final class PgReplicationClient(
    host: String, port: Int, database: String, user: String,
    password: Option[String] = None) extends AutoCloseable {

  private var socket: Socket = _
  private var in: DataInputStream = _
  private var out: DataOutputStream = _

  /** WAL end of the last frame or keepalive seen (server progress). */
  @volatile var serverWalEnd: Long = 0L

  /** Set when the server closed the stream (EOF mid-poll): the
    * connection is dead and a supervisor should reconnect. */
  @volatile var streamClosed: Boolean = false

  def connect(): Unit = {
    socket = new Socket(host, port)
    socket.setTcpNoDelay(true)
    in = new DataInputStream(new java.io.BufferedInputStream(socket.getInputStream))
    out = new DataOutputStream(new java.io.BufferedOutputStream(socket.getOutputStream))
    PgWire.writeStartup(out, Seq(
      "user" -> user, "database" -> database, "replication" -> "database"))
    var ready = false
    while (!ready) {
      val (tpe, body) = PgWire.readMessage(in)
      tpe match {
        case 'R' =>
          val code = java.nio.ByteBuffer.wrap(body).getInt()
          code match {
            case 0 => // AuthenticationOk
            case 3 => // cleartext password
              PgWire.writeMessage(out, 'p', PgWire.cstring(password.getOrElse(
                throw new IllegalStateException("server requires a password"))))
            case other => throw new IllegalStateException(
              s"unsupported auth method $other (trust/cleartext only)")
          }
        case 'S' | 'K' | 'N' => // ParameterStatus / BackendKeyData / Notice
        case 'Z' => ready = true
        case 'E' => throw new IllegalStateException(PgWire.errorMessage(body))
        case other => throw new IllegalStateException(
          s"unexpected message '$other' during startup")
      }
    }
  }

  /** Enter CopyBoth mode from `startLsn` on `slot`, subscribing to
    * `publication` with pgoutput protocol version 1 (the format
    * [[PgOutput.decode]] speaks). */
  def startReplication(slot: String, publication: String, startLsn: Long): Unit = {
    val sql = s"START_REPLICATION SLOT $slot LOGICAL " +
      s"${PgWire.lsnString(startLsn)} (proto_version '1', " +
      s"publication_names '$publication')"
    PgWire.writeMessage(out, 'Q', PgWire.cstring(sql))
    var inCopy = false
    while (!inCopy) {
      val (tpe, body) = PgWire.readMessage(in)
      tpe match {
        case 'W' => inCopy = true // CopyBothResponse
        case 'S' | 'N' => // ParameterStatus / NoticeResponse
        case 'E' => throw new IllegalStateException(PgWire.errorMessage(body))
        case other => throw new IllegalStateException(
          s"unexpected message '$other' awaiting CopyBothResponse")
      }
    }
  }

  /** Generous bound for the REMAINDER of a message whose type byte
    * already arrived: those bytes are committed and in flight, so a
    * timeout here is a broken stream, not an idle one. */
  private val MessageBodyTimeoutMs = 30000

  /** Drain frames until `maxFrames` are buffered or `timeoutMs`
    * passes without data. Primary keepalives requesting a reply are
    * answered inline with the caller's last flushed position.
    *
    * The idle timeout applies ONLY to the first byte of a message —
    * a clean boundary (zero bytes consumed when it fires). Timing out
    * mid-message would desynchronize the wire stream: the partial
    * bytes are gone and the next read would parse garbage as a
    * type/length header, so mid-message stalls get a long bound and
    * then fail loudly instead of being swallowed.
    */
  def poll(maxFrames: Int, timeoutMs: Int, flushedLsn: Long): Seq[WalFrame] = {
    val frames = Seq.newBuilder[WalFrame]
    var n = 0
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    while (n < maxFrames && System.nanoTime() < deadline) {
      val waitMs = math.max(1L, (deadline - System.nanoTime()) / 1000000L)
      socket.setSoTimeout(math.min(waitMs, Int.MaxValue.toLong).toInt)
      val first = try Some(in.readByte().toChar) catch {
        case _: java.net.SocketTimeoutException => None // idle: 0 bytes consumed
        case _: EOFException => streamClosed = true; return frames.result()
      }
      val msg: (Char, Array[Byte]) = first match {
        case None => return frames.result()
        case Some(tpe) =>
          // mid-message from here on: a timeout PROPAGATES (broken
          // stream) rather than masquerading as idle
          socket.setSoTimeout(MessageBodyTimeoutMs)
          val len = in.readInt()
          if (len < 4) throw new EOFException(s"bad message length $len for '$tpe'")
          val body = new Array[Byte](len - 4)
          try in.readFully(body) catch {
            case _: EOFException => streamClosed = true; return frames.result()
          }
          (tpe, body)
      }
      msg match {
        case ('d', body) =>
          val buf = java.nio.ByteBuffer.wrap(body)
          buf.get().toChar match {
            case 'w' =>
              val walStart = buf.getLong()
              val walEnd = buf.getLong()
              buf.getLong() // server clock
              val payload = new Array[Byte](buf.remaining())
              buf.get(payload)
              serverWalEnd = math.max(serverWalEnd, walEnd)
              frames += WalFrame(walStart, walEnd, payload)
              n += 1
            case 'k' =>
              val walEnd = buf.getLong()
              buf.getLong() // clock
              val replyRequested = buf.get() != 0
              serverWalEnd = math.max(serverWalEnd, walEnd)
              if (replyRequested) sendStatusUpdate(flushedLsn)
            case other => throw new IllegalStateException(
              s"unexpected CopyData payload '$other'")
          }
        case ('E', body) =>
          throw new IllegalStateException(PgWire.errorMessage(body))
        case (_, _) => // CommandComplete etc. on graceful end
      }
    }
    frames.result()
  }

  /** StandbyStatusUpdate: written/flushed/applied all at `flushed` —
    * the source of `confirmed_flush_lsn` motion on the server
    * (reference acks the same way: stream.go's CommitLSN). */
  def sendStatusUpdate(flushed: Long, requestReply: Boolean = false): Unit = {
    val body = java.nio.ByteBuffer.allocate(1 + 8 * 4 + 1)
    body.put('r'.toByte)
    body.putLong(flushed); body.putLong(flushed); body.putLong(flushed)
    body.putLong(PgWire.nowPgMicros())
    body.put(if (requestReply) 1.toByte else 0.toByte)
    PgWire.writeMessage(out, 'd', body.array())
  }

  override def close(): Unit = {
    if (out != null) {
      // CopyDone + Terminate, best-effort
      try {
        PgWire.writeMessage(out, 'c', Array.emptyByteArray)
        PgWire.writeMessage(out, 'X', Array.emptyByteArray)
      } catch { case _: java.io.IOException => }
    }
    if (socket != null) socket.close()
  }
}

/** Tails a replication socket into a [[PgOutputFrameLog]] directory.
  *
  * Each drain appends one log segment and only then acknowledges the
  * segment's last WAL position — the ack-after-durable ordering that
  * makes a crash replay (never lose) rather than skip.
  *
  * Durable resumption state lives IN THE SEGMENT NAMES
  * (`wal-<pos hex>-<n>-<seq>.seg`): the append that lands the frames
  * is the same atomic step that records how far the log reaches, so
  * no crash window can separate data from position (a sidecar file
  * updated after the append had exactly that window — and lived
  * inside the directory the frame-log reader globs as segments).
  *
  * Real walsenders stamp every frame of a transaction with its own
  * LSN and several frames can SHARE one (Relation + the change that
  * triggered it), so an LSN alone cannot say which frames at the
  * boundary are already durable. The position is therefore the pair
  * (walPos, framesAtPos): the highest WAL position appended plus how
  * many frames carrying exactly that position the log holds. On
  * reconnect the slot replays a prefix of the same frame sequence;
  * the tailer drops frames below the position, drops the first
  * `framesAtPos` frames AT it, and disengages the filter at the
  * first genuinely new frame — turning the slot's at-least-once
  * replay into an exactly-once log.
  */
final class ReplicationTailer(initial: PgReplicationClient, logDir: String) {

  // the active connection; the supervised run loop replaces it on
  // reconnect (single-threaded access, like the reference's loop)
  private var client: PgReplicationClient = initial
  private var segmentSeq = 0L
  // in-session replay-skip state, seeded from the durable position
  private var walPos = 0L
  private var framesAtPos = 0L
  private var replayRemaining = 0L
  private var inReplay = false

  private val SegmentName = "wal-([0-9a-f]{16})-([0-9]{8})-[0-9]{6}\\.seg".r

  /** Durable (walPos, framesAtPos), read from segment names — exact
    * even after a crash at any point, because the segment append IS
    * the position record. */
  def durablePosition: (Long, Long) = {
    val d = new java.io.File(logDir)
    val positions = Option(d.listFiles()).getOrElse(Array.empty).toSeq
      .flatMap(f => f.getName match {
        case SegmentName(hex, n) =>
          Some((java.lang.Long.parseLong(hex, 16), n.toLong))
        case _ => None
      })
    if (positions.isEmpty) (0L, 0L) else positions.max
  }

  def durableWalPosition: Long = durablePosition._1

  /** Connect and enter the replication stream from the durable
    * position. */
  def start(slot: String, publication: String): Unit = {
    val (p, n) = durablePosition
    walPos = p
    framesAtPos = n
    replayRemaining = n
    inReplay = p > 0 || n > 0
    client.connect()
    client.startReplication(slot, publication, p)
  }

  /** One drain cycle: poll → skip replayed prefix → durable append →
    * ack. Returns the number of NEW frames landed. */
  def tailOnce(maxFrames: Int = 5000, timeoutMs: Int = 250): Int = {
    val got = client.poll(maxFrames, timeoutMs, walPos)
    val fresh = got.filter { f =>
      if (!inReplay) true
      else if (f.walEnd < walPos) false
      else if (f.walEnd == walPos && replayRemaining > 0) {
        replayRemaining -= 1; false
      } else {
        inReplay = false; true
      }
    }
    if (fresh.nonEmpty) {
      val newPos = fresh.map(_.walEnd).max
      val atNew = fresh.count(_.walEnd == newPos)
      framesAtPos = if (newPos == walPos) framesAtPos + atNew else atNew
      walPos = newPos
      segmentSeq += 1
      val name = f"wal-$walPos%016x-$framesAtPos%08d-$segmentSeq%06d.seg"
      PgOutputFrameLog.append(logDir, name, fresh.map(_.frame))
      client.sendStatusUpdate(walPos)
    } else if (got.isEmpty) {
      // idle: keep the slot's view of our progress fresh
      client.sendStatusUpdate(walPos)
    }
    fresh.size
  }

  /** Supervised drain loop: tail until `stop()` goes true,
    * reconnecting with exponential backoff when the server drops the
    * stream (the reference's manager restarts its receive loop the
    * same way). Resumption is always from the durable position —
    * [[start]] re-derives it from the log, so a mid-loop crash and a
    * supervised reconnect recover identically.
    *
    * @param connect builds a FRESH client per (re)connection; the
    *   current one is closed first.
    * @return total new frames landed.
    */
  def run(slot: String, publication: String, stop: () => Boolean,
      connect: () => PgReplicationClient,
      maxFrames: Int = 5000, timeoutMs: Int = 250,
      backoffBaseSeconds: Double = 0.1, backoffMaxSeconds: Double = 30.0)
      : Long = {
    var attached = false // first iteration (re)starts via the same path
    var landed = 0L
    var errors = 0
    var firstAttach = true
    while (!stop()) {
      try {
        if (!attached) {
          if (firstAttach) firstAttach = false
          else { client.close(); client = connect() }
          // start() re-derives the durable position from the log, so
          // mid-loop crash recovery and a supervised reconnect are
          // the same code path
          start(slot, publication)
          attached = true
        }
        landed += tailOnce(maxFrames, timeoutMs)
        errors = 0
        if (client.streamClosed) attached = false
      } catch {
        case _: java.io.IOException | _: IllegalStateException =>
          attached = false
          errors += 1
          val sleepMs = (math.min(backoffMaxSeconds,
            backoffBaseSeconds * math.pow(2.0, (errors - 1).toDouble)) * 1000).toLong
          Thread.sleep(sleepMs)
      }
    }
    client.close()
    landed
  }
}
