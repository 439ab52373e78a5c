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
  *  - resumption state is the `_wal_position` sidecar: on reconnect
  *    the tailer restarts the slot from the last durable WAL end and
  *    skips any frames the server replays below it, so the log never
  *    double-appends (the slot's replay is the reference's
  *    at-least-once; the sidecar filter restores exactly-once into
  *    the log).
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

  /** Drain frames until `maxFrames` are buffered or `timeoutMs`
    * passes without data. Primary keepalives requesting a reply are
    * answered inline with the caller's last flushed position. */
  def poll(maxFrames: Int, timeoutMs: Int, flushedLsn: Long): Seq[WalFrame] = {
    val frames = Seq.newBuilder[WalFrame]
    var n = 0
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    while (n < maxFrames && System.nanoTime() < deadline) {
      val waitMs = math.max(1L, (deadline - System.nanoTime()) / 1000000L)
      socket.setSoTimeout(math.min(waitMs, Int.MaxValue.toLong).toInt)
      val msg = try Some(PgWire.readMessage(in)) catch {
        case _: java.net.SocketTimeoutException => None
        case _: EOFException => return frames.result()
      }
      msg match {
        case None => return frames.result()
        case Some(('d', body)) =>
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
        case Some(('E', body)) =>
          throw new IllegalStateException(PgWire.errorMessage(body))
        case Some((_, _)) => // CommandComplete etc. on graceful end
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
  * segment's last WAL end — the ack-after-durable ordering that makes
  * a crash replay (never lose) rather than skip. The `_wal_position`
  * sidecar records the durable WAL high-water mark: reconnects
  * restart the slot there and drop any replayed frames at or below
  * it, so the at-least-once socket becomes an exactly-once log.
  */
final class ReplicationTailer(client: PgReplicationClient, logDir: String) {
  import java.nio.file.{Files, Paths, StandardCopyOption}

  private val walFile = Paths.get(logDir, "_wal_position")
  private var segmentSeq = 0L

  def durableWalPosition: Long =
    if (Files.exists(walFile))
      new String(Files.readAllBytes(walFile), StandardCharsets.UTF_8).trim.toLong
    else 0L

  private def recordWalPosition(lsn: Long): Unit = {
    Files.createDirectories(Paths.get(logDir))
    val tmp = Paths.get(logDir, "_wal_position.tmp")
    Files.write(tmp, lsn.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, walFile, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Connect and enter the replication stream from the durable
    * position. */
  def start(slot: String, publication: String): Unit = {
    client.connect()
    client.startReplication(slot, publication, durableWalPosition)
  }

  /** One drain cycle: poll → filter replays → durable append → ack.
    * Returns the number of NEW frames landed. */
  def tailOnce(maxFrames: Int = 5000, timeoutMs: Int = 250): Int = {
    val flushed = durableWalPosition
    val got = client.poll(maxFrames, timeoutMs, flushed)
    // the slot replays from confirmed_flush on reconnect: drop frames
    // the log already holds durably
    val fresh = got.filter(_.walEnd > flushed)
    if (fresh.nonEmpty) {
      segmentSeq += 1
      val name = f"wal-${System.currentTimeMillis()}%013d-$segmentSeq%06d.seg"
      PgOutputFrameLog.append(logDir, name, fresh.map(_.frame))
      val newFlushed = fresh.map(_.walEnd).max
      recordWalPosition(newFlushed)
      client.sendStatusUpdate(newFlushed)
    } else if (got.isEmpty) {
      // idle: keep the slot's view of our progress fresh
      client.sendStatusUpdate(flushed)
    }
    fresh.size
  }
}
