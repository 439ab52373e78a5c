package graft.streaming

import java.util.concurrent.atomic.AtomicBoolean
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery

import graft.sinks.Sink
import graft.sources.{PgReplicationClient, ReplicationTailer}

/** The complete live CDC composition — the reference's
  * `pgsink stream --consume` (cmd/pgsink/cmd/app.go:340-346) built
  * from the two halves this engine already has:
  *
  *   socket → [ReplicationTailer, daemon thread] → durable frame log
  *          → [FrameStreamPipeline, Structured Streaming] → sink → ack
  *
  * The frame log in the middle is deliberate, not incidental: it is
  * the replayable boundary that separates the at-least-once wire
  * protocol from Spark's checkpointed offsets. The tailer owns WAL
  * positions (resume-from-durable, replay skipping, ack-after-append
  * — see [[ReplicationTailer]]); the streaming query owns frame
  * positions (checkpoint commits, admission control); neither needs
  * the other's failure semantics. Killing either side and restarting
  * it resumes exactly where it left off, independently.
  *
  * The tailer appends segments while the query's micro-batches read
  * them — safe because segments are immutable once written and
  * `latestOffset` counts only complete frames (torn tails are
  * invisible; see PgOutputFrameLog).
  */
object SocketCdcPipeline {

  /** Both halves of a running live pipeline. [[stop]] winds down the
    * tailer first (no new frames), lets the query drain the log, then
    * stops it — the reference's two-phase shutdown order. */
  final class Handle private[SocketCdcPipeline] (
      val query: StreamingQuery,
      tailerThread: Thread,
      stopFlag: AtomicBoolean) {
    def stop(): Unit = {
      stopFlag.set(true)
      tailerThread.join(30000)
      query.processAllAvailable() // drain what the tailer landed
      query.stop()
    }
  }

  /** Start the live pipeline.
    *
    * @param connect builds a replication client per (re)connection —
    *   the supervised tailer loop reconnects with backoff on drops.
    * @param logDir durable frame-log directory (also the resume
    *   state: WAL positions ride the segment names).
    */
  def start(
      spark: SparkSession,
      connect: () => PgReplicationClient,
      slot: String,
      publication: String,
      logDir: String,
      sink: Sink,
      watermark: CdcPipeline.AckWatermark,
      checkpoint: String,
      flushInterval: String = "5 seconds",
      retainLog: Boolean = true): Handle = {
    val stop = new AtomicBoolean(false)
    val tailer = new ReplicationTailer(connect(), logDir)
    val thread = new Thread(
      () => { tailer.run(slot, publication, () => stop.get(), connect); () },
      "graft-replication-tailer")
    thread.setDaemon(true)
    thread.start()
    // retention on by default: the composed pipeline is the log's
    // single consumer, so segments behind the query's read position
    // are the WAL a replication slot would have recycled already
    val query = FrameStreamPipeline.start(
      spark, logDir, sink, watermark, checkpoint, flushInterval,
      retainLog = retainLog)
    new Handle(query, thread, stop)
  }
}
