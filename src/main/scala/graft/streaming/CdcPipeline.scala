package graft.streaming

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.model.{Envelope, TableSchema}
import graft.ops.ChangelogOps
import graft.sinks.{InsertResult, Sink}

/** The streaming consume loop: envelope micro-batches → sequencing →
  * sink insert → ack watermark confirm.
  *
  * Maps the reference's sink.Consume wiring (reference:
  * pkg/sinks/generic/sink.go:81-122 consume loop + flush ticker;
  * cmd/pgsink/cmd/app.go:340-346 ack hookup) onto Structured
  * Streaming: the trigger interval IS the flush epoch, foreachBatch
  * completion IS the flush barrier, and the checkpoint plus our
  * monotonic confirm callback IS `stream.Confirm(lsn)`.
  */
object CdcPipeline {

  /** Monotonic ack watermark: confirming a position below the current
    * one is a bug in the caller — the reference panics on regression
    * (pkg/subscription/stream.go:47-55). */
  final class AckWatermark {
    private val current = new AtomicLong(-1L)
    def confirm(lsn: Long): Unit = {
      val prev = current.getAndUpdate(c => math.max(c, lsn))
      require(lsn >= prev,
        s"ack watermark regression: confirm($lsn) after $prev")
    }
    def position: Option[Long] = Option(current.get()).filter(_ >= 0)
  }

  /** Start one per-table streaming query — plan-per-table mirrors the
    * reference's one-inserter-per-route design
    * (pkg/sinks/generic/router.go:30-41).
    *
    * @param envelopes streaming DataFrame in envelope layout
    * @param flushInterval the reference's default is 5s
    *                      (pkg/sinks/file/sink.go:30)
    */
  def start(
      envelopes: DataFrame,
      table: TableSchema,
      sink: Sink,
      watermark: AckWatermark,
      checkpoint: String,
      flushInterval: String = "5 seconds"): StreamingQuery = {
    sink.handleSchema(table)
    envelopes.writeStream
      .queryName(s"cdc-${table.ref.qualified}")
      .trigger(Trigger.ProcessingTime(flushInterval))
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val result = sink.insert(table, batch)
        result.lsn.foreach(watermark.confirm)
        ()
      }
      .start()
  }

  /** Batch-mode consume for tests and replays: same dispatch, no
    * trigger. Returns the fold of all insert results. */
  def consumeBatch(
      envelopes: DataFrame,
      table: TableSchema,
      sink: Sink,
      watermark: AckWatermark): InsertResult = {
    sink.handleSchema(table)
    val result = sink.insert(table, envelopes)
    result.lsn.foreach(watermark.confirm)
    result
  }
}
