package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType
import graft.model.{Envelope, TableSchema}
import graft.sinks.{InsertResult, Sink}
import graft.sources.{ChangelogBuilder, PgOutput}

/** The complete streaming CDC lifecycle (SURVEY §3.1) on Spark:
  * frame source → ordered decode → route per table → sink insert →
  * ack. One streaming query; the driver-side decode is the ordered,
  * stateful stage (relation cache + transaction framing live across
  * micro-batches in a [[ChangelogBuilder]]); everything from the
  * envelope DataFrame on is distributed.
  *
  * This mirrors the reference's thread chain — receive loop,
  * Sequence, BuildChangelog, router, sink (cmd/pgsink/cmd/app.go:
  * 340-346) — collapsed onto Structured Streaming's micro-batch
  * clock: trigger = flush interval, foreachBatch = flush epoch,
  * checkpoint commit + AckWatermark = Confirm.
  */
object FrameStreamPipeline {

  /** Shared pool for the per-table concurrent inserts: one flush
    * epoch runs at a time per query, so a process-wide bounded pool
    * (8 daemon threads, idle-reclaimed) serves every pipeline without
    * per-epoch executor churn — a 1-second trigger would otherwise
    * create and tear down a pool every epoch, forever. The cap bounds
    * driver-side row-conversion concurrency; Spark job SUBMISSION is
    * cheap and the jobs themselves share the executor pool. */
  private lazy val insertEc: scala.concurrent.ExecutionContext = {
    val tf = new java.util.concurrent.ThreadFactory {
      private val n = new java.util.concurrent.atomic.AtomicInteger(0)
      override def newThread(r: Runnable): Thread = {
        val t = new Thread(r, s"graft-table-insert-${n.incrementAndGet()}")
        t.setDaemon(true)
        t
      }
    }
    // core == max with core-timeout: an unbounded work queue means
    // maxPoolSize beyond core NEVER engages (the JDK grows past core
    // only when the queue rejects), so the 8 threads must all be core
    // — idle ones reclaim after 30s via allowCoreThreadTimeOut
    val pool = new java.util.concurrent.ThreadPoolExecutor(
      8, 8, 30L, java.util.concurrent.TimeUnit.SECONDS,
      new java.util.concurrent.LinkedBlockingQueue[Runnable](), tf)
    pool.allowCoreThreadTimeOut(true)
    scala.concurrent.ExecutionContext.fromExecutor(pool)
  }

  def start(
      spark: SparkSession,
      frameDir: String,
      sink: Sink,
      watermark: CdcPipeline.AckWatermark,
      checkpoint: String,
      flushInterval: String = "5 seconds",
      maxFramesPerTrigger: Option[Long] = None,
      retainLog: Boolean = false): StreamingQuery = {
    val builder = new ChangelogBuilder // driver-side, lives across batches

    val reader = spark.readStream
      .format("graft.sources.PgOutputFrameSource")
      .option("path", frameDir)
    // flush-epoch sizing knob, the reference's --import-worker.buffer
    // shape: None keeps the source's default admission bound (5000)
    maxFramesPerTrigger.foreach(n =>
      reader.option("maxFramesPerTrigger", n.toString))
    reader.load()
      .writeStream
      .queryName(s"cdc-frames($frameDir)")
      .trigger(Trigger.ProcessingTime(flushInterval))
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val batchStart = processBatch(spark, batch, builder, sink, watermark)
        // Drop log segments this consumer can never need again: every
        // frame before THIS batch's first position is committed in
        // the checkpoint (the current batch itself stays — it may
        // replay after a crash). Retention follows the read position,
        // the restart_lsn-advance move of the reference's slot. Only
        // sound when this query is the log's single consumer — the
        // composed live pipeline's shape.
        if (retainLog)
          batchStart.foreach(p =>
            graft.sources.PgOutputFrameLog.retain(frameDir, p))
        ()
      }
      .start()
  }

  /** One flush epoch: decode the batch's frames in position order,
    * dispatch Schema entries to sink DDL, group modifications per
    * table (the Router), append, and confirm the max LSN. */
  private[streaming] def processBatch(
      spark: SparkSession,
      batch: DataFrame,
      builder: ChangelogBuilder,
      sink: Sink,
      watermark: CdcPipeline.AckWatermark): Option[Long] = {
    // the driver-side collect here is bounded by the source's
    // admission control (maxFramesPerTrigger, default 5000 — see
    // PgOutputFrameSource), not by backlog size: a restart against a
    // large frame log drains in bounded micro-batches. The position
    // sort happens on the driver — a distributed orderBy before a
    // full collect pays a range-sampling job plus a sort exchange per
    // flush epoch for an array the driver re-materializes anyway.
    val collected = batch.select("position", "frame").collect()
      .sortBy(_.getLong(0))
    val frames = collected.map(_.getAs[Array[Byte]]("frame"))
    if (frames.isEmpty) return None
    val entries = builder.push(frames.iterator.map(PgOutput.decode)).toVector

    val schemas = scala.collection.mutable.Map.empty[String, TableSchema]
    entries.foreach {
      case ChangelogBuilder.SchemaEntry(_, _, schema) =>
        sink.handleSchema(schema)
        schemas(schema.ref.qualified) = schema
      case _ =>
    }

    val mods = entries.collect { case m: ChangelogBuilder.ModificationEntry => m }
    var maxLsn: Option[Long] = None
    // Per-table inserts run CONCURRENTLY: each table's append is one
    // driver-issued Spark job, and the routed path's cost at N tables
    // is N sequential jobs per flush epoch if issued one at a time —
    // the fan-out term StreamBench measures (8 tables halved
    // throughput when serialized). Spark's scheduler interleaves
    // concurrently-submitted jobs across the executor pool, so
    // submitting them together is the reference's per-table async
    // inserter (pkg/sinks buffered inserters, one per table) on
    // Spark's clock. Bounded pool: table count capped at 8 threads —
    // job SUBMISSION is cheap, the cap only bounds driver-side row
    // conversion concurrency. Ordering is untouched: rows within a
    // table stay one append; cross-table ordering is carried by
    // (timestamp, lsn, sequence) in the data, not by call order; the
    // epoch's ack still waits for EVERY insert (Await below), so a
    // failure fails the batch before anything is confirmed.
    val byTable = mods.groupBy(m => s"${m.namespace}.${m.name}").toSeq
    if (byTable.nonEmpty) {
      implicit val ec: scala.concurrent.ExecutionContext = insertEc
      // Spark's job group / description ride InheritableThreadLocal
      // local properties, which pool threads inherit from whichever
      // thread CREATED them — not the submitting micro-batch thread.
      // Without re-stamping, StreamExecution.stop()'s cancelJobGroup
      // misses in-flight insert jobs (and, with two pipelines in one
      // process, can cancel the OTHER query's). Snapshot the three
      // relevant properties here and set them inside every future.
      val sc = spark.sparkContext
      val localProps = Seq("spark.jobGroup.id", "spark.job.description",
        "spark.job.interruptOnCancel").map(k => k -> sc.getLocalProperty(k))
      locally {
        // Resolve EVERY table's schema before creating ANY future: a
        // Future submits on construction, so resolving inside the same
        // map would let a missing-schema throw escape this block while
        // earlier tables' inserts are still in flight — exactly the
        // orphaned-write vs supervisor-replay race the settle-all
        // barrier below exists to prevent. Schema comes from this
        // batch, or the builder's cache when the Relation message
        // arrived in an earlier flush epoch.
        val resolved = byTable.map { case (table, ms) =>
          val schema = schemas.getOrElse(table, builder.schemaOf(table)
            .getOrElse(throw new IllegalStateException(
              s"no schema known for $table: relation must precede rows")))
          (schema, ms)
        }
        val inserts = resolved.map { case (schema, ms) =>
          scala.concurrent.Future {
            localProps.foreach { case (k, v) => sc.setLocalProperty(k, v) }
            val payloadType = schema.payloadStruct
            val rows = ms.map(m => Row(
              m.timestamp, m.lsn.orNull, m.sequence.orNull,
              Envelope.operationOf(m.lsn, m.before, m.after),
              imageRow(payloadType, m.before), imageRow(payloadType, m.after),
              if (m.unchangedToast.isEmpty) null else m.unchangedToast))
            // LocalRelation, not parallelize(rows): the local form
            // converts to compact UnsafeRows ONCE on the driver and
            // ships binary; parallelize Java-serializes every nested
            // Row into the task closures on each use
            val df = spark.createDataFrame(
              scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava,
              Envelope.schemaFor(payloadType, withToastMarker = true))
            // the fold is already known on the driver (we hold the
            // rows): pass it down so the sink skips the count/max job
            val known = InsertResult(ms.size.toLong,
              ms.flatMap(_.lsn).reduceOption(_ max _))
            sink.insertCounted(schema, df, known)
          }
        }
        // SETTLE every insert before judging the epoch: a fail-fast
        // rethrow would leave sibling writes in flight past the batch
        // failure, and a supervisor-restarted query's replay could
        // then append to the same raw-table path CONCURRENTLY with
        // the orphaned write (two jobs sharing one FileOutputCommitter
        // staging dir can destroy each other's task files). All
        // futures complete — success or failure — then the first
        // failure fails the epoch with nothing left running.
        val settled = scala.concurrent.Await.result(
          scala.concurrent.Future.sequence(
            inserts.map(_.transform(scala.util.Success(_)))),
          scala.concurrent.duration.Duration.Inf)
        settled.collectFirst { case scala.util.Failure(e) => e }
          .foreach(e => throw e)
        maxLsn = settled.collect { case scala.util.Success(r) => r }
          .flatMap(_.lsn).reduceOption(_ max _)
      }
    }
    // truncates are position-stamped markers: ordering against the
    // inserts above is carried by (timestamp, lsn, sequence), not by
    // sink-call order, so recording them after the appends is safe —
    // and a truncate-only transaction still advances the ack watermark
    entries.foreach {
      case t: ChangelogBuilder.TruncateEntry =>
        sink.truncate(t.schema, t.timestamp, t.lsn, t.sequence)
        maxLsn = (maxLsn ++ t.lsn).reduceOption(_ max _)
      case _ =>
    }
    maxLsn.foreach(watermark.confirm)
    Some(collected.head.getLong(0)) // the epoch's first frame position
  }

  private def imageRow(payload: StructType, m: Option[Map[String, Any]]): Row =
    m.map { values =>
      Row.fromSeq(payload.fields.toIndexedSeq.map(f => values.get(f.name).orNull))
    }.orNull
}
