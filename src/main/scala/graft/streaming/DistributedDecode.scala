package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.{ColumnSpec, Envelope, Operation, TableSchema}
import graft.sources.{ChangelogBuilder, PgOutput, TextDecode}

/** Distributed frame decode — the scale path for the CDC core.
  *
  * [[FrameStreamPipeline]] decodes every frame on the driver because
  * the relation cache and transaction framing are ordered state; that
  * caps throughput at one core no matter the cluster. This decoder
  * splits the stream by frame KIND instead:
  *
  *  - control frames (Begin/Commit/Relation/Origin/Type — one per
  *    transaction or schema change, a vanishing fraction of the log)
  *    still fold on the driver, in position order, into (a) a
  *    versioned relation registry and (b) the batch's transaction
  *    table [(beginPos, commitLsn, commitTs, seqOffset)];
  *  - row frames (Insert/Update/Delete — the volume) decode in
  *    EXECUTORS against broadcasts of those two tables: a row's
  *    transaction is the last Begin at-or-before its position, its
  *    schema the last Relation version at-or-before its position.
  *
  * Per-transaction sequence numbers come from `row_number()` over
  * (transaction, position) — one shuffle on the transaction id — plus
  * the carried offset for a transaction left open by the previous
  * micro-batch. Output rows use the [[GenericPlane]] text-map
  * envelope; results are verified equal to the ordered
  * [[ChangelogBuilder]] path (DistributedDecodeSpec), including
  * schema changes mid-stream and transactions spanning batches.
  */
final class DistributedDecode {
  import DistributedDecode._

  // driver state, position-ordered like ChangelogBuilder's
  private val relVersions =
    scala.collection.mutable.Map.empty[Long, Vector[(Long, TableSchema)]]
  private val fingerprints = scala.collection.mutable.Map.empty[Long, String]
  private var openTxn: Option[TxnState] = None
  // last Begin's commit time — ChangelogBuilder keeps it past Commit
  // and stamps between-transaction schema entries with it
  private var lastTs: Timestamp = new Timestamp(0)

  /** Known schema by qualified name (latest version). */
  def schemaOf(qualified: String): Option[TableSchema] =
    relVersions.values.flatMap(_.lastOption).map(_._2)
      .find(_.ref.qualified == qualified)

  /** Decode one micro-batch of (position, frame) rows.
    * @return schema entries (in order) + the decoded modifications as
    *         a GenericPlane-shaped DataFrame
    */
  def processBatch(spark: SparkSession, batch: DataFrame)
      : (Seq[ChangelogBuilder.SchemaEntry], DataFrame) = {
    // ---- driver pass: control frames only (B/C/R/O/Y lead bytes)
    // ---- ONE driver-side scan for everything the driver needs:
    // control-frame bytes, every frame's lead byte (for the open-txn
    // tail count), and 'T' bytes (truncates take one sequence slot
    // per relation — their exact count needs the relation list).
    // Collecting (position, lead, ctl-bytes) is ~10 B/frame, bounded
    // by admission control; the previous shape paid three separate
    // source scans per epoch (ctl collect, tail count, truncate
    // collect) plus a sort exchange before the collect — the position
    // sort now happens on the driver.
    val lead = substring(col("frame"), 1, 1)
    val driverFrames = batch.select(
        col("position").cast("long"),
        lead.as("lead"),
        when(lead.isin((ControlBytes :+ 'T'.toByte)
          .map(b => Array(b): Array[Byte]): _*), col("frame")).as("ctl"))
      .collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]]("lead")(0),
        r.getAs[Array[Byte]]("ctl")))
      .sortBy(_._1)
    val ctl = driverFrames.collect {
      case (pos, b, bytes) if ControlBytes.contains(b) => (pos, bytes)
    }

    val carried = openTxn // txn left open by the previous batch
    val schemas = Vector.newBuilder[ChangelogBuilder.SchemaEntry]
    val txns = Vector.newBuilder[TxnState]
    ctl.foreach { case (pos, bytes) =>
      PgOutput.decode(bytes) match {
        case PgOutput.Begin(finalLsn, tsMicros, _) =>
          val t = TxnState(pos, finalLsn,
            ChangelogBuilder.micros2ts(PgOutput.toUnixMicros(tsMicros)), 0L)
          txns += t
          openTxn = Some(t)
          lastTs = t.ts
        case _: PgOutput.Commit =>
          openTxn = None
        case r: PgOutput.Relation =>
          val schema = TableSchema(r.id, r.namespace, r.name,
            r.columns.map(c => ColumnSpec(c.name, c.typeOid.toInt, c.key, c.modifier)))
          relVersions(r.id) =
            relVersions.getOrElse(r.id, Vector.empty) :+ (pos, schema)
          if (!fingerprints.get(r.id).contains(schema.fingerprint)) {
            fingerprints(r.id) = schema.fingerprint
            schemas += ChangelogBuilder.SchemaEntry(
              lastTs, openTxn.map(_.lsn), schema)
          }
        case _ => // Origin / Type: no-op
      }
    }
    val txnTable: Vector[TxnState] =
      (carried.toVector ++ txns.result()).sortBy(_.beginPos)

    // ---- executor pass: row frames against broadcast tables
    val sc = spark.sparkContext
    val bTxns = sc.broadcast(txnTable.map(t => (t.beginPos, t.lsn, t.ts, t.seqOffset)))
    val bRels = sc.broadcast(relVersions.view.mapValues(_.toArray).toMap)

    import spark.implicits._
    val rows = batch
      .where(substring(col("frame"), 1, 1)
        .isin(RowBytes.map(b => Array(b): Array[Byte]): _*))
      .select(col("position").cast("long"), col("frame"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // hoist the broadcast lookups' key arrays out of the per-row
        // loop: at volume, a fresh allocation per row is the decode
        // loop's dominant garbage
        val txnTableLocal = bTxns.value
        val beginKeys: IndexedSeq[Long] = txnTableLocal.map(_._1)
        val relKeys: Map[Long, (Array[Long], Array[(Long, TableSchema)])] =
          bRels.value.view.mapValues(vs => (vs.map(_._1), vs)).toMap
        it.flatMap { case (pos, bytes) =>
          val txnIdx = floorIndex(beginKeys, pos)
          require(txnIdx >= 0, s"row frame at $pos before any Begin")
          val (beginPos, lsn, ts, _) = txnTableLocal(txnIdx)
          def relOf(id: Long): TableSchema = {
            val (keys, versions) = relKeys.getOrElse(id,
              throw ChangelogBuilder.UnknownRelationException(id))
            val vi = floorIndex(scala.collection.immutable.ArraySeq.unsafeWrapArray(keys), pos)
            versions(if (vi < 0) 0 else vi)._2
          }
          PgOutput.decode(bytes) match {
            case PgOutput.Insert(relId, tuple) =>
              val rel = relOf(relId)
              Seq(DecodedRow(rel.namespace, rel.name, ts, lsn, beginPos, pos,
                null, textify(rel, tuple)))
            case PgOutput.Update(relId, _, oldT, newT) =>
              val rel = relOf(relId)
              Seq(DecodedRow(rel.namespace, rel.name, ts, lsn, beginPos, pos,
                oldT.map(textify(rel, _)).orNull, textify(rel, newT)))
            case PgOutput.Delete(relId, _, oldT) =>
              val rel = relOf(relId)
              Seq(DecodedRow(rel.namespace, rel.name, ts, lsn, beginPos, pos,
                textify(rel, oldT), null))
            case PgOutput.Truncate(_, relIds) =>
              // one marker row per truncated relation, both images
              // null — the generic plane's in-band TRUNCATE envelope
              relIds.map { relId =>
                val rel = relOf(relId)
                DecodedRow(rel.namespace, rel.name, ts, lsn, beginPos, pos,
                  null, null)
              }
            case other =>
              throw new IllegalStateException(s"unexpected row frame: $other")
          }
        }
      }

    val offsetDf = txnTable.map(t => (t.beginPos, t.seqOffset))
      .toDF("_begin", "_off")
    // (namespace, name) tiebreak: a multi-relation truncate expands
    // one frame position into several rows — deterministic sequence
    // assignment needs a total order
    val seqW = Window.partitionBy(col("beginPos"))
      .orderBy(col("pos"), col("namespace"), col("name"))
    val out = rows.toDF()
      .join(broadcast(offsetDf), col("beginPos") === col("_begin"))
      .withColumn(Envelope.SequenceCol,
        row_number().over(seqW).cast("long") + col("_off"))
      .withColumn(Envelope.OperationCol,
        when(col("before").isNull && col("after").isNull, Operation.Truncate)
          .when(col("before").isNull, Operation.Insert)
          .when(col("after").isNull, Operation.Delete)
          .otherwise(Operation.Update))
      .select(col("namespace"), col("name"),
        col("ts").as(Envelope.TimestampCol),
        col("lsn").as(Envelope.LsnCol),
        col(Envelope.SequenceCol),
        col(Envelope.OperationCol),
        col("before").as(Envelope.BeforeCol),
        col("after").as(Envelope.AfterCol))

    // carry the open transaction's row count into the next batch —
    // counted from frame lead bytes (all row frames past the last
    // Begin belong to it), so the decode path is not re-executed.
    // Truncate frames take one sequence slot PER relation, so the
    // rare 'T' frames are decoded driver-side for their exact count.
    openTxn.foreach { t =>
      var plainRows = 0L
      var truncSlots = 0L
      driverFrames.foreach { case (pos, b, bytes) =>
        if (pos > t.beginPos && RowBytes.contains(b)) {
          if (b == 'T'.toByte) PgOutput.decode(bytes) match {
            case PgOutput.Truncate(_, ids) => truncSlots += ids.size.toLong
            case _ => ()
          }
          else plainRows += 1L
        }
      }
      openTxn = Some(t.copy(seqOffset = t.seqOffset + plainRows + truncSlots))
    }
    (schemas.result(), out)
  }
}

object DistributedDecode {

  /** The distributed counterpart of [[FrameStreamPipeline.start]]:
    * frame source → distributed decode → generic-plane raw append →
    * ack. One streaming query; each flush epoch appends the decoded
    * modifications to the partitioned raw table and confirms the
    * batch's max LSN (append-only + latest-row view keeps replays
    * harmless, so confirming after the append preserves the
    * at-least-once contract).
    */
  def start(
      spark: SparkSession,
      frameDir: String,
      planeRoot: String,
      watermark: CdcPipeline.AckWatermark,
      checkpoint: String,
      flushInterval: String = "5 seconds",
      maxFramesPerTrigger: Option[Long] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val decoder = new DistributedDecode
    val reader = spark.readStream
      .format("graft.sources.PgOutputFrameSource")
      .option("path", frameDir)
    maxFramesPerTrigger.foreach(n =>
      reader.option("maxFramesPerTrigger", n.toString))
    reader.load()
      .writeStream
      .queryName(s"cdc-frames-distributed($frameDir)")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(flushInterval))
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val (_, mods) = decoder.processBatch(spark, batch)
        val staged = mods.localCheckpoint(true) // decode once: append + max-lsn
        if (staged.count() > 0) {
          GenericPlane.append(staged, planeRoot)
          val maxLsn = staged.agg(max(col(Envelope.LsnCol))).collect()(0)
          if (!maxLsn.isNullAt(0)) watermark.confirm(maxLsn.getLong(0))
        }
        ()
      }
      .start()
  }

  private val ControlBytes: Seq[Byte] =
    Seq('B', 'C', 'R', 'O', 'Y').map(_.toByte)
  /** 'T' (truncate) rides the ROW pass: it needs the versioned
    * relation cache to resolve its table list and a sequence slot to
    * order against row changes in the same transaction — both live
    * executor-side. It decodes to one both-images-null row per
    * truncated relation (operation TRUNCATE). */
  private val RowBytes: Seq[Byte] = Seq('I', 'U', 'D', 'T').map(_.toByte)

  private final case class TxnState(
      beginPos: Long, lsn: Long, ts: Timestamp, seqOffset: Long)

  /** Decoded row pre-sequencing (executor-side shape). */
  final case class DecodedRow(
      namespace: String, name: String, ts: Timestamp, lsn: Long,
      beginPos: Long, pos: Long,
      before: Map[String, String], after: Map[String, String])

  /** Largest index i with keys(i) <= target, -1 if none. */
  private def floorIndex(keys: IndexedSeq[Long], target: Long): Int = {
    var lo = 0; var hi = keys.length - 1; var res = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (keys(mid) <= target) { res = mid; lo = mid + 1 } else hi = mid - 1
    }
    res
  }

  /** Typed decode then text render — the same value rendering as
    * GenericPlane.toGeneric over the driver path, so the two decode
    * paths are directly comparable. Unchanged-TOAST cells are
    * omitted like ChangelogBuilder.marshal omits them. */
  private def textify(
      rel: TableSchema, tuple: PgOutput.TupleData): Map[String, String] = {
    val out = Map.newBuilder[String, String]
    rel.columns.zip(tuple.elements).foreach { case (colSpec, cell) =>
      if (!cell.isNull && !cell.isUnchangedToast) {
        val v = TextDecode.decode(colSpec.pgOid, cell.text.get)
        if (v != null) out += colSpec.name -> v.toString
      }
    }
    out.result()
  }
}
