package graft.sinks

import java.util

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.connector.write.{DataWriter, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Full DSv2 streaming sink: the reference's `Sink.Consume(ctx,
  * changelog, ack)` contract (pkg/sinks/generic/sink.go:24-26)
  * expressed as a first-class `StreamingWrite` connector instead of
  * `foreachBatch` — SURVEY §2.11's "full DSv2 connector" option.
  *
  * Epoch protocol (exactly-once effect on top of Spark's
  * at-least-once epoch replay):
  *  1. every task writes its rows as JSON lines to
  *     `_staging/epoch=<e>/part-<partition>-<task>.jsonl` and
  *     reports (file, rows, maxLsn) in its commit message;
  *  2. the driver's `commit(e, msgs)` promotes exactly the reported
  *     files into `epoch=<e>/` and writes `_MANIFEST.json` last —
  *     the manifest is the commit mark, so readers ignore epochs
  *     without one (speculative/failed task files never get
  *     promoted, and a crash mid-promote leaves an uncommitted,
  *     retryable epoch);
  *  3. a replayed `commit` for an epoch whose manifest exists is a
  *     no-op that only clears staging — duplicates cannot reach the
  *     committed space. This mirrors the reference's ack watermark:
  *     acking a frame twice must be harmless
  *     (pkg/subscription/acknowledge.go semantics).
  *
  * The manifest carries (rows, maxLsn) — the [[InsertResult]] fold,
  * computed from per-task partials instead of a second aggregate
  * pass over the batch.
  *
  * Scale: one file per task per epoch, no driver data path — the
  * driver handles only commit messages (O(tasks)). All paths go
  * through the Hadoop FileSystem API, so `root` may be any supported
  * scheme; promote is a rename, atomic on HDFS-likes and
  * object-store-copy at worst.
  */
class EpochFileSink extends TableProvider {
  // write-only table: the real schema arrives per-query through
  // LogicalWriteInfo (the console-sink pattern); an empty schema here
  // keeps the provider resolvable on the write path
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType()
  override def supportsExternalMetadata(): Boolean = true
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new EpochFileTable(properties.get("path"), schema)
}

final class EpochFileTable(root: String, writeSchema: StructType)
    extends Table with SupportsWrite {
  require(root != null, "option 'path' is required")
  override def name(): String = s"graft-epoch-sink(`$root`)"
  override def schema(): StructType = writeSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.STREAMING_WRITE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toStreaming: StreamingWrite =
          new EpochStreamingWrite(root, info.schema())
      }
    }
}

final case class EpochFileMessage(file: String, rows: Long, maxLsn: Long)
  extends WriterCommitMessage

final class EpochStreamingWrite(root: String, schema: StructType)
    extends StreamingWrite with Serializable {

  // the driver's Hadoop conf, captured as plain pairs so executors can
  // rebuild it (the Configuration object itself is not serializable).
  // Only filesystem-relevant keys ship: the factory (and so every task
  // closure) serializes these pairs, and the full driver configuration
  // is hundreds of entries of pure data-path overhead.
  private val hadoopProps: Seq[(String, String)] = {
    import scala.jdk.CollectionConverters._
    val keep = Seq("fs.", "hadoop.", "dfs.", "io.")
    org.apache.spark.sql.SparkSession.active.sparkContext
      .hadoopConfiguration.iterator().asScala
      .map(e => e.getKey -> e.getValue)
      .filter { case (k, _) => keep.exists(k.startsWith) }
      .toSeq
  }

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new EpochWriterFactory(root, schema, hadoopProps)

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(root).getFileSystem(EpochFileSink.conf(hadoopProps))
    val epochDir = new Path(root, s"epoch=$epochId")
    val manifest = new Path(epochDir, "_MANIFEST.json")
    val staging = new Path(root, s"_staging/epoch=$epochId")
    if (!fs.exists(manifest)) {
      // No manifest => this epoch never committed. Any files already in
      // the epoch dir are remnants of a crash between promote and
      // manifest write on an earlier attempt; promoting on top of them
      // would leave rows visible to glob readers but absent from this
      // attempt's manifest — duplicates in exactly the crash window the
      // protocol exists for. Wipe the uncommitted dir first.
      if (fs.exists(epochDir)) fs.delete(epochDir, true)
      fs.mkdirs(epochDir)
      val msgs = messages.collect { case m: EpochFileMessage => m }
      msgs.foreach { m =>
        val src = new Path(m.file)
        if (fs.exists(src)) fs.rename(src, new Path(epochDir, src.getName))
      }
      val rows = msgs.map(_.rows).sum
      val lsn = if (msgs.isEmpty) -1L else msgs.map(_.maxLsn).max
      // render names through the JSON string escaper — the reader
      // parses this with a real JSON parser, so the writer must
      // produce real JSON even for hostile characters in names
      val files = msgs.map { m =>
        val sb = new StringBuilder
        EpochJson.appendString(sb, new Path(m.file).getName)
        sb.toString()
      }.sorted.mkString("[", ",", "]")
      val out = fs.create(manifest, true)
      try out.write(
        s"""{"epoch":$epochId,"rows":$rows,"lsn":$lsn,"files":$files}"""
          .getBytes("UTF-8"))
      finally out.close()
    }
    // replayed epoch (manifest already present): staged duplicates are
    // discarded, never promoted
    fs.delete(staging, true)
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(root).getFileSystem(EpochFileSink.conf(hadoopProps))
    fs.delete(new Path(root, s"_staging/epoch=$epochId"), true)
  }
}

object EpochFileSink {
  /** Rebuild a Hadoop Configuration from captured driver pairs. */
  private[sinks] def conf(props: Seq[(String, String)]): org.apache.hadoop.conf.Configuration = {
    val c = new org.apache.hadoop.conf.Configuration(false)
    props.foreach { case (k, v) => c.set(k, v) }
    c
  }

  /** Parse a `_MANIFEST.json` with a real JSON parser (json4s, the
    * one Spark ships) — a regex scrape would mis-split on escaped
    * quotes inside file names. Returns (lsn, file names). */
  private def parseManifest(text: String): (Long, Seq[String]) = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    implicit val fmt: Formats = DefaultFormats
    val j = JsonMethods.parse(text)
    ((j \ "lsn").extract[Long], (j \ "files").extract[Seq[String]])
  }

  /** Escape Hadoop glob metacharacters in a literal path:
    * DataFrameReader paths are globs, so a committed file name
    * containing `* ? [ ] { } \` would otherwise be re-interpreted
    * (or rejected) at read time. */
  private def globEscape(p: String): String =
    p.replaceAll("""([*?\[\]{}\\])""", """\\$1""")

  private def readManifest(fs: FileSystem, manifest: Path): (Long, Seq[String]) = {
    val in = fs.open(manifest)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    parseManifest(text)
  }

  /** The sink's committed ack watermark: (latest committed epoch,
    * max LSN across committed epochs). This is the position the
    * source may safely confirm — the reference's `AckCallback` after
    * a sink flush (pkg/sinks/generic/sink.go:24-26); frames at or
    * below it are durable in committed space, so a restart that
    * replays them is absorbed by the epoch-idempotent commit.
    *
    * Driver-side listing over manifests: O(committed epochs), no data
    * read — a control-plane quantity.
    */
  def committedWatermark(root: String,
      hadoopConf: org.apache.hadoop.conf.Configuration): Option[(Long, Long)] = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(hadoopConf)
    if (!fs.exists(rootPath)) return None
    val epochs = fs.listStatus(rootPath).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("epoch="))
      .flatMap { s =>
        val manifest = new Path(s.getPath, "_MANIFEST.json")
        if (!fs.exists(manifest)) None // uncommitted epoch: not ackable
        else Some((s.getPath.getName.stripPrefix("epoch=").toLong,
          readManifest(fs, manifest)._1))
      }
    if (epochs.isEmpty) None
    else Some((epochs.map(_._1).max, epochs.map(_._2).max))
  }

  /** Read back exactly the committed rows: only files LISTED in an
    * epoch's `_MANIFEST.json` are loaded. A glob read over
    * `part-*.jsonl` under every epoch dir trusts the directory
    * contents; this reader trusts the commit record — on stores where rename is not
    * atomic (or after manual interference), stray part files in an
    * epoch directory are ignored and uncommitted epochs contribute
    * nothing. The manifest listing is driver-side and O(epochs);
    * the data read is a parallel multi-file JSON scan.
    *
    * Pass `schema` to fix the result shape: an EMPTY sink then still
    * returns a frame with those columns (downstream selects don't
    * throw on day zero), and a non-empty read skips the JSON
    * schema-inference pass — at scale, inference is a full extra
    * read of every committed file. Without a schema, an empty sink
    * yields the zero-column empty frame.
    */
  def readCommitted(spark: org.apache.spark.sql.SparkSession,
      root: String, schema: StructType = null): org.apache.spark.sql.DataFrame = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val committed: Seq[String] =
      if (!fs.exists(rootPath)) Seq.empty
      else fs.listStatus(rootPath).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("epoch="))
        .flatMap { s =>
          val manifest = new Path(s.getPath, "_MANIFEST.json")
          if (!fs.exists(manifest)) Seq.empty
          else readManifest(fs, manifest)._2
            .map(f => globEscape(new Path(s.getPath, f).toString))
        }
    val reader =
      if (schema == null) spark.read else spark.read.schema(schema)
    if (committed.isEmpty) {
      if (schema == null) spark.emptyDataFrame
      else spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
    } else reader.json(committed: _*)
  }
}

final class EpochWriterFactory(root: String, schema: StructType,
    hadoopProps: Seq[(String, String)])
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new EpochFileWriter(root, schema, hadoopProps, partitionId, taskId, epochId)
}

/** Task-side writer: JSON lines into one staged file; the commit
  * message carries the partial (rows, maxLsn) fold. */
final class EpochFileWriter(root: String, schema: StructType,
    hadoopProps: Seq[(String, String)],
    partitionId: Int, taskId: Long, epochId: Long)
    extends DataWriter[InternalRow] {

  private val path =
    new Path(root, f"_staging/epoch=$epochId/part-$partitionId%05d-$taskId.jsonl")
  private lazy val fs: FileSystem =
    path.getFileSystem(EpochFileSink.conf(hadoopProps))
  private lazy val out = fs.create(path, true)
  private var rows = 0L
  private var maxLsn = -1L
  private val lsnIdx =
    if (schema.fieldNames.contains(graft.model.Envelope.LsnCol))
      schema.fieldIndex(graft.model.Envelope.LsnCol)
    else -1

  override def write(record: InternalRow): Unit = {
    out.write(EpochJson.render(record, schema).getBytes("UTF-8"))
    out.write('\n')
    rows += 1
    if (lsnIdx >= 0 && !record.isNullAt(lsnIdx))
      maxLsn = math.max(maxLsn, record.getLong(lsnIdx))
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    EpochFileMessage(path.toString, rows, maxLsn)
  }

  override def abort(): Unit = {
    out.close()
    fs.delete(path, false)
  }

  override def close(): Unit = ()
}

/** Schema-driven InternalRow → JSON text, recursive over
  * struct/array/map; timestamps render as ISO-8601 instants, binary
  * as base64 — the file-sink wire format of the reference
  * (pkg/sinks/file/inserter.go JSON lines), made columnar-safe.
  */
object EpochJson {
  def render(row: InternalRow, schema: StructType): String = {
    val sb = new StringBuilder(64)
    struct(sb, row, schema)
    sb.toString()
  }

  private def struct(sb: StringBuilder, row: InternalRow, schema: StructType): Unit = {
    sb.append('{')
    var first = true
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      if (!first) sb.append(',')
      first = false
      str(sb, f.name)
      sb.append(':')
      if (row.isNullAt(i)) sb.append("null")
      else value(sb, row, i, f.dataType)
    }
    sb.append('}')
  }

  private def value(sb: StringBuilder, get: org.apache.spark.sql.catalyst.expressions.SpecializedGetters,
      i: Int, dt: DataType): Unit = dt match {
    case StringType => str(sb, get.getUTF8String(i).toString)
    case LongType => sb.append(get.getLong(i))
    case IntegerType => sb.append(get.getInt(i))
    case ShortType => sb.append(get.getShort(i))
    case ByteType => sb.append(get.getByte(i))
    case DoubleType =>
      val d = get.getDouble(i)
      // bare NaN/Infinity tokens are invalid JSON; emit null, matching
      // Spark's own JSON writer default
      if (java.lang.Double.isFinite(d)) sb.append(d) else sb.append("null")
    case FloatType =>
      val f = get.getFloat(i)
      if (java.lang.Float.isFinite(f)) sb.append(f) else sb.append("null")
    case BooleanType => sb.append(get.getBoolean(i))
    case _: TimestampType =>
      val us = get.getLong(i)
      str(sb, java.time.Instant.ofEpochSecond(
        Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L).toString)
    case TimestampNTZType =>
      val us = get.getLong(i)
      str(sb, java.time.LocalDateTime.ofEpochSecond(
        Math.floorDiv(us, 1000000L), (Math.floorMod(us, 1000000L) * 1000L).toInt,
        java.time.ZoneOffset.UTC).toString)
    case DateType =>
      str(sb, java.time.LocalDate.ofEpochDay(get.getInt(i).toLong).toString)
    case BinaryType =>
      str(sb, java.util.Base64.getEncoder.encodeToString(get.getBinary(i)))
    case d: DecimalType =>
      sb.append(get.getDecimal(i, d.precision, d.scale).toJavaBigDecimal.toPlainString)
    case s: StructType => struct(sb, get.getStruct(i, s.size), s)
    case ArrayType(et, _) =>
      val arr: ArrayData = get.getArray(i)
      sb.append('[')
      var j = 0
      while (j < arr.numElements()) {
        if (j > 0) sb.append(',')
        if (arr.isNullAt(j)) sb.append("null") else value(sb, arr, j, et)
        j += 1
      }
      sb.append(']')
    case MapType(StringType, vt, _) =>
      val m: MapData = get.getMap(i)
      sb.append('{')
      var j = 0
      while (j < m.numElements()) {
        if (j > 0) sb.append(',')
        str(sb, m.keyArray().getUTF8String(j).toString)
        sb.append(':')
        if (m.valueArray().isNullAt(j)) sb.append("null")
        else value(sb, m.valueArray(), j, vt)
        j += 1
      }
      sb.append('}')
    case other =>
      throw new IllegalArgumentException(s"unsupported sink type: $other")
  }

  /** JSON-escaped string literal appended to `sb` (shared with the
    * manifest writer). */
  private[sinks] def appendString(sb: StringBuilder, s: String): Unit = str(sb, s)

  private def str(sb: StringBuilder, s: String): Unit = {
    sb.append('"')
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"')
  }
}
