package graft

import java.nio.file.Files

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.connector.write.WriterCommitMessage
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.{EpochFileMessage, EpochFileWriter, EpochJson, EpochFileSink, EpochStreamingWrite, EpochWriterFactory}

/** The DSv2 streaming sink: epoch staging, manifest commit,
  * replay idempotence, and the JSON wire format. */
class EpochSinkSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toFile.getAbsolutePath

  test("streaming write commits per-epoch manifests with the (rows, lsn) fold") {
    import spark.implicits._
    val src = tmp("epoch-src")
    val out = tmp("epoch-sink")
    val cp = tmp("epoch-cp")
    Seq((1L, "a"), (2L, "b")).toDF("lsn", "msg")
      .coalesce(1).write.parquet(s"$src/b1")
    val q = spark.readStream.schema("lsn LONG, msg STRING").parquet(s"$src/*")
      .writeStream
      .format(classOf[EpochFileSink].getName)
      .option("path", out)
      .option("checkpointLocation", cp)
      .start()
    try {
      q.processAllAvailable()
      Seq((9L, "c")).toDF("lsn", "msg").coalesce(1).write.parquet(s"$src/b2")
      q.processAllAvailable()
    } finally q.stop()

    val epochs = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("epoch=")).sortBy(_.getName)
    assert(epochs.nonEmpty)
    epochs.foreach { e =>
      assert(new java.io.File(e, "_MANIFEST.json").exists(),
        s"epoch ${e.getName} missing manifest")
    }
    val manifests = epochs.map(e => Files.readString(
      new java.io.File(e, "_MANIFEST.json").toPath))
    val totalRows = manifests.map { m =>
      """"rows":(\d+)""".r.findFirstMatchIn(m).get.group(1).toLong
    }.sum
    assert(totalRows == 3)
    assert(manifests.exists(_.contains("\"lsn\":9")))
    // the data itself round-trips through the JSON lines
    val back = spark.read
      .schema(StructType(Seq(StructField("lsn", LongType), StructField("msg", StringType))))
      .json(s"$out/epoch=*/part-*.jsonl")
    assert(back.orderBy("lsn").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b"), (9L, "c")))
    // staging space is empty after commit
    val staging = new java.io.File(out, "_staging")
    assert(!staging.exists() || staging.listFiles().isEmpty)

    // the manifest-driven reader returns exactly the committed rows,
    // ignoring (a) a stray part file inside a committed epoch dir and
    // (b) a whole uncommitted epoch dir — the cases a glob read trusts
    Files.writeString(epochs.head.toPath.resolve("part-stray-999.jsonl"),
      """{"lsn":777,"msg":"stray"}""" + "\n")
    val orphan = new java.io.File(out, "epoch=999")
    orphan.mkdirs()
    Files.writeString(orphan.toPath.resolve("part-00000-0.jsonl"),
      """{"lsn":888,"msg":"uncommitted"}""" + "\n")
    val committedOnly = EpochFileSink.readCommitted(spark, out)
      .select($"lsn", $"msg").orderBy("lsn").as[(Long, String)].collect().toSeq
    assert(committedOnly == Seq((1L, "a"), (2L, "b"), (9L, "c")))
    val glob = spark.read
      .schema(StructType(Seq(StructField("lsn", LongType), StructField("msg", StringType))))
      .json(s"$out/epoch=*/part-*.jsonl")
    assert(glob.count() == 5, "glob read should see the planted strays")
  }

  test("replayed epoch commit is a no-op: duplicates never reach committed space") {
    spark.version // EpochStreamingWrite captures the active session's Hadoop conf
    val out = tmp("epoch-replay")
    val schema = StructType(Seq(
      StructField("lsn", LongType), StructField("msg", StringType)))
    val sw = new EpochStreamingWrite(out, schema)
    val factory = sw.createStreamingWriterFactory(null)
      .asInstanceOf[EpochWriterFactory]

    def stage(epoch: Long, task: Long, rows: (Long, String)*): WriterCommitMessage = {
      val w = factory.createWriter(0, task, epoch)
      rows.foreach { case (l, m) =>
        w.write(InternalRow(l, UTF8String.fromString(m)))
      }
      w.commit()
    }

    val first = stage(7L, 1L, (10L, "x"), (11L, "y"))
    sw.commit(7L, Array(first))
    val epochDir = new java.io.File(out, "epoch=7")
    val manifest = Files.readString(
      new java.io.File(epochDir, "_MANIFEST.json").toPath)
    assert(manifest.contains("\"rows\":2") && manifest.contains("\"lsn\":11"))
    val filesAfterFirst = epochDir.listFiles().map(_.getName).toSet

    // Spark replays the epoch after a failure: same data, new task id
    val replay = stage(7L, 2L, (10L, "x"), (11L, "y"))
    sw.commit(7L, Array(replay))
    assert(Files.readString(
      new java.io.File(epochDir, "_MANIFEST.json").toPath) == manifest)
    assert(epochDir.listFiles().map(_.getName).toSet == filesAfterFirst)
    assert(!new java.io.File(out, "_staging/epoch=7").exists())

    // an aborted epoch leaves no trace
    val w = factory.createWriter(0, 3L, 8L)
    w.write(InternalRow(12L, UTF8String.fromString("z")))
    w.abort()
    sw.abort(8L, Array.empty)
    assert(!new java.io.File(out, "epoch=8").exists())
    assert(!new java.io.File(out, "_staging/epoch=8").exists())

    // the ack watermark reads back (latest epoch, max lsn); an
    // uncommitted epoch directory (crash before manifest) is ignored
    val hconf = spark.sparkContext.hadoopConfiguration
    assert(EpochFileSink.committedWatermark(out, hconf).contains((7L, 11L)))
    new java.io.File(out, "epoch=9").mkdirs()
    assert(EpochFileSink.committedWatermark(out, hconf).contains((7L, 11L)))
    assert(EpochFileSink.committedWatermark(out + "-nowhere", hconf).isEmpty)
  }

  test("crash between promote and manifest write: retry wipes the orphaned files") {
    spark.version
    val out = tmp("epoch-crash")
    val schema = StructType(Seq(
      StructField("lsn", LongType), StructField("msg", StringType)))
    val sw = new EpochStreamingWrite(out, schema)
    val factory = sw.createStreamingWriterFactory(null)
      .asInstanceOf[EpochWriterFactory]

    def stage(task: Long, rows: (Long, String)*): WriterCommitMessage = {
      val w = factory.createWriter(0, task, 5L)
      rows.foreach { case (l, m) =>
        w.write(InternalRow(l, UTF8String.fromString(m)))
      }
      w.commit()
    }

    // first attempt: files were promoted into epoch=5/ but the driver
    // died before _MANIFEST.json landed
    val epochDir = new java.io.File(out, "epoch=5")
    epochDir.mkdirs()
    Files.writeString(new java.io.File(epochDir, "part-00000-1.jsonl").toPath,
      "{\"lsn\":20,\"msg\":\"x\"}\n{\"lsn\":21,\"msg\":\"y\"}\n")
    assert(!new java.io.File(epochDir, "_MANIFEST.json").exists())

    // Spark replays the epoch: same rows, new task id, full commit
    sw.commit(5L, Array(stage(2L, (20L, "x"), (21L, "y"))))

    // exactly one data file survives — the retry's; the orphan from the
    // crashed attempt is gone, so glob readers see each row once
    val dataFiles = epochDir.listFiles().filter(_.getName.startsWith("part-"))
    assert(dataFiles.length == 1)
    assert(dataFiles.head.getName.contains("-2"))
    val rows = spark.read
      .schema(schema)
      .json(s"$out/epoch=*/part-*.jsonl")
    assert(rows.count() == 2)
    val manifest = Files.readString(
      new java.io.File(epochDir, "_MANIFEST.json").toPath)
    assert(manifest.contains("\"rows\":2") && manifest.contains("\"lsn\":21"))
  }

  test("readCommitted with a schema: empty sink keeps columns; reads skip inference") {
    import spark.implicits._
    val schema = StructType(Seq(
      StructField("lsn", LongType), StructField("msg", StringType)))
    // day zero: nothing committed (even the root doesn't exist) —
    // downstream column selects must still resolve
    val empty = EpochFileSink.readCommitted(spark, tmp("epoch-empty") + "/x", schema)
    assert(empty.select($"lsn", $"msg").count() == 0)
    assert(empty.schema == schema)
    // without a schema the old zero-column behavior remains
    assert(EpochFileSink.readCommitted(spark, tmp("epoch-empty2") + "/x")
      .schema.isEmpty)
  }

  test("manifest survives a JSON parser: escaped quotes in file names round-trip") {
    spark.version
    val out = tmp("epoch-esc")
    val schema = StructType(Seq(
      StructField("lsn", LongType), StructField("msg", StringType)))
    val sw = new EpochStreamingWrite(out, schema)
    // a commit message whose staged file name contains a quote and a
    // backslash — hostile but FileSystem-legal on most stores. Stage
    // it by hand (the writer factory derives names itself).
    val staged = new java.io.File(out, "_staging/epoch=3")
    staged.mkdirs()
    val hostile = new java.io.File(staged, """part-a"b\c.jsonl""")
    Files.writeString(hostile.toPath, "{\"lsn\":1,\"msg\":\"m\"}\n")
    sw.commit(3L, Array(EpochFileMessage(hostile.getAbsolutePath, 1L, 1L)))
    // the reader parses the manifest as real JSON and resolves the file
    val got = EpochFileSink.readCommitted(spark, out, schema)
    import spark.implicits._
    assert(got.select($"lsn", $"msg").as[(Long, String)].collect().toSeq ==
      Seq((1L, "m")))
  }

  test("EpochJson emits null for non-finite floats (valid JSON always)") {
    val schema = StructType(Seq(
      StructField("d1", DoubleType), StructField("d2", DoubleType),
      StructField("d3", DoubleType), StructField("f1", FloatType),
      StructField("ok", DoubleType)))
    val row = InternalRow(
      Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity,
      Float.NaN, 1.5)
    assert(EpochJson.render(row, schema) ==
      """{"d1":null,"d2":null,"d3":null,"f1":null,"ok":1.5}""")
  }

  test("EpochJson renders nested/temporal/binary/decimal values exactly") {
    val schema = StructType(Seq(
      StructField("s", StringType),
      StructField("ts", TimestampType),
      StructField("d", DateType),
      StructField("bin", BinaryType),
      StructField("dec", DecimalType(18, 2)),
      StructField("arr", ArrayType(LongType)),
      StructField("m", MapType(StringType, StringType)),
      StructField("nested", StructType(Seq(StructField("k", LongType)))),
      StructField("nul", StringType)))
    val row = InternalRow(
      UTF8String.fromString("a\"b\nc"),
      1717200000000000L, // 2024-06-01T00:00:00Z in micros
      19875,             // 2024-06-01 in epoch days
      Array[Byte](1, 2, 3),
      org.apache.spark.sql.types.Decimal(BigDecimal("12.50"), 18, 2),
      new GenericArrayData(Array[Any](1L, null, 3L)),
      ArrayBasedMapData(
        Array[Any](UTF8String.fromString("k1")),
        Array[Any](UTF8String.fromString("v1"))),
      InternalRow(42L),
      null)
    assert(EpochJson.render(row, schema) ==
      """{"s":"a\"b\nc","ts":"2024-06-01T00:00:00Z","d":"2024-06-01",""" +
      """"bin":"AQID","dec":12.50,"arr":[1,null,3],"m":{"k1":"v1"},""" +
      """"nested":{"k":42},"nul":null}""")
  }
}
