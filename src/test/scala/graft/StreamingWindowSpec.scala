package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ImportSource

/** Streaming twins of the batch operators: windowed aggregation with
  * watermark (late-data bound) over the events table replayed as a
  * stream — SURVEY §2.9's extension surface.
  */
class StreamingWindowSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  val sf = "/root/testdata/sf0.001"

  test("tumbling window + watermark over a replayed event stream matches batch") {
    // replay events as a file stream (ns timestamps converted on write)
    val src = Files.createTempDirectory("graft-stream").toString
    val ev = ImportSource.table(spark, sf, "events")
      .select($"ts", $"event_type", $"value")
    ev.write.parquet(s"$src/batch0")

    val stream = spark.readStream
      .schema(ev.schema)
      .parquet(s"$src/*")
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .select($"window.start".as("hour_start"), $"event_type", $"n")

    val q = stream.writeStream
      .outputMode("complete")
      .format("memory").queryName("win_out")
      .trigger(Trigger.ProcessingTime("1 seconds"))
      .start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("win_out")
      .as[(java.sql.Timestamp, String, Long)].collect().toSet
    val batch = ev.groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .select($"window.start".as("hour_start"), $"event_type", $"n")
      .as[(java.sql.Timestamp, String, Long)].collect().toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("instrumented sink records batch counts, durations, schema outcomes") {
    import graft.sinks._
    import graft.model._
    val root = Files.createTempDirectory("graft-instr").toString
    val sink = new InstrumentedSink(new WarehouseSink(spark, root))
    val table = Envelope.tableSchemaOf(1L, "public", "region",
      ImportSource.table(spark, sf, "region").schema, Seq("r_regionkey"))
    assert(sink.handleSchema(table) == SchemaOutcome.Update)
    assert(sink.handleSchema(table) == SchemaOutcome.Noop)
    val env = ImportSource.importTable(spark, sf, "region",
      java.sql.Timestamp.valueOf("2024-06-01 00:00:00"))
    val r = sink.insert(table, env)
    assert(r.count == 5)
    assert(sink.insertCount.sum() == 1)
    assert(sink.rowCount.sum() == 5)
    assert(sink.maxBatchSize.get() == 5)
    assert(sink.schemaUpdates.sum() == 1 && sink.schemaNoops.sum() == 1)
    assert(sink.meanInsertSeconds > 0.0)
  }
}
