package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.model.{ColumnSpec, Envelope, Operation, PgTypes, TableSchema}
import graft.sinks.WarehouseSink

/** Warehouse retention: `vacuum` drops raw `_date` partitions the
  * compacted baseline covers — partition expiration with the engine's
  * fail-loudly floor. The latest view must be indistinguishable
  * before and after, and time travel below the compaction watermark
  * must become an error, never a silently wrong answer.
  */
class VacuumSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  def tmp(): String = Files.createTempDirectory("graft-vacuum").toString

  val pets = TableSchema(1L, "public", "pets", Seq(
    ColumnSpec("id", PgTypes.Int8, key = true),
    ColumnSpec("name", PgTypes.Text)))
  private val payload = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("name",
      org.apache.spark.sql.types.StringType)))

  private def envBatch(ts: String, lsn: Long, op: String,
      id: Long, name: String) =
    spark.createDataFrame(
      java.util.List.of(Row(
        java.sql.Timestamp.valueOf(ts), Long.box(lsn), Long.box(1L),
        op, null, Row(Long.box(id), name))),
      Envelope.schemaFor(payload))

  private def dateDirs(wh: String): Set[String] =
    new java.io.File(s"$wh/raw/public.pets").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("_date="))
      .map(_.getName).toSet

  test("vacuum drops covered partitions; the latest view is unchanged; pre-watermark asOf fails") {
    val wh = tmp()
    val sink = new WarehouseSink(spark, wh)
    sink.insert(pets, envBatch("2024-01-01 08:00:00", 10L, Operation.Insert, 1L, "a"))
    sink.insert(pets, envBatch("2024-01-02 08:00:00", 20L, Operation.Insert, 2L, "b"))
    sink.insert(pets, envBatch("2024-01-03 08:00:00", 30L, Operation.Update, 1L, "a2"))

    // vacuum before compaction: refused — there is no baseline to
    // hold the dropped rows' state
    assertThrows[IllegalStateException](
      sink.vacuum(pets, java.sql.Date.valueOf("2024-01-03")))

    sink.compact(pets) // watermark = (30, 2024-01-03 08:00:00)
    val before = sink.latestView(pets)
      .select("id", "name").as[(Long, String)].collect().toSet

    val dropped = sink.vacuum(pets, java.sql.Date.valueOf("2024-01-03"))
    assert(dropped == 2L)
    assert(dateDirs(wh) == Set("_date=2024-01-03"))
    assert(sink.retentionHorizon(pets) == java.sql.Date.valueOf("2024-01-03"))

    // k2's only row lived in a dropped partition: the view must now
    // serve it from the baseline, byte-for-byte as before
    val after = sink.latestView(pets)
      .select("id", "name").as[(Long, String)].collect().toSet
    assert(after == before)
    assert(after == Set(1L -> "a2", 2L -> "b"))

    // time travel below the watermark is gone — loudly
    assertThrows[IllegalArgumentException](
      sink.asOf(pets, java.sql.Timestamp.valueOf("2024-01-02 12:00:00")))
    // at or past the watermark it still answers, baseline-aware
    val atWm = sink.asOf(pets, java.sql.Timestamp.valueOf("2024-01-03 08:00:00"))
      .select("id", "name").as[(Long, String)].collect().toSet
    assert(atWm == Set(1L -> "a2", 2L -> "b"))

    // a second vacuum with nothing new to drop is a no-op
    assert(sink.vacuum(pets, java.sql.Date.valueOf("2024-01-03")) == 0L)
  }

  test("post-vacuum writes keep flowing: view and watermark-bounded asOf stay correct") {
    val wh = tmp()
    val sink = new WarehouseSink(spark, wh)
    sink.insert(pets, envBatch("2024-01-01 08:00:00", 10L, Operation.Insert, 1L, "a"))
    sink.insert(pets, envBatch("2024-01-02 08:00:00", 20L, Operation.Insert, 2L, "b"))
    sink.compact(pets)
    assert(sink.vacuum(pets, java.sql.Date.valueOf("2024-01-02")) == 1L)

    // fresh changes after retention: an update to a vacuumed key and
    // a brand-new key
    sink.insert(pets, envBatch("2024-01-05 08:00:00", 50L, Operation.Update, 1L, "a5"))
    sink.insert(pets, envBatch("2024-01-06 08:00:00", 60L, Operation.Insert, 3L, "c"))

    val latest = sink.latestView(pets)
      .select("id", "name").as[(Long, String)].collect().toSet
    assert(latest == Set(1L -> "a5", 2L -> "b", 3L -> "c"))

    // asOf between the watermark and the new rows sees pre-update state
    val mid = sink.asOf(pets, java.sql.Timestamp.valueOf("2024-01-04 00:00:00"))
      .select("id", "name").as[(Long, String)].collect().toSet
    assert(mid == Set(1L -> "a", 2L -> "b"))
    // asOf after the update sees it, but not the later insert
    val later = sink.asOf(pets, java.sql.Timestamp.valueOf("2024-01-05 12:00:00"))
      .select("id", "name").as[(Long, String)].collect().toSet
    assert(later == Set(1L -> "a5", 2L -> "b"))
  }
}
