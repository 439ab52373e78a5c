package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model._
import graft.sinks.WarehouseSink

/** Golden-file pinning of the generated latest-view DDL — the
  * reference's own test style (pkg/sinks/bigquery/testdata/
  * view.example.sql and view.dogs.sql, checked byte-for-byte by
  * schema_builders_test.go). Any change to the emitted SQL becomes a
  * reviewable diff of the golden file, not a silent runtime change.
  *
  * Regenerate with GRAFT_REGEN_GOLDENS=1 (the new text still has to
  * pass the executable-equivalence test below).
  */
class GoldenViewSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val goldenDir = "src/test/resources/goldens"

  // single-column PK — mirrors the reference's `example` fixture
  private val example = TableSchema(1, "public", "example", Seq(
    ColumnSpec("id", PgTypes.Int8, key = true),
    ColumnSpec("msg", PgTypes.Text)))
  // composite PK — the case the reference's fixtures don't cover
  private val visits = TableSchema(2, "public", "visits", Seq(
    ColumnSpec("dog", PgTypes.Int8, key = true),
    ColumnSpec("day", PgTypes.Text, key = true),
    ColumnSpec("note", PgTypes.Text)))

  private def checkGolden(name: String, got: String): Unit = {
    val path = Paths.get(s"$goldenDir/$name")
    if (sys.env.contains("GRAFT_REGEN_GOLDENS")) {
      Files.createDirectories(path.getParent)
      Files.writeString(path, got)
    }
    assert(Files.exists(path), s"missing golden $path — run once with " +
      "GRAFT_REGEN_GOLDENS=1 to create it, then review the diff")
    val want = Files.readString(path)
    assert(got == want,
      s"generated view DDL drifted from $name:\n--- golden\n$want\n--- got\n$got")
  }

  test("latest-view DDL matches the golden file (single-column PK)") {
    checkGolden("view.example.sql", WarehouseSink.latestViewDdl(example))
  }

  test("latest-view DDL matches the golden file (composite PK)") {
    checkGolden("view.visits.sql", WarehouseSink.latestViewDdl(visits))
  }

  test("the pinned DDL executes and equals the programmatic latest view") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val root = Files.createTempDirectory("graft-golden").toString
    val sink = new WarehouseSink(spark, root)
    val payload = StructType(Seq(
      StructField("id", LongType), StructField("msg", StringType)))
    def env(ts: String, lsn: Option[Long], seq: Option[Long], op: String,
        id: Long, msg: String) = {
      val img = new org.apache.spark.sql.catalyst.expressions.GenericRow(
        Array[Any](id, msg))
      Row(java.sql.Timestamp.valueOf(ts), lsn.orNull, seq.orNull, op,
        if (op == "INSERT" || op == "IMPORT") null else img,
        if (op == "DELETE") null else img)
    }
    val rows = Seq(
      // import (null lsn/sequence) superseded by a stream UPDATE
      env("2024-06-01 00:00:00", None, None, "IMPORT", 1L, "import"),
      env("2024-06-01 00:00:01", Some(10L), Some(1L), "UPDATE", 1L, "v2"),
      // same-timestamp replay: higher lsn wins
      env("2024-06-01 00:00:01", Some(9L), Some(1L), "UPDATE", 1L, "stale"),
      // deleted key must vanish from the view
      env("2024-06-01 00:00:00", Some(5L), Some(1L), "INSERT", 2L, "gone"),
      env("2024-06-01 00:00:02", Some(11L), Some(1L), "DELETE", 2L, "gone"),
      // import-only key survives
      env("2024-06-01 00:00:00", None, None, "IMPORT", 3L, "only"))
    sink.insert(example, spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Envelope.schemaFor(payload)))
    sink.registerViews(example)
    val programmatic = spark.table("example")
      .select(col("id"), col("msg")).collect().toSet
    spark.sql(sink.latestViewDdl(example))
    val viaDdl = spark.table("example")
      .select(col("id"), col("msg")).collect().toSet
    assert(programmatic == viaDdl)
    assert(viaDdl.map(r => (r.getLong(0), r.getString(1))) ==
      Set((1L, "v2"), (3L, "only")))
  }
}
