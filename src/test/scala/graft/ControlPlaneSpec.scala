package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.api.ControlPlane
import graft.model.TableRef

class ControlPlaneSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("tables listing derives status per state machine and keeps latest job") {
    val ts = java.sql.Timestamp.valueOf(_: String)
    val tables = Seq(
      ("public", "a", 100L), ("public", "b", 200L), ("public", "c", 300L),
      ("public", "d", 400L), ("public", "e", 500L), ("public", "f", 600L)
    ).toDF("schema", "table_name", "approximate_row_count")
    // (id, schema, table, cursor, completed_at, expired_at, error, created_at, rows)
    val jobs = Seq(
      // a: two jobs, latest completed -> complete
      (1L, "public", "a", Some("c1"), Some(ts("2024-01-01 00:00:00")), None, None, ts("2024-01-01 00:00:00"), 10L),
      (2L, "public", "a", Some("c2"), Some(ts("2024-01-02 00:00:00")), None, None, ts("2024-01-02 00:00:00"), 90L),
      // b: expired
      (3L, "public", "b", None, None, Some(ts("2024-01-01 00:00:00")), None, ts("2024-01-01 00:00:00"), 0L),
      // c: errored
      (4L, "public", "c", Some("c"), None, None, Some("boom"), ts("2024-01-01 00:00:00"), 5L),
      // d: scheduled (no cursor yet)
      (5L, "public", "d", None, None, None, None, ts("2024-01-01 00:00:00"), 0L),
      // e: in progress
      (6L, "public", "e", Some("c"), None, None, None, ts("2024-01-01 00:00:00"), 42L)
    ).map { case (id, s, t, cur, comp, exp, err, cre, rows) =>
      (id, s, t, cur, comp, exp, err, cre, rows)
    }.toDF("id", "schema", "table_name", "cursor", "completed_at",
      "expired_at", "error", "created_at", "rows_processed_total")
    val published = Seq(("public", "a"), ("public", "f")).toDF("schema", "table_name")

    val got = ControlPlane.tablesListing(tables, jobs, published)
      .select("table_name", "import_status", "publication_status",
        "import_rows_processed_total")
      .collect().map(r => r.getString(0) ->
        ((r.getString(1), r.getString(2), Option(r.get(3))))).toMap

    assert(got("a") == (("complete", "active", Some(90L)))) // latest job wins
    assert(got("b")._1 == "expired")
    assert(got("b")._3.isEmpty) // expired hides rows processed
    assert(got("c")._1 == "error")
    assert(got("d")._1 == "scheduled")
    assert(got("e") == (("in_progress", "inactive", Some(42L))))
    assert(got("f") == (("unknown", "active", None))) // published, never imported
  }

  test("tables listing breaks created_at ties by id without duplicating rows") {
    val ts = java.sql.Timestamp.valueOf(_: String)
    val tables = Seq(("public", "a", 100L))
      .toDF("schema", "table_name", "approximate_row_count")
    // two jobs share created_at; the higher id must win, once
    val noTs = Option.empty[java.sql.Timestamp]
    val jobs = Seq(
      (1L, "public", "a", Some("c1"), noTs, noTs, Some("boom"), ts("2024-01-01 00:00:00"), 10L),
      (2L, "public", "a", Some("c2"), noTs, noTs, Option.empty[String], ts("2024-01-01 00:00:00"), 90L)
    ).toDF("id", "schema", "table_name", "cursor", "completed_at",
      "expired_at", "error", "created_at", "rows_processed_total")
    val published = Seq.empty[(String, String)].toDF("schema", "table_name")

    val rows = ControlPlane.tablesListing(tables, jobs, published)
      .select("import_status", "import_rows_processed_total").collect()
    assert(rows.length == 1)
    assert(rows(0).getString(0) == "in_progress")
    assert(rows(0).getLong(1) == 90L)
  }

  test("watched tables: schema filter, excludes, includes whitelist") {
    val catalog = Seq(TableRef("public", "a"), TableRef("public", "b"),
      TableRef("internal", "x"))
    assert(ControlPlane.watchedTables(catalog, Seq("public")) ==
      Seq(TableRef("public", "a"), TableRef("public", "b")))
    assert(ControlPlane.watchedTables(catalog, Seq("public"),
      excludes = Seq(TableRef("public", "b"))) == Seq(TableRef("public", "a")))
    assert(ControlPlane.watchedTables(catalog, Seq("public"),
      includes = Seq(TableRef("public", "b"))) == Seq(TableRef("public", "b")))
  }

  test("publication reconcile returns add/remove sets") {
    val watched = Seq(TableRef("public", "a"), TableRef("public", "b"))
    val published = Seq(TableRef("public", "b"), TableRef("public", "c"))
    val (add, remove) = ControlPlane.reconcilePublication(watched, published)
    assert(add == Seq(TableRef("public", "a")))
    assert(remove == Seq(TableRef("public", "c")))
  }
}
