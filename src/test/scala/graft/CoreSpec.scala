package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.model._
import graft.ops.ChangelogOps
import graft.sources.ImportSource

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SessionDefaults(SparkSession.builder()
        .master("local[4]")
        .appName("graft-test"), cores = 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // production posture, same as Bench/Verify: graft SQL functions +
    // optimizer rules active (q153 reaches int128_sum via plain SQL)
    graft.functions.GraftSparkExtensions.register(s)
    s
  }
}

class CoreSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("PgTypes maps the 32 supported OIDs and rejects others") {
    assert(PgTypes.supported.size == 32)
    assert(PgTypes.dataTypeFor(PgTypes.Numeric) == DoubleType) // lossy by design
    assertThrows[PgTypes.UnregisteredTypeException](PgTypes.dataTypeFor(2950)) // uuid
  }

  test("TableSchema fingerprint is order-insensitive and key-sensitive") {
    val a = TableSchema(1, "public", "one",
      Seq(ColumnSpec("id", PgTypes.Int8, key = true), ColumnSpec("msg", PgTypes.Text)))
    val b = TableSchema(1, "public", "one",
      Seq(ColumnSpec("msg", PgTypes.Text), ColumnSpec("id", PgTypes.Int8, key = true)))
    val c = TableSchema(1, "public", "one",
      Seq(ColumnSpec("id", PgTypes.Int8), ColumnSpec("msg", PgTypes.Text)))
    assert(a.fingerprint == b.fingerprint)
    assert(a.fingerprint != c.fingerprint)
    assert(a.primaryKeys == Seq("id"))
  }

  test("TableRef diff/includes mirror reference set semantics") {
    val w = Seq(TableRef("public", "a"), TableRef("public", "b"))
    val p = Seq(TableRef("public", "b"))
    assert(TableRef.diff(w, p) == Seq(TableRef("public", "a")))
    assert(TableRef.includes(w, TableRef("public", "b")))
    assert(!TableRef.includes(p, TableRef("public", "a")))
  }

  test("import envelope wraps rows as IMPORT with null lsn/before") {
    val env = ImportSource.importTable(spark, sf, "region",
      java.sql.Timestamp.valueOf("2024-06-01 00:00:00"))
    val rows = env.collect()
    assert(rows.length == 5)
    assert(rows.forall(_.getAs[String]("operation") == Operation.Import))
    assert(rows.forall(_.isNullAt(env.schema.fieldIndex("lsn"))))
    assert(rows.forall(_.isNullAt(env.schema.fieldIndex("before"))))
    assert(rows.forall(!_.isNullAt(env.schema.fieldIndex("after"))))
  }

  test("operation derivation matches reference nullness rules") {
    import spark.implicits._
    val df = Seq(
      (Option.empty[Long], Option.empty[Long], Some(1L)), // IMPORT
      (Some(1L), Option.empty[Long], Some(1L)), // INSERT
      (Some(1L), Some(1L), Option.empty[Long]), // DELETE
      (Some(1L), Some(1L), Some(2L)), // UPDATE
    ).toDF("lsn", "before", "after")
    val got = df.select(Envelope.operationCol(col("lsn"), col("before"), col("after")))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("IMPORT", "INSERT", "DELETE", "UPDATE"))
  }

  test("latest-row view picks newest image, drops deletes, tie-breaks on lsn+sequence") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    // (pk, ts, lsn, seq, op, v): two updates in one txn (same ts+lsn),
    // sequence must break the tie; pk=2 ends deleted.
    val cl = Seq(
      (1L, ts, 10L, 1L, "INSERT", "a"),
      (1L, ts, 10L, 2L, "UPDATE", "b"),
      (2L, ts, 11L, 1L, "INSERT", "x"),
      (2L, ts, 12L, 1L, "DELETE", "x"),
    ).toDF("pk", "timestamp", "lsn", "sequence", "operation", "value")
    val got = ChangelogOps.latestRowView(cl, Seq(col("pk")))
      .select("pk", "value").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "b"))
  }

  test("keyset pagination walks the whole table without overlap") {
    val nation = ImportSource.table(spark, sf, "nation")
    val (pages, cursor) = ImportSource.keysetImport(nation, "n_nationkey", 10)
    assert(pages.map(_.count()).sum == 25)
    val all = pages.map(_.select("n_nationkey")).reduce(_ union _)
      .distinct().count()
    assert(all == 25)
    assert(cursor.contains(24))
  }

  test("insertResult folds to (count, max lsn)") {
    import spark.implicits._
    val df = Seq((Some(5L)), (Some(9L)), (Option.empty[Long])).toDF("lsn")
    val r = ChangelogOps.insertResult(df).collect()(0)
    assert(r.getLong(0) == 3 && r.getLong(1) == 9)
  }

  test("backoff caps at max") {
    import spark.implicits._
    val got = Seq(0, 1, 2, 3, 4, 5, 6).toDF("n")
      .select(ChangelogOps.backoffSeconds(col("n"))).as[Double].collect().toSeq
    assert(got == Seq(5.0, 15.0, 45.0, 135.0, 405.0, 1215.0, 3600.0))
  }

  test("salted join equals plain join on skewed data") {
    import spark.implicits._
    // pathological skew: 90% of fact rows share one key
    val fact = (1 to 1000).map(i => (if (i <= 900) 1L else i.toLong, i))
      .toDF("k", "v")
    val dim = Seq((1L, "hot"), (950L, "cold")).toDF("k", "name")
    val plain = fact.join(dim, "k").select("k", "v", "name")
      .collect().map(_.toSeq).toSet
    val salted = ChangelogOps.saltedJoin(fact, dim, "k", 8)
      .select("k", "v", "name").collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(plain.size == 901)
  }

  test("skew-aware salted join sizes the salt to observed skew") {
    import spark.implicits._
    val dim = Seq((1L, "hot"), (1950L, "cold")).toDF("k", "name")
    // pathological skew: the probe must salt, and results still equal
    // the plain join (sample big enough to see the hot key for sure)
    val skewed = (1 to 2000).map(i => (if (i <= 1800) 1L else i.toLong, i))
      .toDF("k", "v")
    val plainS = skewed.join(dim, "k").select("k", "v", "name")
      .collect().map(_.toSeq).toSet
    val saltedS = ChangelogOps.skewAwareSaltedJoin(skewed, dim, "k",
        maxBuckets = 8, sampleFraction = 0.2)
      .select("k", "v", "name").collect().map(_.toSeq).toSet
    assert(saltedS == plainS && plainS.size == 1801)
    // uniform keys: degrades to the plain join — NO dim replication
    val uniform = (1 to 2000).map(i => (i.toLong % 100, i)).toDF("k", "v")
    val out = ChangelogOps.skewAwareSaltedJoin(uniform, dim, "k",
      maxBuckets = 8, sampleFraction = 0.2)
    assert(!out.queryExecution.executedPlan.toString.contains("Generate"),
      "uniform keys must not replicate the dimension")
    assert(out.count() == uniform.where($"k" === 1L).count())
  }

  test("all declared queries run and oracle keys align") {
    // the driver contract is 1:1 — a query without an oracle silently
    // skips the correctness gate, so every exception must be declared
    // in SparkEntry.rowsOnly (and carry a spec pinning its algebra)
    assert(SparkEntry.oracleSql.keySet ==
      SparkEntry.queries.keySet -- SparkEntry.rowsOnly,
      s"asymmetric: ${(SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet) ++
        (SparkEntry.queries.keySet -- SparkEntry.rowsOnly -- SparkEntry.oracleSql.keySet)}")
    assert(SparkEntry.rowsOnly.subsetOf(SparkEntry.queries.keySet))
    assert((SparkEntry.rowsOnly & SparkEntry.oracleSql.keySet).isEmpty,
      "rowsOnly entries must not also declare an oracle")
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n >= 0, s"$name failed")
    }
  }
}
