package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.{Envelope, Operation}
import graft.ops.{ChangelogOps, TextOps}

/** SCD2 history, incremental-maintenance deltas, gap detection, and
  * span dedup — the history/audit layer over the changelog.
  */
class HistoryOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  /** (key, t, lsn, op, value) rows as a changelog envelope. */
  private def changelog(rows: (String, String, Long, String, Double)*) =
    rows.toSeq
      .toDF("k", "t", Envelope.LsnCol, Envelope.OperationCol, "value")
      .withColumn(Envelope.TimestampCol, col("t").cast("timestamp"))
      .withColumn(Envelope.SequenceCol, lit(null).cast("long"))
      .drop("t")

  private val cl = changelog(
    ("k1", "2024-01-01 00:00:01", 1L, Operation.Insert, 10.0),
    ("k1", "2024-01-01 00:00:02", 2L, Operation.Update, 15.0),
    ("k1", "2024-01-01 00:00:03", 3L, Operation.Delete, 15.0),
    ("k1", "2024-01-01 00:00:04", 4L, Operation.Update, 7.0),
    ("k2", "2024-01-01 00:00:01", 5L, Operation.Insert, 3.0),
    ("k2", "2024-01-01 00:00:05", 6L, Operation.Delete, 3.0),
    ("k3", "2024-01-01 00:00:02", 7L, Operation.Insert, 5.0))

  test("scdHistory emits validity intervals; DELETE closes but never appears") {
    val hist = ChangelogOps.scdHistory(cl, Seq(col("k")))
      .select("k", Envelope.LsnCol, "valid_from", "valid_to", "is_current")
      .orderBy("k", Envelope.LsnCol)
      .collect()
    assert(hist.toSeq == Seq(
      Row("k1", 1L, ts("2024-01-01 00:00:01"), ts("2024-01-01 00:00:02"), false),
      // the DELETE at t3 closes this interval even though it emits no row
      Row("k1", 2L, ts("2024-01-01 00:00:02"), ts("2024-01-01 00:00:03"), false),
      Row("k1", 4L, ts("2024-01-01 00:00:04"), null, true),
      Row("k2", 5L, ts("2024-01-01 00:00:01"), ts("2024-01-01 00:00:05"), false),
      Row("k3", 7L, ts("2024-01-01 00:00:02"), null, true)))
  }

  test("stateDeltas telescope to the latest-row state, including deleted keys") {
    val perKey = ChangelogOps.stateDeltas(cl, Seq(col("k")), col("value"))
      .groupBy("k")
      .agg(sum("delta_value").cast("double").as("net"),
        sum("delta_alive").as("alive"))
      .orderBy("k")
      .collect()
    assert(perKey.toSeq == Seq(
      Row("k1", 7.0, 1L),   // 10 → 15 → deleted → 7
      Row("k2", 0.0, 0L),   // inserted then deleted: nets out
      Row("k3", 5.0, 1L)))
    // the maintained global aggregate equals recomputation over latestRows
    val maintained = ChangelogOps.stateDeltas(cl, Seq(col("k")), col("value"))
      .agg(sum("delta_value").cast("double"), sum("delta_alive")).head()
    val recomputed = ChangelogOps.latestRowView(cl, Seq(col("k")))
      .agg(sum("value").cast("double"), count(lit(1))).head()
    assert(maintained == recomputed)
  }

  test("gapDetect finds in-bucket, cross-bucket, and empty-bucket gaps only") {
    val seqs = Seq(1L, 2L, 3L, 7L, 8L, 12L, 14L, 22L).toDF("seq")
    val gaps = ChangelogOps.gapDetect(seqs, col("seq"), bucket = 5L)
      .orderBy("gap_after").collect()
    assert(gaps.toSeq == Seq(
      Row(3L, 7L, 3L),    // crosses the b0/b1 boundary
      Row(8L, 12L, 3L),   // crosses b1/b2
      Row(12L, 14L, 1L),  // inside b2
      Row(14L, 22L, 7L))) // b3 is empty: compared against last non-empty
    val dense = ChangelogOps.gapDetect(
      spark.range(0, 57).toDF("seq"), col("seq"), bucket = 10L)
    assert(dense.isEmpty)
  }

  test("intervalCoverage merges overlapping and touching intervals; overlaps count once") {
    // duration 300s. user 1: [0,300)+[100,400) merge (early long overlap),
    // [1000,1300) separate. user 2: [0,300)+[300,600) touch -> merge.
    // user 3: an early LONG span swallows later short ones (the case a
    // plain lag-based rule gets wrong): [0,300),[10,310),[20,320) all one.
    val df = Seq(
      (1, 0L), (1, 100L), (1, 1000L),
      (2, 0L), (2, 300L),
      (3, 0L), (3, 10L), (3, 20L)).toDF("u", "sec")
      .withColumn("ts", col("sec").cast("timestamp"))
    val out = ChangelogOps.intervalCoverage(df, col("u"), col("ts"), 300L)
      .orderBy("key").collect()
    assert(out.toSeq == Seq(
      Row(1, 2L, 700000000L),   // [0,400) + [1000,1300)
      Row(2, 1L, 600000000L),   // [0,600)
      Row(3, 1L, 320000000L)))  // [0,320)
  }

  test("snapshotDiff: identical snapshots diff to nothing; each op classifies correctly") {
    import graft.ops.ChangelogOps
    val v1 = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "status", "price")
    assert(ChangelogOps.snapshotDiff(v1, v1, Seq("id")).count() == 0)

    val v2 = Seq((2L, "b", 20.0), (3L, "c", 35.0), (4L, "d", 40.0))
      .toDF("id", "status", "price") // 1 deleted, 3 updated, 4 inserted
    val diff = ChangelogOps.snapshotDiff(v1, v2, Seq("id"))
      .select($"id", $"operation").as[(Long, String)].collect().toMap
    assert(diff == Map(1L -> "DELETE", 3L -> "UPDATE", 4L -> "INSERT"))

    // null payloads are compared null-safely: NULL -> value is UPDATE,
    // NULL -> NULL is a no-op
    val n1 = Seq((1L, Option.empty[Double]), (2L, Option.empty[Double]))
      .toDF("id", "price")
    val n2 = Seq((1L, Some(5.0): Option[Double]), (2L, Option.empty[Double]))
      .toDF("id", "price")
    val ndiff = ChangelogOps.snapshotDiff(n1, n2, Seq("id"))
      .select($"id", $"operation").as[(Long, String)].collect().toMap
    assert(ndiff == Map(1L -> "UPDATE"))
  }

  test("applyDiff(before, snapshotDiff(before, after)) reconstructs after (real data)") {
    import graft.ops.ChangelogOps
    val o = graft.sources.ImportSource.table(spark, "/root/testdata/sf0.001", "orders")
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
    val before = o.where($"o_orderkey" % 10 =!= 0)
    val after = o.where($"o_orderkey" % 7 =!= 0)
      .withColumn("o_totalprice",
        when($"o_orderkey" % 3 === 0, $"o_totalprice" + 1000.0)
          .otherwise($"o_totalprice"))
    val diff = ChangelogOps.snapshotDiff(before, after, Seq("o_orderkey"))
    val rebuilt = ChangelogOps.applyDiff(before, diff, Seq("o_orderkey"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, String, Double)].collect().toSet
    assert(rows(rebuilt) == rows(after))
    assert(rows(after).nonEmpty)
  }

  test("spanDedup keeps first occurrences corpus-wide and within documents") {
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "a b c d x y z w"),
      (3L, "p q r s p q r s")).toDF("doc_id", "text")
    val out = TextOps.spanDedup(docs, "doc_id", "text", spanWords = 4)
      .orderBy("doc_id").collect()
    assert(out.toSeq == Seq(
      Row(1L, "a b c d e f g h", 2L, 2L),
      Row(2L, "x y z w", 2L, 1L),        // shared prefix span deduped
      Row(3L, "p q r s", 2L, 1L)))       // within-doc repeat deduped
  }
}
