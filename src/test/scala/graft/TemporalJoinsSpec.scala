package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TemporalJoins

class TemporalJoinsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def quotes = Seq(
    ("A", ts("2024-01-01 10:00:00"), 100.0),
    ("A", ts("2024-01-01 10:00:05"), 101.0),
    ("A", ts("2024-01-01 10:00:10"), 102.0),
    ("B", ts("2024-01-01 10:00:03"), 200.0)
  ).toDF("q_sym", "q_ts", "price")

  private def trades = Seq(
    ("A", ts("2024-01-01 09:59:59"), 1L), // before any quote
    ("A", ts("2024-01-01 10:00:05"), 2L), // exactly at a quote: inclusive
    ("A", ts("2024-01-01 10:00:07"), 3L), // between quotes
    ("A", ts("2024-01-01 10:00:59"), 4L), // after the last quote
    ("B", ts("2024-01-01 10:00:04"), 5L),
    ("C", ts("2024-01-01 10:00:04"), 6L) // key with no quotes at all
  ).toDF("sym", "ts", "trade_id")

  test("asOfJoin picks the latest right row at-or-before each left row") {
    val out = TemporalJoins.asOfJoin(trades, quotes,
        "sym", "q_sym", "ts", "q_ts", Seq("price"))
      .select($"trade_id", $"price").as[(Long, Option[Double])]
      .collect().toMap
    assert(out == Map(
      1L -> None, // no quote yet
      2L -> Some(101.0), // equal timestamp is inclusive
      3L -> Some(101.0),
      4L -> Some(102.0),
      5L -> Some(200.0),
      6L -> None)) // unseen key -> left-outer null
  }

  test("asOfJoin keeps every left row exactly once") {
    val out = TemporalJoins.asOfJoin(trades, quotes,
      "sym", "q_sym", "ts", "q_ts", Seq("price"))
    assert(out.count() == trades.count())
    assert(out.columns.toSeq == Seq("sym", "ts", "trade_id", "price"))
  }

  test("asOfJoin ties at equal (key, ts) resolve to the greatest payload") {
    val dupQuotes = quotes.unionByName(
      Seq(("A", ts("2024-01-01 10:00:05"), 150.0)).toDF("q_sym", "q_ts", "price"))
    val out = TemporalJoins.asOfJoin(trades, dupQuotes,
        "sym", "q_sym", "ts", "q_ts", Seq("price"))
      .where($"trade_id" === 2L).select($"price").as[Double].collect()
    assert(out.toSeq == Seq(150.0))
  }

  test("asOfJoin plans one shuffle and zero joins") {
    val out = TemporalJoins.asOfJoin(trades, quotes,
      "sym", "q_sym", "ts", "q_ts", Seq("price"))
    val plan = out.queryExecution.executedPlan.toString
    val shuffles = "Exchange (hash|range|Single)".r.findAllIn(plan).size
    assert(shuffles == 1, s"as-of must shuffle once, on the key:\n$plan")
    assert(!plan.contains("Join"), s"as-of must compile join-free:\n$plan")
  }

  test("asOfJoinBroadcast equals asOfJoin and never shuffles the left side") {
    val viaWindow = TemporalJoins.asOfJoin(trades, quotes,
        "sym", "q_sym", "ts", "q_ts", Seq("price"))
      .select($"trade_id", $"price").as[(Long, Option[Double])].collect().toMap
    val viaBroadcast = TemporalJoins.asOfJoinBroadcast(trades, quotes,
        "sym", "q_sym", "ts", "q_ts", Seq("price"))
      .select($"trade_id", $"price").as[(Long, Option[Double])].collect().toMap
    assert(viaBroadcast == viaWindow)
    // tie-break parity with the window formulation
    val dupQuotes = quotes.unionByName(
      Seq(("A", ts("2024-01-01 10:00:05"), 150.0)).toDF("q_sym", "q_ts", "price"))
    val tie = TemporalJoins.asOfJoinBroadcast(trades, dupQuotes,
        "sym", "q_sym", "ts", "q_ts", Seq("price"))
      .where($"trade_id" === 2L).select($"price").as[Double].collect()
    assert(tie.toSeq == Seq(150.0))
    // plan: broadcast join only — no hash/range exchange on the fact side
    val plan = TemporalJoins.asOfJoinBroadcast(trades, quotes,
      "sym", "q_sym", "ts", "q_ts", Seq("price"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
    // the only hash exchange is the dim side's groupBy; the fact side
    // streams from its scan unshuffled
    val hashExchanges = "Exchange hash".r.findAllIn(plan).size
    assert(hashExchanges <= 1, s"fact side must not shuffle:\n$plan")
  }

  test("asOfJoinNative (custom physical operator) equals asOfJoin incl. ties and missing keys") {
    graft.functions.GraftSparkExtensions.register(spark)
    val viaWindow = TemporalJoins.asOfJoin(trades, quotes,
        "sym", "q_sym", "ts", "q_ts", Seq("price"))
      .select($"trade_id", $"price").as[(Long, Option[Double])].collect().toMap
    val native = TemporalJoins.asOfJoinNative(trades, quotes,
        "sym", "q_sym", "ts", "q_ts", Seq("price"))
      .select($"trade_id", $"price").as[(Long, Option[Double])].collect().toMap
    assert(native == viaWindow)

    // ties at equal (key, ts): greatest payload, same as the window form
    val dupQuotes = quotes.unionByName(
      Seq(("A", ts("2024-01-01 10:00:05"), 150.0)).toDF("q_sym", "q_ts", "price"))
    val tied = TemporalJoins.asOfJoinNative(trades, dupQuotes,
        "sym", "q_sym", "ts", "q_ts", Seq("price"))
      .select($"trade_id", $"price").as[(Long, Option[Double])].collect().toMap
    assert(tied(2L).contains(150.0) && tied(3L).contains(150.0))

    // the plan is the custom exec: no window, no union, one merge node
    val plan = TemporalJoins.asOfJoinNative(trades, quotes,
      "sym", "q_sym", "ts", "q_ts", Seq("price"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"expected AsOfJoinExec in:\n$plan")
    assert(!plan.contains("Window") && !plan.contains("Union"),
      s"native plan must not fall back to union+window:\n$plan")
  }

  test("asOfJoinNative equals asOfJoin on the events table (real data, many keys)") {
    graft.functions.GraftSparkExtensions.register(spark)
    val ev = graft.sources.ImportSource.table(spark, "/root/testdata/sf0.001", "events")
    val clicks = ev.where($"event_type" === "click")
      .select($"event_id", $"user_id", $"ts")
    val purchases = ev.where($"event_type" === "purchase")
      .select($"user_id".as("p_user"), $"ts".as("p_ts"),
        $"event_id".as("p_event_id"), $"value".as("p_value"))
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select($"event_id", $"p_event_id", $"p_value")
        .as[(Long, Option[Long], Option[Double])].collect().toSet
    val a = key(TemporalJoins.asOfJoin(clicks, purchases,
      "user_id", "p_user", "ts", "p_ts", Seq("p_event_id", "p_value")))
    val b = key(TemporalJoins.asOfJoinNative(clicks, purchases,
      "user_id", "p_user", "ts", "p_ts", Seq("p_event_id", "p_value")))
    assert(a == b && a.nonEmpty)
  }

  test("asOfJoinNative self-join (shared exprIds) binds the RIGHT payload") {
    graft.functions.GraftSparkExtensions.register(spark)
    // same DataFrame on both sides, right columns NOT renamed by the
    // caller: without internal aliasing the right projection keeps the
    // left's exprIds and the payload silently reads the LEFT row.
    // Two rows tie at (sym, ts), so the correct answer for BOTH is
    // the greatest payload (5.0) — a left rebind would echo each
    // row's own price back instead.
    val ev = Seq(
      ("A", ts("2024-01-01 10:00:00"), 1.0),
      ("A", ts("2024-01-01 10:00:00"), 5.0)
    ).toDF("sym", "ts", "price")
    val out = TemporalJoins.asOfJoinNative(ev, ev,
        "sym", "sym", "ts", "ts", Seq("price"))
      .toDF("sym", "ts", "l_price", "r_price") // positional: names collide
      .select($"l_price", $"r_price").as[(Double, Double)]
      .collect().toSet
    assert(out == Set((1.0, 5.0), (5.0, 5.0)))
  }

  test("bandedRangeJoin finds exactly the pairs inside (ts, ts+width]") {
    val e = Seq(
      (1L, "u1", ts("2024-01-01 10:00:00")),
      (2L, "u1", ts("2024-01-01 10:04:00")), // 240s after 1: in range of 1
      (3L, "u1", ts("2024-01-01 10:05:00")), // 300s after 1: boundary, inclusive
      (4L, "u1", ts("2024-01-01 10:20:00")), // out of range of all before
      (5L, "u2", ts("2024-01-01 10:04:30")) // other key
    ).toDF("event_id", "user_id", "ts")
    val l = e.select($"event_id".as("a_id"), $"user_id", $"ts")
    val r = e.select($"event_id".as("b_id"), $"user_id".as("b_user"), $"ts".as("b_ts"))
    val pairs = TemporalJoins.bandedRangeJoin(l, r, "user_id", "b_user", "ts", "b_ts", 300L)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("bandedRangeJoin emits each qualifying pair exactly once") {
    // timestamps straddling a band boundary (width 300: bands at :00/:05)
    val e = Seq(
      (1L, "u", ts("2024-01-01 10:04:59")),
      (2L, "u", ts("2024-01-01 10:05:01"))
    ).toDF("event_id", "user_id", "ts")
    val l = e.select($"event_id".as("a_id"), $"user_id", $"ts")
    val r = e.select($"event_id".as("b_id"), $"user_id".as("b_user"), $"ts".as("b_ts"))
    val pairs = TemporalJoins.bandedRangeJoin(l, r, "user_id", "b_user", "ts", "b_ts", 300L)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toList
    assert(pairs == List((1L, 2L)))
  }

  test("bandedRangeJoin compiles to an equi hash join, not nested loop") {
    val e = Seq((1L, "u", ts("2024-01-01 10:00:00"))).toDF("event_id", "user_id", "ts")
    val l = e.select($"event_id".as("a_id"), $"user_id", $"ts")
    val r = e.select($"event_id".as("b_id"), $"user_id".as("b_user"), $"ts".as("b_ts"))
    val plan = TemporalJoins.bandedRangeJoin(l, r, "user_id", "b_user", "ts", "b_ts", 300L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join must stay an equi-join on (key, band):\n$plan")
  }
}
