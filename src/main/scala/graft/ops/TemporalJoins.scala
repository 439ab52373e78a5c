package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark has no native plan for: as-of joins
  * and keyed range (interval) joins.
  *
  * Spark compiles a join whose condition mixes an equi-key with a
  * time inequality into SortMergeJoin + post-filter at best and
  * BroadcastNestedLoopJoin at worst — both re-scan every right row
  * per left row within a key at 100 TB. These operators re-express
  * the semantics as shapes Catalyst executes well:
  *
  *  - [[asOfJoin]]: union + one window pass — a single shuffle on
  *    the key, one sort, zero joins. O((|L|+|R|) log) per key
  *    instead of O(|L|·|R|).
  *  - [[bandedRangeJoin]]: bucketize time into bands of the range
  *    width and equi-join on (key, band) — the candidate space
  *    shrinks from "all right rows of the key" to "two bands", and
  *    the join stays a hash join that AQE can size and skew-split.
  */
object TemporalJoins {

  /** As-of join: for every left row, the single latest right row of
    * the same key with `right.ts <= left.ts` (inclusive). Left rows
    * with no prior right row keep null right fields — left-outer
    * as-of semantics, matching DuckDB/QuestDB/kdb `ASOF JOIN`.
    *
    * Implementation: tag both sides, union, and take per key (in
    * (ts, side) order) the last non-null right payload at or before
    * each left row. Right rows order before left rows at an equal
    * timestamp, so "at-or-before" is inclusive. Multiple right rows
    * at the same (key, ts) resolve deterministically to the greatest
    * payload struct (field-order comparison).
    *
    * @param rightPayload right columns to carry; they must not
    *                     collide with left column names.
    */
  def asOfJoin(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      rightPayload: Seq[String]): DataFrame = {
    require(rightPayload.nonEmpty, "asOfJoin needs at least one right payload column")
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("_k", col(leftKey))
      .withColumn("_ts", col(leftTs))
      .withColumn("_side", lit(1))
    val r = right.select(
      col(rightKey).as("_k"),
      col(rightTs).as("_ts"),
      lit(0).as("_side"),
      struct(rightPayload.map(col): _*).as("_r"))
    // left rows gain _r = null, right rows gain null left columns
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_ts"), col("_side"), col("_r"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("_match", last(col("_r"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)
      .select(leftCols.map(col) ++
        rightPayload.map(c => col("_match").getField(c).as(c)): _*)
  }

  /** Broadcast as-of join — same semantics as [[asOfJoin]], zero
    * shuffle on the left side. Use when the right side is
    * dimension-sized (quote history, config versions): its rows
    * collapse to one sorted history array per key, that table
    * broadcasts, and each left row picks its match with a map-side
    * array scan — the fact side streams straight from the scan, no
    * exchange, no sort.
    *
    * Per-row cost is O(|history of the key|) (HOF filter over the
    * array); the union+window [[asOfJoin]] stays the right choice
    * when both sides are large.
    */
  def asOfJoinBroadcast(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      rightPayload: Seq[String]): DataFrame = {
    require(rightPayload.nonEmpty, "asOfJoinBroadcast needs a right payload")
    val leftCols = left.columns.toSeq
    // sort_array orders by struct field order: (_ts, payload...) — so
    // the last qualifying element is the latest, ties resolving to
    // the greatest payload exactly like asOfJoin's window order
    val hist = right.groupBy(col(rightKey).as("_k"))
      .agg(sort_array(collect_list(struct(
        col(rightTs).as("_ts") +: rightPayload.map(col): _*))).as("_hist"))
    // try_element_at: null on the empty array instead of an ANSI
    // error, and the history filter evaluates once per row (a
    // size()-guard would inline and re-run it)
    val m = try_element_at(
      filter(col("_hist"), e => e.getField("_ts") <= col(leftTs)), lit(-1))
    left.join(broadcast(hist), col(leftKey) === col("_k"), "left")
      .withColumn("_m", m)
      .select(leftCols.map(col) ++
        rightPayload.map(c => col("_m").getField(c).as(c)): _*)
  }

  /** Keyed range join: all pairs (l, r) with matching keys and
    * `r.ts` in `(l.ts, l.ts + width]` — "right events following a
    * left event within `width` seconds".
    *
    * Implementation: band both sides by `floor(epoch / width)`. A
    * right row in `(l.ts, l.ts + width]` can only sit in the left
    * row's band or the next one, so the left side replicates to
    * exactly those two bands (2× amplification, constant), the join
    * is a plain equi-join on (key, band), and the exact interval
    * predicate filters the band-collisions. Each qualifying pair
    * appears exactly once: a right row lives in one band only.
    */
  def bandedRangeJoin(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      widthSec: Long): DataFrame = {
    require(widthSec > 0, "range width must be positive")
    val lEpoch = col(leftTs).cast("timestamp").cast("double")
    val rEpoch = col(rightTs).cast("timestamp").cast("double")
    val lBand = floor(lEpoch / widthSec).cast("long")
    // aliased sides + qualified references: safe under self-joins,
    // where unqualified attributes resolve ambiguously
    val l = left
      .withColumn("_lts", lEpoch)
      .withColumn("_lband", explode(array(lBand, lBand + 1L)))
      .alias("_gl")
    val r = right
      .withColumn("_rts", rEpoch)
      .withColumn("_rband", floor(rEpoch / widthSec).cast("long"))
      .alias("_gr")
    l.join(r,
        col(s"_gl.$leftKey") === col(s"_gr.$rightKey") &&
          col("_gl._lband") === col("_gr._rband") &&
          col("_gr._rts") > col("_gl._lts") &&
          col("_gr._rts") <= col("_gl._lts") + widthSec)
      .drop("_lband", "_rband", "_lts", "_rts")
  }

  /** As-of join through the native physical operator
    * ([[graft.plans.AsOfJoinExec]]): same semantics as [[asOfJoin]]
    * (inclusive at-or-before, greatest-payload tie-break, left-outer;
    * NULL keys never match), but executed as a per-partition forward
    * merge over key-clustered, time-sorted children — O(|L| + |R|)
    * per partition with no union materialization and no window
    * buffering. Requires [[graft.functions.GraftSparkExtensions]]
    * (the planner strategy) on the session.
    */
  def asOfJoinNative(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      rightPayload: Seq[String]): DataFrame = {
    require(rightPayload.nonEmpty, "asOfJoinNative needs a right payload")
    import graft.plans.AsOfJoinNode
    import org.apache.spark.sql.graftbridge.Bridge
    // the node is unplannable without its strategy; registration is
    // idempotent, so self-register rather than fail with an internal
    // planner error on sessions built without the extensions
    graft.functions.GraftSparkExtensions.register(left.sparkSession)
    val lp = Bridge.analyzed(left)
    // restrict the right side to what the operator reads, so column
    // pruning happens by construction — and ALIAS every column
    // (col(n).as(n) mints a fresh exprId) so a self-join can't leave
    // the right side sharing the left's exprIds: the exec's output
    // projection binds payload references by exprId, and a duplicate
    // would silently read the LEFT row's columns
    val rp = Bridge.analyzed(
      right.select((Seq(rightKey, rightTs) ++ rightPayload).distinct
        .map(n => col(n).as(n)): _*))
    require(lp.output.map(_.exprId).toSet
        .intersect(rp.output.map(_.exprId).toSet).isEmpty,
      "as-of join sides must not share attribute ids")
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        n: String) = p.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"no column '$n' in ${p.output.map(_.name)}"))
    Bridge.ofRows(left.sparkSession,
      AsOfJoinNode(lp, rp,
        attr(lp, leftKey), attr(rp, rightKey),
        attr(lp, leftTs), attr(rp, rightTs),
        rightPayload.map(attr(rp, _))))
  }
}
