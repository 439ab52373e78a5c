package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}

/** The full §2.11(c) extension ladder for the as-of join: a custom
  * logical node, a planner strategy, and a sort-merge physical
  * operator — the operator Spark itself has no plan for (an equi-key
  * + time-inequality join falls back to SortMergeJoin + post-filter
  * or BroadcastNestedLoopJoin, both re-scanning right rows per left
  * row).
  *
  * Physical shape: both children hash-cluster on the key and sort
  * within partitions by (key, time) — the same distribution
  * machinery SortMergeJoinExec uses, so EnsureRequirements inserts
  * exchanges/sorts only when needed and AQE sizes them. Each
  * partition then runs a single forward merge: O(|L| + |R|) per
  * partition, no per-row rescans, no window buffering — strictly
  * less work than the union+window formulation
  * ([[graft.ops.TemporalJoins.asOfJoin]]), which carries the union
  * of both sides through one sort.
  *
  * Semantics match asOfJoin: for each left row the latest right row
  * of the same key with right.time <= left.time (inclusive); ties at
  * equal (key, time) resolve to the greatest payload (the right-side
  * sort includes the payload columns, and the merge keeps the last
  * qualifying row). Left-outer: unmatched left rows carry null
  * payload. One deliberate difference: NULL keys never match (SQL
  * equality semantics), where the window formulation groups NULL
  * keys together; NULL right times are skipped.
  */
final case class AsOfJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTime: Attribute, rightTime: Attribute,
    payload: Seq[Attribute]) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rt, payload) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, payload) :: Nil
    case _ => Nil
  }
}

final case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTime: Attribute, rightTime: Attribute,
    payload: Seq[Attribute]) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  // right side additionally sorts by the payload so "last qualifying
  // row wins" reproduces the window formulation's greatest-payload
  // tie-break at equal (key, time)
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)) ++
      payload.map(p => SortOrder(p, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    val lOut = left.output
    val rOut = right.output
    val payloadAttrs = payload
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      import org.apache.spark.sql.catalyst.expressions.Expression
      val lKey = BindReferences.bindReference(leftKey: Expression, lOut)
      val lTime = BindReferences.bindReference(leftTime: Expression, lOut)
      val rKey = BindReferences.bindReference(rightKey: Expression, rOut)
      val rTime = BindReferences.bindReference(rightTime: Expression, rOut)
      // the projection reads left columns + payload columns from the
      // joined (left ++ right) row; payload references bind with
      // nullable = true regardless of the child attribute (unmatched
      // left rows read from an all-null right row, and a non-nullable
      // binding would skip the null check and read garbage zeros)
      val joinedOut = lOut ++ rOut
      val project = UnsafeProjection.create(
        (lOut ++ payloadAttrs).map { a =>
          val i = joinedOut.indexWhere(_.exprId == a.exprId)
          val nullable = a.nullable || i >= lOut.size
          org.apache.spark.sql.catalyst.expressions.BoundReference(
            i, a.dataType, nullable): org.apache.spark.sql.catalyst.expressions.Expression
        },
        Nil)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.size)
      val rBuf = rIter.buffered
      var matchRow: InternalRow = null
      var matchKey: Any = null

      lIter.map { lRow =>
        val k = lKey.eval(lRow)
        val t = lTime.eval(lRow)
        if (k != null && t != null) {
          // advance the right cursor through every row at or before
          // (k, t); the last qualifying row of key k is the match
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val head = rBuf.head
            val rk = rKey.eval(head)
            val cmp = if (rk == null) -1 else keyOrd.compare(rk, k)
            if (cmp < 0) { rBuf.next() } // earlier key (or null): discard
            else if (cmp == 0) {
              val rt = rTime.eval(head)
              if (rt == null) { rBuf.next() } // unordered time: skip
              else if (timeOrd.compare(rt, t) <= 0) {
                val copied = rBuf.next().copy()
                matchRow = copied
                matchKey = rKey.eval(copied)
              } else advancing = false
            } else advancing = false
          }
        }
        val rightSide =
          if (k != null && matchRow != null && matchKey != null &&
            keyOrd.compare(matchKey, k) == 0) matchRow
          else nullRight
        project(joined(lRow, rightSide))
      }
    }
  }
}
