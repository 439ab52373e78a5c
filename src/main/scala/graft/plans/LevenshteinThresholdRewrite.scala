package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: turn a thresholded edit-distance comparison into
  * Spark's early-exit form.
  *
  * `levenshtein(a, b) <= k` computes the FULL O(|a|x|b|) dynamic
  * program, then compares. The banded variant `levenshtein(a, b, k)`
  * (threshold argument, Spark 3.5+) abandons a row as soon as the
  * running minimum exceeds k — O(k x min(|a|,|b|)) — and returns -1
  * past the threshold. Since the result is either -1 or a distance
  * in [0, k]:
  *
  *   levenshtein(a, b) <= k   ===   levenshtein(a, b, k) >= 0
  *   levenshtein(a, b) <  k   ===   levenshtein(a, b, k-1) >= 0
  *
  * (null-safe: both sides are null exactly when an input is null).
  * In a fuzzy self-join the predicate runs once per candidate pair —
  * at corpus scale the band cap is the difference between O(n·L²) and
  * O(n·kL) comparison work, with no call-site change.
  *
  * Only literal non-negative thresholds rewrite; k = 0 is left alone
  * (Spark requires a positive threshold, and `<= 0` is equality).
  * Registered via [[graft.functions.GraftSparkExtensions]].
  */
object LevenshteinThresholdRewrite extends Rule[LogicalPlan] {

  private def rewrite(lev: Levenshtein, k: Int): Expression =
    GreaterThanOrEqual(
      Levenshtein(lev.left, lev.right, Some(Literal(k, IntegerType))),
      Literal(0, IntegerType))

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // lev(a,b) <= k  /  k >= lev(a,b)
      case LessThanOrEqual(lev @ Levenshtein(_, _, None), Literal(k: Int, IntegerType))
          if k >= 1 => rewrite(lev, k)
      case GreaterThanOrEqual(Literal(k: Int, IntegerType), lev @ Levenshtein(_, _, None))
          if k >= 1 => rewrite(lev, k)
      // lev(a,b) < k  /  k > lev(a,b)
      case LessThan(lev @ Levenshtein(_, _, None), Literal(k: Int, IntegerType))
          if k >= 2 => rewrite(lev, k - 1)
      case GreaterThan(Literal(k: Int, IntegerType), lev @ Levenshtein(_, _, None))
          if k >= 2 => rewrite(lev, k - 1)
    }
}
