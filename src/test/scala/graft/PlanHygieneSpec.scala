package graft

import org.scalatest.funsuite.AnyFunSuite

/** Sweeping plan-hygiene gate over EVERY declared query: none may
  * silently degrade to a nested-loop or cartesian join — the plan
  * shapes that stop scaling first. Queries that intentionally cross
  * tiny inputs are allowlisted with the reason inline; adding a query
  * that trips this gate means either fix the plan or consciously
  * extend the allowlist.
  */
class PlanHygieneSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  // deliberate tiny-side cross products, bounded by construction:
  // a BroadcastNestedLoopJoin whose build side is ONE row (a corpus
  // statistic joined to every row) costs a broadcast of one row —
  // the loop is over a single element. q70 crosses the 10 distinct
  // sources (100 pairs) by design.
  private val allowCross = Set(
    "q63_tfidf", "q64_bm25", "q71_unigram_logprob", // 1-row corpus stats
    "q94_kl_divergence", "q108_idle_customers",     // 1-row scalar threshold
    "q114_important_parts",                         // 1-row total for share-of
    "q70_edit_distance",                            // all-pairs of 10 sources
    "q145_nb_classify",                             // docs × |labels| scoring: build side is the label model (a handful of rows), bounded by class count not data
    "q159_token_mi",                                // 1-row (N, N1) totals joined to the vocab cells
    "q165_zipf_slope",                              // 1-row fit × 1-row corpus totals
    "q174_kn_bigram",                               // 1-row bigram-type grand total joined to the type model
    "q175_skew_report",                             // 1-row (n_total, max_bucket) stats joined to the top-k keys
    "q180_calibration",                             // 1-row ECE joined to the ≤bins rows
    "q183_kmv_algebra",                             // 1-row sketch × 1-row sketch combine
    "q187_ann_recall",                              // corpus × FIXED-SIZE query sample (id-capped, ≤200 at any corpus size), query side broadcast
    "q189_two_level_recall_os1",                    // cellRecall: same shape as q187 — corpus × bounded query sample, query side broadcast
    "q190_two_level_recall_os2",                    // cellRecall at the default oversample, same bounded cross
    "q191_two_level_recall_np1",                    // cellRecallProbe: the q189 evaluation shape with a probe-set column on the broadcast query sample
    "q192_two_level_recall_np2",                    // cellRecallProbe at nprobe=2, same bounded cross
    "q193_two_level_recall_np4",                    // cellRecallProbe at nprobe=4, same bounded cross
    "q196_two_level_recall_wide",                   // cellRecallProbe over the coarse-widened probe set, same bounded cross
    "q197_retrieval_operating_point")               // cellRecallProbe over the single-level ivfProbe assignment — same id-capped bounded cross

  test("no query plans a cartesian or nested-loop join (allowlisted tiny crosses aside)") {
    graft.functions.GraftSparkExtensions.register(spark)
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan = try fn(spark, sf).queryExecution.executedPlan.toString
        catch { case e: Throwable => fail(s"$name failed to plan: ${e.getMessage}") }
      val bad = plan.contains("CartesianProduct") ||
        plan.contains("BroadcastNestedLoopJoin")
      if (bad && !allowCross.contains(name)) offenders += name
    }
    assert(offenders.isEmpty,
      s"nested-loop/cartesian plans outside the allowlist: $offenders")
  }

  test("no query windows over an unpartitioned frame on unbounded input") {
    graft.functions.GraftSparkExtensions.register(spark)
    import org.apache.spark.sql.catalyst.plans.logical.{GlobalLimit, LogicalPlan, Window}
    // a single-partition window is fine ONLY when its input is
    // already contracted to a bounded row count by a limit below it
    // (the postLimitRank pattern: rank the top-k AFTER TakeOrdered)
    def boundedBelow(p: LogicalPlan): Boolean =
      p.collectFirst { case _: GlobalLimit => () }.isDefined
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan = try fn(spark, sf).queryExecution.optimizedPlan
        catch { case e: Throwable => fail(s"$name failed to plan: ${e.getMessage}") }
      val bad = plan.collect {
        case w: Window if w.partitionSpec.isEmpty && !boundedBelow(w.child) => w
      }
      if (bad.nonEmpty) offenders += name
    }
    assert(offenders.isEmpty,
      s"unpartitioned windows over unbounded input: $offenders")
  }
}
