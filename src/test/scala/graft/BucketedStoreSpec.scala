package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.SortExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.BucketedStore
import graft.sources.ImportSource

/** Bucketed layout = the shuffle paid once at write time: co-located
  * joins and exchange-free aggregations are the planner-visible
  * contract, and results stay identical to the unbucketed plan.
  */
class BucketedStoreSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  val sf = "/root/testdata/sf0.001"

  private def shuffles(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec => e
    }.length

  test("bucketed tables join co-located: zero exchanges, zero sorts, same rows") {
    val docs = ImportSource.table(spark, sf, "documents")
    BucketedStore.writeBucketed(
      docs.select($"doc_id", $"lang"), "b_docs", "doc_id", 8)
    BucketedStore.writeBucketed(
      docs.select($"doc_id", $"n_chars"), "b_stats", "doc_id", 8)

    val joined = BucketedStore.table(spark, "b_docs")
      .join(BucketedStore.table(spark, "b_stats"), "doc_id")
    assert(shuffles(joined) == 0,
      s"bucketed join must not exchange:\n${joined.queryExecution.executedPlan}")
    assert(joined.queryExecution.executedPlan.collect {
      case s: SortExec => s
    }.isEmpty, "in-bucket sort order must satisfy the merge join")

    // identical to the unbucketed join
    val want = docs.select($"doc_id", $"lang")
      .join(docs.select($"doc_id", $"n_chars"), "doc_id")
      .orderBy($"doc_id").collect().toSeq
    assert(joined.orderBy($"doc_id").collect().toSeq == want)
  }

  test("groupBy on the bucket key aggregates exchange-free below the final contraction") {
    val agg = BucketedStore.table(spark, "b_stats")
      .groupBy($"doc_id").agg(sum($"n_chars").as("s"))
    assert(shuffles(agg) == 0,
      s"bucketed groupBy must not exchange:\n${agg.queryExecution.executedPlan}")
    // and the values are right (doc_id unique → sum = n_chars)
    val got = agg.orderBy($"doc_id").limit(3).as[(Long, Long)].collect()
    val want = ImportSource.table(spark, sf, "documents")
      .select($"doc_id", $"n_chars").orderBy($"doc_id").limit(3)
      .as[(Long, Long)].collect()
    assert(got.sameElements(want))
  }

  test("mismatched bucket counts fall back to a correct (shuffled) join") {
    val docs = ImportSource.table(spark, sf, "documents")
    BucketedStore.writeBucketed(
      docs.select($"doc_id", $"source"), "b_docs4", "doc_id", 4)
    val joined = BucketedStore.table(spark, "b_docs")
      .join(BucketedStore.table(spark, "b_docs4"), "doc_id")
    // one side re-shuffles (or re-buckets); rows stay correct
    assert(joined.count() == docs.count())
  }
}
