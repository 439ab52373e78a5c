package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TopKAggregator

class TopKAggregatorSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("bounded heap keeps k best, descending, ties to lower id") {
    val agg = new TopKAggregator(3)
    val rows = Seq((1L, 5.0), (2L, 9.0), (3L, 9.0), (4L, 1.0), (5L, 7.0))
    val heap = rows.foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(heap) == Seq(2L, 3L, 5L)) // 9.0 tie -> lower id first
  }

  test("merge is order-insensitive (partial aggregation safe)") {
    val agg = new TopKAggregator(2)
    val a = Seq((1L, 5.0), (2L, 9.0)).foldLeft(agg.zero)(agg.reduce)
    val b = Seq((3L, 7.0), (4L, 1.0)).foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(agg.merge(a, b)) == agg.finish(agg.merge(b, a)))
    assert(agg.finish(agg.merge(a, b)) == Seq(2L, 3L))
  }

  test("distributed grouped top-k equals the window formulation") {
    val orders = graft.sources.ImportSource
      .table(spark, "/root/testdata/sf0.001", "orders")
    val topk = udaf(new TopKAggregator(3))
    val viaAgg = orders.groupBy($"o_custkey")
      .agg(topk($"o_orderkey", $"o_totalprice").as("top"))
      .as[(Long, Seq[Long])].collect().toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    val viaWindow = orders
      .withColumn("rn", row_number().over(w)).where($"rn" <= 3)
      .groupBy($"o_custkey")
      .agg(collect_list(struct($"rn", $"o_orderkey")).as("xs"))
      .as[(Long, Seq[(Int, Long)])].collect()
      .map { case (c, xs) => c -> xs.sortBy(_._1).map(_._2) }.toMap
    assert(viaAgg == viaWindow)
  }
}
