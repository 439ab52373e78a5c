package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.SampleOps

class SampleOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ids = (1L to 2000L).toDF("id").withColumn(
    "stratum", when($"id" % 4 === 0, "en").otherwise("other"))

  test("deterministicSample is stable across runs and near the target rate") {
    val a = SampleOps.deterministicSample(ids, "id", 0.3).select("id")
      .as[Long].collect().toSet
    val b = SampleOps.deterministicSample(ids, "id", 0.3).select("id")
      .as[Long].collect().toSet
    assert(a == b, "hash sampling must be a pure function of the id")
    assert(math.abs(a.size / 2000.0 - 0.3) < 0.05)
  }

  test("deterministicSample nests: a 10% sample is a subset of a 30% sample") {
    val small = SampleOps.deterministicSample(ids, "id", 0.1).select("id")
      .as[Long].collect().toSet
    val large = SampleOps.deterministicSample(ids, "id", 0.3).select("id")
      .as[Long].collect().toSet
    assert(small.subsetOf(large),
      "threshold sampling must be monotone in the fraction")
  }

  test("stratifiedSample applies per-stratum rates") {
    val out = SampleOps.stratifiedSample(ids, "id", "stratum",
        Map("en" -> 0.1), default = 0.5)
      .groupBy("stratum").count().as[(String, Long)].collect().toMap
    val enRate = out.getOrElse("en", 0L) / 500.0
    val otherRate = out.getOrElse("other", 0L) / 1500.0
    assert(math.abs(enRate - 0.1) < 0.06, s"en rate was $enRate")
    assert(math.abs(otherRate - 0.5) < 0.06, s"other rate was $otherRate")
  }

  test("sampling is a map-side filter: zero shuffles") {
    val plan = SampleOps.stratifiedSample(ids, "id", "stratum",
      Map("en" -> 0.1), default = 0.5).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hash"), s"sampling must not shuffle:\n$plan")
  }
}
