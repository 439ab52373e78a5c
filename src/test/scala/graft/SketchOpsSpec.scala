package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{SampleOps, SketchOps}

class SketchOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("kmvDistinct is exact below k and within error bounds above") {
    val df = (1L to 5000L).map(i => ("big", i)).toDF("g", "v")
      .unionByName((1L to 40L).map(i => ("small", i)).toDF("g", "v"))
    val got = SketchOps.kmvDistinct(df, "g", "v", 64)
      .as[(String, Double)].collect().toMap
    assert(got("small") == 40.0, "below k the sketch holds every hash: exact")
    // k=64 -> se ~ 1/sqrt(62) ~ 13%; allow 4 sigma
    assert(math.abs(got("big") - 5000.0) / 5000.0 < 0.52,
      s"estimate ${got("big")} too far from 5000")
  }

  test("kmvDistinct ignores null values (no phantom 0.0 hash)") {
    val withNulls = (1L to 100L).map(i => ("g", Some(i)))
      .appendedAll(Seq(("g", None), ("g", None)))
      .toDF("g", "v")
    val without = (1L to 100L).map(i => ("g", i)).toDF("g", "v")
    val a = SketchOps.kmvDistinct(withNulls, "g", "v", 32).as[(String, Double)].head()._2
    val b = SketchOps.kmvDistinct(without, "g", "v", 32).as[(String, Double)].head()._2
    assert(a == b)
  }

  test("kmvDistinct ignores duplicates (cardinality, not count)") {
    val dup = (1L to 100L).flatMap(i => Seq(("g", i), ("g", i), ("g", i)))
      .toDF("g", "v")
    val noDup = (1L to 100L).map(i => ("g", i)).toDF("g", "v")
    val a = SketchOps.kmvDistinct(dup, "g", "v", 32).as[(String, Double)].head()._2
    val b = SketchOps.kmvDistinct(noDup, "g", "v", 32).as[(String, Double)].head()._2
    assert(a == b)
  }

  test("kmv partial-aggregates: estimate is invariant to partitioning") {
    val df = (1L to 3000L).map(i => ("g", i)).toDF("g", "v")
    val one = SketchOps.kmvDistinct(df.coalesce(1), "g", "v", 64)
      .as[(String, Double)].head()._2
    val many = SketchOps.kmvDistinct(df.repartition(13), "g", "v", 64)
      .as[(String, Double)].head()._2
    assert(one == many, "merge must be order/partitioning-insensitive")
  }

  test("zscore standardizes per group; zero-variance groups get 0") {
    import graft.ops.StatsOps
    val df = Seq(
      ("a", 1L, 10.0), ("a", 2L, 20.0), ("a", 3L, 30.0),
      ("b", 4L, 7.0), ("b", 5L, 7.0) // constant group
    ).toDF("g", "id", "v")
    val out = StatsOps.zscore(df, "g", $"v")
      .select($"id", $"zscore").as[(Long, Double)].collect().toMap
    // group a: mean 20, population std = sqrt(200/3)
    val std = math.sqrt(200.0 / 3.0)
    assert(math.abs(out(1L) - (-10.0 / std)) < 1e-12)
    assert(math.abs(out(2L)) < 1e-12)
    assert(math.abs(out(3L) - (10.0 / std)) < 1e-12)
    assert(out(4L) == 0.0 && out(5L) == 0.0)
    // standardized group: mean 0, population variance 1
    val zs = Seq(out(1L), out(2L), out(3L))
    assert(math.abs(zs.sum / 3) < 1e-12)
    assert(math.abs(zs.map(z => z * z).sum / 3 - 1.0) < 1e-12)
  }

  test("weightedSample keeps heavier rows at proportionally higher rates") {
    val df = (1L to 4000L).toDF("id").withColumn("w",
      when($"id" % 2 === 0, 300.0).otherwise(30.0))
    val kept = SampleOps.weightedSample(df, "id", "w", ratePerUnit = 0.002)
      .groupBy($"w").count().as[(Double, Long)].collect().toMap
    val heavy = kept.getOrElse(300.0, 0L) / 2000.0 // p = 0.6
    val light = kept.getOrElse(30.0, 0L) / 2000.0 // p = 0.06
    assert(math.abs(heavy - 0.6) < 0.05, s"heavy rate $heavy")
    assert(math.abs(light - 0.06) < 0.03, s"light rate $light")
    // determinism
    val again = SampleOps.weightedSample(df, "id", "w", 0.002).count()
    assert(again == kept.values.sum)
  }
}
