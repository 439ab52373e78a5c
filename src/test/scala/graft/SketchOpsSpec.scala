package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{SampleOps, SketchOps, StatsOps}

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

  test("winsorize clamps at exact interpolated percentiles") {
    import graft.ops.StatsOps
    val df = (1L to 20L).map(i => ("a", i)).toDF("g", "v")
    val out = StatsOps.winsorize(df, "g", $"v", 0.05, 0.95)
      .as[(String, Double, Double, Double, Double)].head()
    // sorted 1..20: p05 at pos 0.95 -> 1.95; median 10.5; p95 -> 19.05
    // (compare with tolerance: interpolation is floating-point)
    assert(math.abs(out._2 - 1.95) < 1e-12 && out._3 == 10.5 &&
      math.abs(out._4 - 19.05) < 1e-12)
    // clamped sum: 1.95 + (2..19 = 189) + 19.05 = 210 -> mean 10.5
    assert(math.abs(out._5 - 10.5) < 1e-6)
  }

  test("madOutliers: hand-computed MAD scores; zero-MAD group never flags") {
    import graft.ops.StatsOps
    // group a: 1,2,3,4,100 -> median 3, residuals 2,1,0,1,97 -> MAD 1
    // group b: 5,5,5,9 -> median 5, residuals 0,0,0,4 -> MAD 0 (degenerate)
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0), ("a", 100.0),
      ("b", 5.0), ("b", 5.0), ("b", 5.0), ("b", 9.0))
      .toDF("g", "v")
    val got = StatsOps.madOutliers(df, "g", $"v", k = 3.5)
      .select($"g", $"v", $"score", $"is_outlier")
      .as[(String, Double, Option[Double], Boolean)].collect()
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val a100 = got.find(r => r._1 == "a" && r._2 == 100.0).get
    assert(a100._3.contains(r6(97.0 / 1.4826)) && a100._4,
      s"the far point must flag: $a100")
    val a1 = got.find(r => r._1 == "a" && r._2 == 1.0).get
    assert(a1._3.contains(r6(2.0 / 1.4826)) && !a1._4)
    val a3 = got.find(r => r._1 == "a" && r._2 == 3.0).get
    assert(a3._3.contains(0.0) && !a3._4, "the median itself scores 0")
    // zero MAD -> NULL scores, never flagged (try_divide semantics)
    assert(got.filter(_._1 == "b").forall(r => r._3.isEmpty && !r._4),
      "degenerate group must not flag anything")
  }

  test("moments: hand-computed skewness/kurtosis; partitioning-invariant") {
    import graft.ops.StatsOps
    val df = Seq(("g", 1L), ("g", 2L), ("g", 3L), ("g", 4L), ("g", 10L))
      .toDF("g", "v")
    val out = StatsOps.moments(df, "g", $"v")
      .as[(String, Long, Double, Double, Double, Double)].head()
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // deviations (-3,-2,-1,0,6): m2=10, m3=36, m4=278.8
    assert(out._2 == 5L && out._3 == 4.0 && out._4 == 10.0)
    assert(out._5 == r6(36.0 / (10.0 * math.sqrt(10.0))))
    assert(out._6 == r6(278.8 / 100.0 - 3.0))
    // decimal power sums: identical from any partitioning
    val one = StatsOps.moments(df.coalesce(1), "g", $"v").collect().toSeq
    val many = StatsOps.moments(df.repartition(7), "g", $"v").collect().toSeq
    assert(one == many)
  }

  test("pearson: native estimator agrees with the decimal-exact twin; degenerate groups are null") {
    import graft.ops.StatsOps
    // y = 2x + noise-free within group a (corr 1); anti-correlated in
    // b (corr -1); constant in c (zero variance -> null/NaN)
    val df = Seq(
      ("a", 1.0, 2.0), ("a", 2.0, 4.0), ("a", 3.0, 6.0),
      ("b", 1.0, 9.0), ("b", 2.0, 6.0), ("b", 3.0, 3.0),
      ("c", 1.0, 5.0), ("c", 2.0, 5.0)).toDF("g", "x", "y")
    def collectBy(out: org.apache.spark.sql.DataFrame) =
      out.select($"g", round($"corr", 9).as("c")).as[(String, java.lang.Double)]
        .collect().toMap
    val native = collectBy(StatsOps.pearson(df, "g", $"x", $"y"))
    val exact = collectBy(StatsOps.pearsonExact(df, "g", $"x", $"y"))
    assert(native("a") == 1.0 && native("b") == -1.0)
    assert(exact("a") == 1.0 && exact("b") == -1.0)
    // zero variance: both surface "undefined", not a fabricated number
    assert(native("c") == null || native("c").isNaN)
    assert(exact("c") == null || exact("c").isNaN)
    // the exact twin is partitioning-invariant bit-for-bit
    val p1 = StatsOps.pearsonExact(df.coalesce(1), "g", $"x", $"y").collect().toSeq
    val p7 = StatsOps.pearsonExact(df.repartition(7), "g", $"x", $"y").collect().toSeq
    assert(p1.toSet == p7.toSet)
  }

  test("heavyHitters: exact freq > n/k set under skew, any partitioning") {
    // 1000 values: a×400, b×300, c×60, plus 240 distinct singletons;
    // k=10 -> threshold 100 -> exactly {a, b} (c and the long tail
    // must be pruned by the exact re-count even if MG kept them)
    val rows = Seq.fill(400)("a") ++ Seq.fill(300)("b") ++ Seq.fill(60)("c") ++
      (1 to 240).map(i => s"x$i")
    val df = rows.toDF("v")
    val expected = Set(("a", 400L), ("b", 300L))
    for (parts <- Seq(1, 7, 32)) {
      val got = SketchOps.heavyHitters(df.repartition(parts), "v", 10)
        .as[(String, Long)].collect().toSet
      assert(got == expected, s"parts=$parts")
    }
    // below-threshold-only data: empty result, no spurious hitters
    val uniform = (1 to 500).map(i => s"u${i % 100}").toDF("v")
    assert(SketchOps.heavyHitters(uniform, "v", 50).isEmpty)
  }

  test("gini: zero for equal values, hand-computed for concentrated ones") {
    import graft.ops.StatsOps
    val eq = Seq(("a", 5L), ("a", 5L), ("a", 5L), ("a", 5L)).toDF("g", "v")
    val gotEq = StatsOps.gini(eq, "g", $"v").as[(String, Long, Double)].head()
    assert(gotEq == (("a", 4L, 0.0)))
    // 0,0,0,10: siw = 4*10 = 40, sx = 10 -> 2*40/(4*10) - 5/4 = 0.75
    val conc = Seq(("b", 0L), ("b", 0L), ("b", 0L), ("b", 10L)).toDF("g", "v")
    val gotC = StatsOps.gini(conc, "g", $"v").as[(String, Long, Double)].head()
    assert(gotC == (("b", 4L, 0.75)))
  }

  test("globalRank matches an oracle sort; ntileOfRank matches SQL ntile") {
    import graft.ops.StatsOps
    // values deliberately unsorted + duplicated (tiebreak on id)
    val df = (1L to 997L).toDF("id")
      .withColumn("v", ($"id" * 37L) % 100L)
    val (ranked, n) = StatsOps.globalRank(df, "rnk", $"v", $"id")
    assert(n == 997L)
    val got = ranked.orderBy($"rnk").select($"v", $"id").as[(Long, Long)]
      .collect().toSeq
    val want = df.select($"v", $"id").as[(Long, Long)]
      .collect().toSeq.sortBy(identity)
    assert(got == want, "rank order must equal the total sort order")
    // ranks are exactly 1..n with no gaps or repeats
    val ranks = ranked.select($"rnk").as[Long].collect().sorted.toSeq
    assert(ranks == (1L to 997L))
    // ntile distribution: 997 = 7 buckets of 100 + 3 of 99 over k=10
    val tiles = ranked
      .select(StatsOps.ntileOfRank($"rnk", n, 10).as("t")).groupBy($"t")
      .count().as[(Int, Long)].collect().toMap
    assert((1 to 7).forall(tiles(_) == 100L) && (8 to 10).forall(tiles(_) == 99L))
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

  test("embeddingCovariance matches a hand-computed 2x2 matrix") {
    // x = (1,2,3,4), y = (2,4,6,8): var(x)=5/3, cov=10/3, var(y)=20/3
    val df = Seq(
      Seq(1.0f, 2.0f), Seq(2.0f, 4.0f), Seq(3.0f, 6.0f), Seq(4.0f, 8.0f))
      .toDF("embedding")
    val got = StatsOps.embeddingCovariance(df, "embedding")
      .as[(Int, Int, Double)].collect().toSet
    assert(got == Set(
      (0, 0, 1.666667), (0, 1, 3.333333), (1, 1, 6.666667)))
    // bit-equal under repartitioning (decimal sums)
    val got7 = StatsOps.embeddingCovariance(df.repartition(7), "embedding")
      .as[(Int, Int, Double)].collect().toSet
    assert(got7 == got)
  }

  test("pcaProject recovers the dominant axis of correlated 2D data") {
    // points near the y=x line: PC1 ≈ (1,1)/√2, PC2 ≈ (1,-1)/√2
    val pts = (0 until 200).map { i =>
      val base = (i % 41).toFloat
      (i.toLong, Seq(base + (i % 3) * 0.1f, base - (i % 5) * 0.1f))
    }
    val df = pts.toDF("id", "embedding")
    val out = StatsOps.pcaProject(df, "id", "embedding", k = 2)
      .as[(Long, Seq[Double])].collect().toMap
    assert(out.size == 200)
    // variance along PC1 must dominate PC2 by the data's anisotropy
    def variance(xs: Seq[Double]) = {
      val m = xs.sum / xs.size
      xs.map(v => (v - m) * (v - m)).sum / (xs.size - 1)
    }
    val v1 = variance(out.values.map(_.head).toSeq)
    val v2 = variance(out.values.map(_(1)).toSeq)
    assert(v1 > 50 * v2, s"PC1 var $v1 should dominate PC2 var $v2")
    // deterministic across partitionings
    val again = StatsOps.pcaProject(df.repartition(9), "id", "embedding", 2)
      .as[(Long, Seq[Double])].collect().toMap
    assert(again == out)
  }
}
