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

  test("tokenBudgetSample water-fills: tail strata kept whole, head capped at the level") {
    // strata token totals: a=100, b=300, c=2000; budget 900
    // k=0: share 900/3=300, a(100)<=300 -> whole, rem 800
    // k=1: share 800/2=400, b(300)<=400 -> whole, rem 500
    // k=2: share 500, c(2000)>500 -> level 500, c capped at 500
    val df = (
      (1L to 10L).map(i => (i, "a", 10L)) ++
      (11L to 40L).map(i => (i, "b", 10L)) ++
      (41L to 240L).map(i => (i, "c", 10L))
    ).toDF("id", "stratum", "w")
    val kept = SampleOps.tokenBudgetSample(df, "id", "stratum", "w", 900L)
      .groupBy("stratum").agg(sum("w").as("w")).as[(String, Long)]
      .collect().toMap
    assert(kept == Map("a" -> 100L, "b" -> 300L, "c" -> 500L), s"got $kept")
  }

  test("tokenBudgetSample: budget over total keeps everything; zero keeps nothing") {
    val df = ((1L to 5L).map(i => (i, "a", 7L)) ++
      (6L to 9L).map(i => (i, "b", 3L))).toDF("id", "stratum", "w")
    assert(SampleOps.tokenBudgetSample(df, "id", "stratum", "w", 1000L)
      .count() == 9)
    assert(SampleOps.tokenBudgetSample(df, "id", "stratum", "w", 0L)
      .count() == 0)
    assert(SampleOps.tokenBudgetSample(df.where(lit(false)), "id", "stratum",
      "w", 10L).count() == 0)
  }

  test("tokenBudgetSample prefix cut is deterministic and respects the budget exactly") {
    val df = (1L to 50L).map(i => (i, "x", i % 7 + 1L)).toDF("id", "stratum", "w")
    val a = SampleOps.tokenBudgetSample(df, "id", "stratum", "w", 60L)
    val b = SampleOps.tokenBudgetSample(df.repartition(17), "id", "stratum", "w", 60L)
    val idsA = a.select("id").as[Long].collect().toSet
    assert(idsA == b.select("id").as[Long].collect().toSet,
      "membership must not depend on partitioning")
    val keptW = a.agg(sum("w")).as[Long].collect().head
    assert(keptW <= 60L)
    // the cut is a prefix: adding the next hash-ordered doc would bust it
    val ordered = df.withColumn("h", md5($"id".cast("string")))
      .orderBy($"h", $"id").select("id", "w").as[(Long, Long)].collect()
    val nextW = ordered.dropWhile { case (i, _) => idsA.contains(i) }
      .headOption.map(_._2).getOrElse(0L)
    assert(nextW == 0L || keptW + nextW > 60L, "cut must be maximal")
  }

  test("mixtureSample realizes the target shares at the max feasible size") {
    // 1000 a, 300 b with target 50/50: b binds (300/.5=600), a
    // downsamples to ~300, b kept whole
    val df = ((1L to 1000L).map(i => (i, "a")) ++ (1001L to 1300L).map(i => (i, "b")))
      .toDF("id", "stratum")
    val out = SampleOps.mixtureSample(df, "id", "stratum",
        Map("a" -> 0.5, "b" -> 0.5))
      .groupBy("stratum").count().as[(String, Long)].collect().toMap
    assert(out("b") == 300L, "binding stratum must be kept whole")
    assert(math.abs(out("a") - 300L) < 60, s"a was ${out("a")}")
    // strata not in the target mixture are dropped
    val extra = df.unionByName(Seq((2000L, "junk")).toDF("id", "stratum"))
    assert(SampleOps.mixtureSample(extra, "id", "stratum", Map("a" -> 1.0))
      .where($"stratum" =!= "a").count() == 0)
  }

  test("scrubPii replaces emails, urls, digit runs; leaves clean text alone") {
    import graft.ops.TextOps
    val df = Seq(
      "write to bob.smith+x@example.co.uk today",
      "see https://a.example.com/path?q=1 for details",
      "call 12345678901 now",
      "clean text stays 123 intact"
    ).toDF("text")
    val got = df.select(TextOps.scrubPii($"text")).as[String].collect().toSeq
    assert(got == Seq(
      "write to <EMAIL> today",
      "see <URL> for details",
      "call <NUM> now",
      "clean text stays 123 intact"))
  }

  test("urlHost/registeredDomain normalize authority, port, www, userinfo") {
    import graft.ops.TextOps
    val df = Seq(
      "https://www.Example.COM:8443/path?q=1",
      "http://cdn.assets.example.org/x",
      "ftp://user:pw@files.example.net:21/pub",
      "https://example.io",
      "not a url at all"
    ).toDF("url")
    val got = df.select(
        TextOps.urlHost($"url").as("host"),
        TextOps.registeredDomain($"url").as("domain"))
      .as[(String, String)].collect().toSeq
    assert(got == Seq(
      ("example.com", "example.com"),
      ("cdn.assets.example.org", "example.org"),
      ("files.example.net", "example.net"),
      ("example.io", "example.io"),
      ("", "")))
  }

  test("sampling is a map-side filter: zero shuffles") {
    val plan = SampleOps.stratifiedSample(ids, "id", "stratum",
      Map("en" -> 0.1), default = 0.5).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hash"), s"sampling must not shuffle:\n$plan")
  }

  test("exactKPerGroup: exact count per stratum, membership invariant to partitioning") {
    val k = 7
    val a = SampleOps.exactKPerGroup(ids, "id", "stratum", k)
    val counts = a.groupBy("stratum").count().as[(String, Long)].collect().toMap
    assert(counts == Map("en" -> k.toLong, "other" -> k.toLong))
    // same rows no matter how the input is partitioned
    val b = SampleOps.exactKPerGroup(ids.repartition(13), "id", "stratum", k)
    assert(a.select("id").as[Long].collect().toSet ==
      b.select("id").as[Long].collect().toSet)
    // k larger than a stratum keeps the whole stratum (no padding)
    val tiny = ids.where($"id" <= 5) // 1 en (id=4), 4 other
    val c = SampleOps.exactKPerGroup(tiny, "id", "stratum", 3)
      .groupBy("stratum").count().as[(String, Long)].collect().toMap
    assert(c == Map("en" -> 1L, "other" -> 3L))
  }

  test("alphaSample: sqrt-temperature flattening keeps the tail whole") {
    // en:500, other:1500 -> pw 22.36/38.73, shares ~0.366/0.634; the
    // MINORITY stratum binds (500/0.366 < 1500/0.634): en is kept
    // whole and the majority downsamples toward the flattened mix
    val out = SampleOps.alphaSample(ids, "id", "stratum", alpha = 0.5)
      .groupBy("stratum").count().as[(String, Long)].collect().toMap
    assert(out("en") == 500L, "binding (minority) stratum must be kept whole")
    val expectOther = math.sqrt(1500.0) / math.sqrt(500.0) * 500.0 // ≈866
    assert(math.abs(out("other") - expectOther) / expectOther < 0.15,
      s"other kept ${out("other")}, expected ~$expectOther")
    // alpha = 1 is the natural distribution: every rate 1, nothing dropped
    assert(SampleOps.alphaSample(ids, "id", "stratum", alpha = 1.0)
      .count() == 2000L)
    // deterministic: same membership on every run
    val a = SampleOps.alphaSample(ids, "id", "stratum", 0.5)
      .select("id").as[Long].collect().toSet
    val b = SampleOps.alphaSample(ids.repartition(13), "id", "stratum", 0.5)
      .select("id").as[Long].collect().toSet
    assert(a == b)
  }

  test("profile: one row per column with exact null/distinct/min/max") {
    import graft.ops.StatsOps
    val df = Seq(
      (1L, Some("a")), (2L, Some("b")), (3L, None), (4L, Some("a"))
    ).toDF("id", "s")
    val got = StatsOps.profile(df, Seq("id", "s"))
      .as[(String, Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("id") == ("id", 4L, 0L, 4L, "1", "4"))
    // count(col) skips nulls; distinct over non-null values
    assert(got("s") == ("s", 3L, 1L, 2L, "a", "b"))
  }
}
