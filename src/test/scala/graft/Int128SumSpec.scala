package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.functions.Int128Sum

/** The native int128 sum aggregate: exactness across the carry paths
  * two's-complement limb arithmetic has to get right, SQL null
  * semantics, and partition-order independence (merge path).
  */
class Int128SumSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def sumOf(vs: Seq[java.lang.Long], parts: Int = 7): Option[BigDecimal] = {
    import org.apache.spark.sql.Row
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(vs.map(Row(_)), math.max(parts, 1)),
      StructType(Seq(StructField("v", LongType, nullable = true))))
    val r = df.agg(Int128Sum.exactLongSum(col("v")).as("s")).head()
    if (r.isNullAt(0)) None else Some(BigDecimal(r.getDecimal(0)))
  }

  test("matches BigDecimal over values that overflow a long sum") {
    val raw: Seq[Long] = Seq.fill(40)(Long.MaxValue) ++
      Seq.fill(17)(Long.MinValue) ++ Seq[Long](1L, -1L, 0L, 123456789L)
    val vs: Seq[java.lang.Long] = raw.map(Long.box)
    val expected = raw.map(BigDecimal(_)).sum
    assert(sumOf(vs) == Some(expected))
  }

  test("negative totals and carry/borrow boundaries") {
    assert(sumOf(Seq(Long.MinValue, Long.MinValue)) ==
      Some(BigDecimal(Long.MinValue) * 2))
    assert(sumOf(Seq(-1L, 1L)) == Some(BigDecimal(0)))
    assert(sumOf(Seq(-1L, -1L)) == Some(BigDecimal(-2)))
    // low-limb wraparound in both directions
    assert(sumOf(Seq(Long.MaxValue, 1L, Long.MaxValue, 1L)) ==
      Some((BigDecimal(Long.MaxValue) + 1) * 2))
  }

  test("SQL null semantics: nulls skipped, all-null/empty is null") {
    assert(sumOf(Seq(null, 5L, null, 7L)) == Some(BigDecimal(12)))
    assert(sumOf(Seq(null, null)) == None)
    assert(sumOf(Seq.empty) == None)
    // empty input through a group-by produces no rows (not a null row)
    val n = Seq.empty[Long].toDF("v").withColumn("k", lit("a"))
      .groupBy($"k").agg(Int128Sum.exactLongSum($"v")).count()
    assert(n == 0)
  }

  test("partition-order independence (property)") {
    val gen = Gen.nonEmptyListOf(Gen.oneOf(
      Gen.chooseNum(Long.MinValue, Long.MaxValue), Gen.chooseNum(-100L, 100L)))
    val p = Prop.forAll(gen, Gen.chooseNum(1, 16)) { (vs: List[Long], parts: Int) =>
      sumOf(vs.map(Long.box), parts) == Some(vs.map(BigDecimal(_)).sum)
    }
    // each trial runs a Spark job; 30 trials keeps the suite fast
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), p)
    assert(res.passed, s"int128-partition-independence: ${res.status}")
  }

  test("exactScaledSum fixes the decimal place exactly") {
    val df = Seq(1.23, 4.56, -0.79, 1000000.01).toDF("v")
    val got = df.agg(Int128Sum.exactScaledSum($"v", 2).as("s")).head().getDecimal(0)
    assert(BigDecimal(got) == BigDecimal("1000005.01"))
    // group with no rows after filter → null (sum semantics)
    val r2 = df.where($"v" > 1e9)
      .agg(Int128Sum.exactScaledSum($"v", 2).as("s")).head()
    assert(r2.isNullAt(0))
  }

  test("registered SQL form: int128_sum over a view") {
    graft.functions.GraftSparkExtensions.register(spark)
    Seq(Long.MaxValue, Long.MaxValue, 5L).toDF("v").createOrReplaceTempView("i128_in")
    val got = spark.sql("SELECT int128_sum(v) AS s FROM i128_in").head().getDecimal(0)
    assert(BigDecimal(got) == BigDecimal(Long.MaxValue) * 2 + 5)
  }

  test("q01-shaped aggregate equals the built-in decimal formulation") {
    val li = graft.sources.ImportSource.table(spark, "/root/testdata/sf0.001", "lineitem")
    val a = li.groupBy($"l_returnflag")
      .agg(Int128Sum.exactScaledSum($"l_quantity", 2).cast(DoubleType).as("s"))
      .orderBy($"l_returnflag").collect().map(r => (r.getString(0), r.getDouble(1)))
    val b = li.groupBy($"l_returnflag")
      .agg(sum($"l_quantity".cast(DecimalType(18, 2))).cast(DoubleType).as("s"))
      .orderBy($"l_returnflag").collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(a.sameElements(b))
  }
}
