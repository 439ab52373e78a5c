package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftSparkExtensions

/** LevenshteinThresholdRewrite: thresholded edit-distance comparisons
  * must take Spark's early-exit banded form without a call-site
  * change, bit-for-bit equal to the full computation; look-alike
  * shapes must be left alone.
  */
class LevenshteinRewriteSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // parquet-backed so the optimizer can't constant-fold the filter
  // into a LocalRelation (which would erase the shape under test)
  private lazy val pairs = {
    GraftSparkExtensions.register(spark)
    val dir = java.nio.file.Files.createTempDirectory("graft-lev").toString
    Seq(
      ("kitten", "sitting"), ("flaw", "lawn"), ("graft", "graft"),
      ("spark", "sparkle"), ("abcdefgh", "zyxwvuts"), ("", "abc"),
      ("same", "same"), ("a", "b"), (null, "x"), ("y", null))
      .toDF("a", "b").write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  test("lev(a,b) <= k rewrites to the banded form and matches the full filter") {
    val thresholded = pairs.where(levenshtein($"a", $"b") <= 2)
    val opt = thresholded.queryExecution.optimizedPlan.toString
    assert(opt.contains("levenshtein(a#") && opt.contains(", Some(2)) >= 0"),
      s"expected banded levenshtein in:\n$opt")
    // reference rows computed WITHOUT the comparison shape the rule
    // matches (distance projected, filtered outside the expression)
    val expected = pairs.select($"a", $"b", levenshtein($"a", $"b").as("d"))
      .collect().filter(r => !r.isNullAt(2) && r.getInt(2) <= 2)
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(thresholded.as[(String, String)].collect().toSet == expected)
    assert(expected.nonEmpty)
  }

  test("strict < and reversed comparisons rewrite; k=0/1 and non-literal do not") {
    val strict = pairs.where(levenshtein($"a", $"b") < 3)
    assert(strict.queryExecution.optimizedPlan.toString.contains(", Some(2)) >= 0"))
    val reversed = pairs.where(lit(2) >= levenshtein($"a", $"b"))
    assert(reversed.queryExecution.optimizedPlan.toString.contains(", Some(2)) >= 0"))

    // k = 0 (equality) and a column threshold must stay the full form
    val zero = pairs.where(levenshtein($"a", $"b") <= 0)
    assert(!zero.queryExecution.optimizedPlan.toString.contains(">= 0"))
    val colK = pairs.withColumn("k", length($"a") - length($"a") + 1)
      .where(levenshtein($"a", $"b") <= $"k")
    assert(!colK.queryExecution.optimizedPlan.toString.contains(", Some(1)) >= 0"))
    // > stays untouched (we only rewrite the keep-close direction)
    val above = pairs.where(levenshtein($"a", $"b") > 2)
    assert(!above.queryExecution.optimizedPlan.toString.contains(", Some(2)) >= 0"))
    assert(above.count() > 0)
  }
}
