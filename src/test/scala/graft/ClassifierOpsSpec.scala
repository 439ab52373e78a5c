package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.ClassifierOps

class ClassifierOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("nbClassify: hand-computed two-class model, zero-token prior fallback") {
    // V=2 (x, y); T_a=2, T_b=1; priors ln(1/3), ln(2/3)-ish below
    val df = Seq(
      (1L, "a", "x x"),
      (2L, "b", "y"),
      (3L, "b", "")
    ).toDF("doc_id", "lang", "text")
    val got = ClassifierOps.nbClassify(df, "doc_id", "lang", "text")
      .as[(Long, String, Double)].collect().sortBy(_._1)
    // doc 1: score(a) = ln(1/3) + 2·ln(3/4); score(b) = ln(2/3) + 2·ln(1/3)
    val s1a = math.log(1.0 / 3) + 2 * math.log(3.0 / 4)
    val s1b = math.log(2.0 / 3) + 2 * math.log(1.0 / 3)
    assert(s1a > s1b)
    assert(got(0)._2 == "a")
    assert(math.abs(got(0)._3 - BigDecimal(s1a).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 2e-6)
    // doc 2: y is b's own token; b wins
    assert(got(1)._2 == "b")
    // doc 3 has no tokens: argmax of priors alone = b (2 docs vs 1)
    assert(got(2)._2 == "b")
    val s3b = BigDecimal(math.log(2.0 / 3)).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(got(2)._3 - s3b) < 2e-6)
  }

  test("nbClassify: separable corpus recovers its own labels, invariant to partitioning") {
    val docs = (1L to 60L).map { i =>
      if (i % 2 == 0) (i, "code", "def return import class lambda yield")
      else (i, "prose", "the quick brown fox jumps over dogs")
    }
    val df = docs.toDF("doc_id", "lang", "text")
    val out = ClassifierOps.nbClassify(df, "doc_id", "lang", "text")
      .as[(Long, String, Double)].collect()
    assert(out.length == 60)
    assert(out.forall { case (id, pred, _) =>
      pred == (if (id % 2 == 0) "code" else "prose")
    })
    val out7 = ClassifierOps.nbClassify(df.repartition(7), "doc_id", "lang", "text")
      .as[(Long, String, Double)].collect()
    assert(out.toSet == out7.toSet) // scores bit-equal under any partitioning
  }
}
