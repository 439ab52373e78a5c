package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.ClassifierOps

class ClassifierOpsSpec extends AnyFunSuite {

  private def round12(x: Double): Double =
    BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
  private def sigmoid12(z: Double): Double =
    round12(1.0 / (1.0 + math.exp(-z)))

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

  test("logreg: two GD steps match a hand-stepped reference") {
    // doc 1 = "a a" (y=1), doc 2 = "b" (y=0); N=2, lr=0.5
    val df = Seq((1L, 1, "a a"), (2L, 0, "b")).toDF("doc_id", "y", "text")
    val got = ClassifierOps.logregTrainScore(df, "doc_id", "y", "text",
        steps = 2, lr = 0.5)
      .as[(Long, Double, Int)].collect().sortBy(_._1).toList

    // step 1: p = 0.5 everywhere -> g_a = -0.5*2, g_b = 0.5, g_bias = 0
    val wa1 = round12(0.0 - 0.5 * (-1.0 / 2)) // 0.25
    val wb1 = round12(0.0 - 0.5 * (0.5 / 2)) // -0.125
    // step 2: residuals at the step-1 weights
    val p1 = sigmoid12(0.0 + 2 * wa1)
    val p2 = sigmoid12(0.0 + 1 * wb1)
    val wa2 = round12(wa1 - 0.5 * ((p1 - 1.0) * 2 / 2))
    val wb2 = round12(wb1 - 0.5 * ((p2 - 0.0) * 1 / 2))
    val b2 = round12(0.0 - 0.5 * (((p1 - 1.0) + (p2 - 0.0)) / 2))
    def round6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val e1 = sigmoid12(b2 + 2 * wa2)
    val e2 = sigmoid12(b2 + 1 * wb2)
    assert(got == List(
      (1L, round6(e1), if (e1 >= 0.5) 1 else 0),
      (2L, round6(e2), if (e2 >= 0.5) 1 else 0)))
    assert(got.head._3 == 1 && got(1)._3 == 0) // it learned the split
  }

  test("logreg: separable corpus classified perfectly; zero-token docs get the prior") {
    val docs = (0L until 40L).map { i =>
      if (i % 2 == 0) (i, 1, "alpha beta gamma alpha")
      else (i, 0, "omega psi chi omega")
    } :+ ((40L, 1, "")) // empty doc: scores at sigmoid(bias)
    val df = docs.toDF("doc_id", "y", "text")
    val out = ClassifierOps.logregTrainScore(df, "doc_id", "y", "text",
        steps = 3, lr = 0.5)
      .as[(Long, Double, Int)].collect()
    val byId = out.map(r => r._1 -> r).toMap
    (0L until 40L).foreach { i =>
      assert(byId(i)._3 == (if (i % 2 == 0) 1 else 0), s"doc $i: ${byId(i)}")
    }
    // the empty doc's probability is a pure function of the bias —
    // strictly between the class probabilities
    assert(byId(40L)._2 > 0.0 && byId(40L)._2 < 1.0)
    // bit-equal under repartitioning (decimal sums + 12-dp rounding)
    val out9 = ClassifierOps.logregTrainScore(df.repartition(9),
        "doc_id", "y", "text", steps = 3, lr = 0.5)
      .as[(Long, Double, Int)].collect()
    assert(out.toSet == out9.toSet)
  }

  test("tokenMI: 2x2 contingency MI matches hand computation, presence not counts") {
    // 'a a a' counts once: MI is over PRESENCE. a appears only in
    // y=1 docs (perfect signal), b in one of each (zero signal), c
    // only in one y=0 doc (partial signal)
    val df = Seq(
      (1L, 1, "a a a b"), (2L, 1, "a"), (3L, 0, "b"), (4L, 0, "c"))
      .toDF("doc_id", "y", "text")
    val got = ClassifierOps.tokenMI(df, "doc_id", "y", "text", topK = 3)
      .as[(String, Long, Double)].collect().toList
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val miA = r6(0.5 * math.log(2.0) + 0.5 * math.log(2.0))
    val miC = r6(0.25 * math.log(4.0 * 1 / (1 * 2.0)) +
      0.5 * math.log(4.0 * 2 / (3 * 2.0)) +
      0.25 * math.log(4.0 * 1 / (3 * 2.0)))
    assert(got == List(("a", 2L, miA), ("c", 1L, miC), ("b", 2L, 0.0)))
  }

  // 20 docs, 44 distinct tokens: 4 frequent separating tokens (10
  // occurrences each) + 2 unique rare tokens per doc — an adversarial
  // vocab for a cap of 4 (ties at the frequency cut break to the
  // lexicographically smaller token; here the top 4 are exactly the
  // separating tokens: def < fox < import < the).
  private lazy val cappedCorpus = (1L to 20L).map { i =>
    val label = if (i % 2 == 0) "code" else "prose"
    val common = if (i % 2 == 0) "def import" else "the fox"
    (i, label, s"$common rare${i}a rare${i}b")
  }

  test("nbClassify feature cap: no-op when vocab fits, bounded model when it doesn't") {
    val df = cappedCorpus.toDF("doc_id", "lang", "text")
    val full = ClassifierOps.nbClassify(df, "doc_id", "lang", "text")
      .as[(Long, String, Double)].collect().toSet
    // cap ≥ vocab (44): bit-identical to the default
    val roomy = ClassifierOps.nbClassify(df, "doc_id", "lang", "text",
      maxFeatures = 1000).as[(Long, String, Double)].collect().toSet
    assert(full == roomy)
    // vocab (44) ≫ cap (4): the model keeps only the 4 most frequent
    // tokens; every doc still classifies, correctly (the cap kept the
    // separating features), and the capped score matches the hand
    // computation under V=4
    val tiny = ClassifierOps.nbClassify(df, "doc_id", "lang", "text",
      maxFeatures = 4).as[(Long, String, Double)].collect().sortBy(_._1)
    assert(tiny.length == 20)
    assert(tiny.forall { case (id, pred, _) =>
      pred == (if (id % 2 == 0) "code" else "prose")
    })
    // doc 2 ("def import rare2a rare2b", code): V=4, T_code=20;
    // matched def+import at ln(11/24) each, 2 out-of-cap tokens at
    // the unseen term ln(1/24), prior ln(1/2)
    val s = math.log(0.5) + 2 * math.log(11.0 / 24) + 2 * math.log(1.0 / 24)
    val s6 = BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .toDouble
    assert(math.abs(tiny(1)._3 - s6) < 2e-6, s"${tiny(1)._3} vs $s6")
  }

  test("logreg feature cap: capped training equals training on the capped vocabulary") {
    val df = cappedCorpus
      .map { case (i, l, t) => (i, if (l == "code") 1 else 0, t) }
      .toDF("doc_id", "y", "text")
    val full = ClassifierOps
      .logregTrainScore(df, "doc_id", "y", "text", steps = 2)
      .as[(Long, Double, Int)].collect().toSet
    val roomy = ClassifierOps
      .logregTrainScore(df, "doc_id", "y", "text", steps = 2,
        maxFeatures = 1000)
      .as[(Long, Double, Int)].collect().toSet
    assert(full == roomy)
    // cap = 4 ≪ vocab = 44: out-of-cap tokens never earn weights, so
    // the capped run is BIT-IDENTICAL to uncapped training on texts
    // with the rare tokens stripped — the strongest statement that
    // the cap restricts the feature space and changes nothing else
    val tiny = ClassifierOps
      .logregTrainScore(df, "doc_id", "y", "text", steps = 2,
        maxFeatures = 4)
      .as[(Long, Double, Int)].collect().toSet
    val strippedDf = cappedCorpus
      .map { case (i, l, _) =>
        (i, if (l == "code") 1 else 0,
          if (l == "code") "def import" else "the fox")
      }
      .toDF("doc_id", "y", "text")
    val stripped = ClassifierOps
      .logregTrainScore(strippedDf, "doc_id", "y", "text", steps = 2)
      .as[(Long, Double, Int)].collect().toSet
    assert(tiny == stripped)
    assert(tiny.size == 20)
  }

  test("evalReport: hand-computed confusion, union class set, null zero-denominators") {
    import spark.implicits._
    // gold en,en,en,de / pred en,en,de,xx:
    //  en: n_true 3, n_pred 2, tp 2 -> p=1.0? no: tp(en)=2, n_pred(en)=2 -> p=1.0, r=2/3
    //  de: n_true 1, n_pred 1, tp 0 -> p=0, r=0, f1 null (p+r=0)
    //  xx: predicted only -> n_true 0, recall null
    val df = Seq(("en", "en"), ("en", "en"), ("en", "de"), ("de", "xx"))
      .toDF("label", "pred")
    val got = ClassifierOps.evalReport(df, "label", "pred")
      .orderBy("cls")
      .as[(String, Long, Long, Long, Option[Double], Option[Double], Option[Double])]
      .collect().toList
    val r23 = BigDecimal(2.0 / 3).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .toDouble
    val f1en = BigDecimal(2.0 * 1.0 * r23 / (1.0 + r23))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == List(
      ("de", 1L, 1L, 0L, Some(0.0), Some(0.0), None),
      ("en", 3L, 2L, 2L, Some(1.0), Some(r23), Some(f1en)),
      ("xx", 0L, 1L, 0L, Some(0.0), None, None)))
  }
}
