package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{SketchOps, TextOps}

/** TF-IDF / BM25 / inverted-index / bloom-prefilter operators. */
class IrOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def corpus = Seq(
    (1L, "spark shuffle join"),
    (2L, "spark spark spark"),
    (3L, "join join broadcast"),
    (4L, "watermark")).toDF("doc_id", "text")

  test("tfidfTopTerms hand-computed scores and ranks") {
    val got = TextOps.tfidfTopTerms(corpus, "doc_id", "text", 2)
      .orderBy("doc_id", "rank")
      .as[(Long, String, Long, Double, Int)].collect()
    def idf(df: Int) = math.log(5.0 / (1.0 + df)) + 1.0
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc 2: tf(spark)=3, df(spark)=2
    val d2 = got.filter(_._1 == 2L)
    assert(d2.toSeq == Seq((2L, "spark", 3L, r6(3 * idf(2)), 1)))
    // doc 1: all tf=1; join/spark df=2 tie broken by token, shuffle df=1 ranks first
    val d1 = got.filter(_._1 == 1L).toSeq
    assert(d1 == Seq(
      (1L, "shuffle", 1L, r6(idf(1)), 1),
      (1L, "join", 1L, r6(idf(2)), 2)))
  }

  test("bm25 ranks query-term-dense short docs first; scores hand-checked") {
    val got = TextOps.bm25(corpus, "doc_id", "text", Seq("spark", "join"))
      .as[(Long, Double)].collect().toMap
    // doc 4 has no query terms: absent
    assert(got.keySet == Set(1L, 2L, 3L))
    val avgdl = (3 + 3 + 3 + 1) / 4.0
    def idf(df: Int) = math.log(1.0 + (4.0 - df + 0.5) / (df + 0.5))
    def w(tf: Long, dl: Double, df: Int) =
      idf(df) * (tf * (1.2 + 1)) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
    val exp1 = BigDecimal(w(1, 3.0, 2) + w(1, 3.0, 2))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(got(1L) - exp1) < 1e-9, s"got ${got(1L)} want $exp1")
    // doc 1 covers both query terms; saturation keeps doc 3's
    // repeated single term below it (coverage beats repetition)
    assert(got(1L) > got(3L) && got(2L) > 0.0 && got(3L) > 0.0)
  }

  test("unigramLogProb hand-computed corpus model scores") {
    val tiny = Seq((1L, "a a b"), (2L, "a b")).toDF("doc_id", "text")
    val got = TextOps.unigramLogProb(tiny, "doc_id", "text")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    // corpus: a x3, b x2, total 5
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val d1 = (2 * math.log(3 / 5.0) + 1 * math.log(2 / 5.0)) / 3
    val d2 = (1 * math.log(3 / 5.0) + 1 * math.log(2 / 5.0)) / 2
    assert(got.toSeq == Seq((1L, 3L, r6(d1)), (2L, 2L, r6(d2))))
    // rarer vocabulary -> lower mean log-prob (the filtering signal)
    assert(got(1)._3 < got(0)._3)
  }

  test("bigramLogProb hand-computed transition model scores") {
    val tiny = Seq(
      (1L, "a b a b"), (2L, "a b c"),
      (3L, "solo"), (4L, "")).toDF("doc_id", "text")
    val got = TextOps.bigramLogProb(tiny, "doc_id", "text")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // bigrams: d1 = (a,b)x2 + (b,a); d2 = (a,b) + (b,c)
    // corpus: c(a,b)=3, c(b,a)=1, c(b,c)=1; first counts: c(a.)=3, c(b.)=2
    val d1 = (2 * math.log(3 / 3.0) + 1 * math.log(1 / 2.0)) / 3
    val d2 = (1 * math.log(3 / 3.0) + 1 * math.log(1 / 2.0)) / 2
    // docs with < 2 tokens have no bigrams and drop out
    assert(got.toSeq == Seq((1L, 3L, r6(d1)), (2L, 2L, r6(d2))))
    // unusual transitions score lower even with common vocabulary
    assert(got(1)._3 < got(0)._3)
  }

  test("tokenEntropy hand-computed; zero for constant docs") {
    val tiny = Seq((1L, "a a b"), (2L, "a b c"), (3L, "a a a"))
      .toDF("doc_id", "text")
    val got = TextOps.tokenEntropy(tiny, "doc_id", "text")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val h1 = -(2.0 / 3) * math.log(2.0 / 3) - (1.0 / 3) * math.log(1.0 / 3)
    assert(got(0) == ((1L, 3L, 2L, r6(h1))))
    assert(got(1) == ((2L, 3L, 3L, r6(math.log(3.0)))), "uniform doc: ln(k)")
    assert(got(2) == ((3L, 3L, 1L, 0.0)), "constant doc: zero entropy")
  }

  test("klDivergence hand-computed against the corpus distribution") {
    val tiny = Seq(("s1", "a a b"), ("s2", "b c")).toDF("source", "text")
    val got = TextOps.klDivergence(tiny, "source", "text")
      .as[(String, Long, Double)].collect().sortBy(_._1)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // corpus: a:2 b:2 c:1, n=5
    val k1 = (2.0 / 3) * math.log((2.0 / 3) / (2.0 / 5)) +
      (1.0 / 3) * math.log((1.0 / 3) / (2.0 / 5))
    val k2 = (1.0 / 2) * math.log((1.0 / 2) / (2.0 / 5)) +
      (1.0 / 2) * math.log((1.0 / 2) / (1.0 / 5))
    assert(got.toSeq == Seq(("s1", 3L, r6(k1)), ("s2", 2L, r6(k2))))
    assert(got.forall(_._3 > 0), "KL is non-negative, positive off-corpus-mix")
  }

  test("invertedIndex postings are sorted, distinct, capped") {
    val got = TextOps.invertedIndex(corpus, "doc_id", "text")
      .as[(String, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("spark") == ((2L, "1,2")), "df counts docs, not occurrences")
    assert(got("join") == ((2L, "1,3")))
    assert(got("watermark") == ((1L, "4")))
    val capped = TextOps.invertedIndex(corpus, "doc_id", "text", maxPostings = 1)
      .where(col("token") === "join").as[(String, Long, String)].head()
    assert(capped == (("join", 2L, "1")), "cap keeps smallest ids, df unchanged")
  }

  test("LSH hot-bucket cap drops boilerplate buckets, keeps real pairs") {
    import graft.ops.DedupOps
    // 20 identical boilerplate docs (one giant bucket) + 2 real near-dups
    val boiler = (100L to 119L).map(i => (i, "the same boilerplate text repeated here"))
    val docs = (boiler ++ Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon eta")))
      .toDF("doc_id", "text")
    val uncapped = DedupOps.lshCandidatePairs(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    val capped = DedupOps.lshCandidatePairs(docs, "doc_id", "text",
        maxBucket = 10)
      .as[(Long, Long)].collect().toSet
    assert(uncapped.exists(p => p._1 >= 100L),
      "uncapped run must produce boilerplate pairs")
    assert(capped.forall(p => p._1 < 100L && p._2 < 100L),
      s"capped run must drop the hot bucket: $capped")
    assert(capped == uncapped.filter(p => p._1 < 100L && p._2 < 100L),
      "cap must not disturb pairs from small buckets")
  }

  test("bloom filter has no false negatives and prunes most non-keys") {
    val dim = (1L to 500L).map(_ * 7L).toDF("k")
    val words = SketchOps.bloomFilterOf(dim, "k", numBits = 1 << 14, numHashes = 5)
    val probe = (1L to 20000L).toDF("x")
      .where(SketchOps.bloomMightContain(words, 5, xxhash64(col("x"))))
      .as[Long].collect().toSet
    val truth = (1L to 500L).map(_ * 7L).toSet
    assert(truth.subsetOf(probe), "bloom must never drop a real key")
    val fp = (probe -- truth).size.toDouble / (20000 - truth.size)
    assert(fp < 0.05, s"false-positive rate $fp too high for 16k bits / 500 keys")
  }

  test("bloomPrefilterJoin equals the plain join") {
    val fact = (1L to 3000L).map(i => (i % 40L, i)).toDF("fk", "payload")
    val dim = Seq(3L, 7L, 11L).toDF("dk")
    val got = SketchOps.bloomPrefilterJoin(fact, dim, "fk", "dk",
        numBits = 1 << 10, numHashes = 4)
      .select("fk", "payload", "dk")
      .as[(Long, Long, Long)].collect().toSet
    val want = fact.join(dim, col("fk") === col("dk"))
      .select("fk", "payload", "dk")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == want && got.nonEmpty)
  }

  test("bpePairCounts hand-computed adjacent pair frequencies") {
    val tiny = Seq((1L, "a b a b c"), (2L, "a b"), (3L, "x")).toDF("doc_id", "text")
    val got = TextOps.bpePairCounts(tiny, "text", 10)
      .as[(String, Long, Int)].collect().toSeq
    // pairs: doc1 -> (a b)(b a)(a b)(b c); doc2 -> (a b); doc3 -> none
    assert(got == Seq(("a b", 3L, 1), ("b a", 1L, 2), ("b c", 1L, 3)))
  }

  test("bpePairCounts top-k tie-break is count desc then pair asc") {
    val tiny = Seq((1L, "z y"), (2L, "a b"), (3L, "m n")).toDF("doc_id", "text")
    val got = TextOps.bpePairCounts(tiny, "text", 2)
      .as[(String, Long, Int)].collect().toSeq
    assert(got == Seq(("a b", 1L, 1), ("m n", 1L, 2)))
  }

  test("oovRate against the top-k vocabulary; empty docs drop out") {
    val tiny = Seq(
      (1L, "a a b rare"), (2L, "a b"), (3L, "   ")).toDF("doc_id", "text")
    // k=2 vocab = {a (3), b (2)}; doc1 has 1 OOV of 4 tokens
    val got = TextOps.oovRate(tiny, "doc_id", "text", 2)
      .select("doc_id", "n_tokens", "n_oov", "oov_rate")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 4L, 1L, 0.25), (2L, 2L, 0L, 0.0)))
  }

  test("charNgramProfile hand-computed trigrams, prefix-bounded") {
    val tiny = Seq(
      ("en", "ababa"), ("en", "aba"), ("de", "xy")).toDF("lang", "text")
    val got = TextOps.charNgramProfile(tiny, "lang", "text",
        n = 3, k = 2, prefixChars = 4)
      .as[(String, String, Long, Int)].collect().toSeq.sorted
    // en doc1 prefix "abab": aba, bab; doc2 "aba": aba
    // de doc "xy": too short, no grams
    assert(got == Seq(("en", "aba", 2L, 1), ("en", "bab", 1L, 2)))
  }
}
