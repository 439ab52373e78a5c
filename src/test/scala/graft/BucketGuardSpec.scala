package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{DedupOps, MultimodalOps}

/** The hot-bucket refusals actually refuse. Every pair-emitting
  * family guards its blocking bucket in-plan ([[DedupOps.DefaultBucketFailLimit]]):
  * a bucket of c members would emit c·(c−1)/2 pairs, so past the
  * limit the plan `raise_error`s with guidance instead of silently
  * going quadratic. Declared corpora never trip the 65,536 default —
  * which is exactly why each emitter takes an injectable `failLimit`:
  * these tests set it to 3 and prove a degenerate corpus (one shared
  * bucket) fails LOUDLY, with the op name and the cure in the error,
  * while the same corpus passes clean under the default. Without
  * this, a refactor could disarm the refusal and the suite would
  * stay green.
  */
class BucketGuardSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** raise_error surfaces wrapped in SparkException layers — collect
    * every message down the cause chain. */
  private def failureText(body: => Unit): String = {
    val t = intercept[Throwable](body)
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).mkString("\n")
  }

  test("lshCandidatePairs: a hot MinHash bucket fails loudly") {
    // five identical docs → identical signatures → one bucket of 5
    val tok = (1L to 5L).map(i => (i, Seq("the", "same", "boilerplate",
      "text", "again"))).toDF("id", "_t")
    val msg = failureText {
      DedupOps.lshCandidatePairsOfTokens(tok, bands = 2, rows = 2,
        shingleSize = 3, maxBucket = 0, failLimit = 3).collect()
    }
    assert(msg.contains("lshCandidatePairs"), msg)
    assert(msg.contains("hot bucket"), msg)
    assert(msg.contains("maxBucket"), msg)
    // same corpus under the production default: clean (10 pairs)
    assert(DedupOps.lshCandidatePairsOfTokens(tok, 2, 2, 3, 0)
      .count() == 10)
    // the drop-cap escape hatch disarms the refusal by dropping
    assert(DedupOps.lshCandidatePairsOfTokens(tok, 2, 2, 3,
      maxBucket = 3, failLimit = 3).count() == 0)
  }

  test("containmentPairs: a boilerplate blocking prefix fails loudly") {
    val docs = (1L to 5L).map(i =>
      (i, s"shared prefix tail$i end")).toDF("doc_id", "text")
    val msg = failureText {
      DedupOps.containmentPairs(docs, "doc_id", "text",
        prefixTokens = 2, failLimit = 3).collect()
    }
    assert(msg.contains("containmentPairs"), msg)
    assert(msg.contains("prefixTokens"), msg)
    // default limit: clean — and no doc pairs with itself
    val ok = DedupOps.containmentPairs(docs, "doc_id", "text",
      prefixTokens = 2).select("id_a", "id_b").as[(Long, Long)].collect()
    assert(ok.forall(p => p._1 < p._2))
  }

  test("bandedHammingPairs: a collapsed hash bucket fails loudly") {
    // all-black thumbnails: one hash value → every (band, slice)
    // bucket holds all five
    val hashes = (1L to 5L).map(i => (i, 0L)).toDF("media_id", "phash")
    val msg = failureText {
      MultimodalOps.bandedHammingPairs(hashes, "phash",
        maxHamming = 64, bands = 4, failLimit = 3).collect()
    }
    assert(msg.contains("bandedHammingPairs"), msg)
    assert(msg.contains("bands"), msg)
    // default limit: clean, all 10 unordered pairs at distance 0
    val ok = MultimodalOps.bandedHammingPairs(hashes, "phash", 64, 4)
    assert(ok.count() == 10)
  }

  test("bandedHammingPairs: a media_id with two distinct hashes never self-pairs") {
    // m1 carries two near hashes (a re-encode); m2 shares a band
    // slice with both. Pairs must be strictly id_a < id_b — the
    // grouped emitter would otherwise pair m1's two hash rows with
    // each other.
    val hashes = Seq((1L, 0L), (1L, 1L), (2L, 2L))
      .toDF("media_id", "phash")
    val pairs = MultimodalOps.bandedHammingPairs(hashes, "phash",
        maxHamming = 64, bands = 4)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect()
    assert(pairs.nonEmpty)
    assert(pairs.forall(p => p._1 < p._2),
      s"self or unordered pair leaked: ${pairs.mkString(",")}")
    // ONE row per pair even when a side carries several hashes, and
    // it reports the CLOSEST agreement: hamming(0,2)=1 beats
    // hamming(1,2)=2 for the (1,2) pair
    assert(pairs.toSeq == Seq((1L, 2L, 1)),
      s"expected one min-hamming row per pair, got ${pairs.mkString(",")}")
  }
}
