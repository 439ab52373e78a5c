package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.SimilarityOps

/** Pins Example.scala to the two-level family's API surface so the
  * demo cannot silently fall behind it (the r10 round added the
  * `oversample` dial to the family; nothing made the demo keep
  * driving it). Two guards:
  *
  *  1. the family's shared dial DEFAULTS cannot drift apart across
  *     its forms (semDedup/knnJoin/contrastivePairs + the underlying
  *     twoLevelAssign) — the wrappers exist to share one blocking, so
  *     one form changing a default alone is a bug;
  *  2. Example drives each exposed dial LITERALLY at the reflected
  *     API default, so a default change forces the demo (and this
  *     spec) to move with it.
  *
  * Defaults are read via the Scala-compiler-generated
  * `method$default$N` accessors — a literal table here would itself
  * drift.
  */
class ExampleDriftSpec extends AnyFunSuite {

  private lazy val exampleSrc: String = {
    val p = Paths.get("src/main/scala/graft/Example.scala")
    assert(Files.exists(p), s"Example.scala not found at $p (cwd=${
      System.getProperty("user.dir")})")
    new String(Files.readAllBytes(p), java.nio.charset.StandardCharsets.UTF_8)
  }

  /** The compiler-generated default-value accessor for parameter
    * position `n` (1-based) of SimilarityOps method `name`. */
  private def default(name: String, n: Int): Any =
    SimilarityOps.getClass.getMethod(s"$name$$default$$$n")
      .invoke(SimilarityOps)

  // dial positions (1-based) per family form:
  //   twoLevelAssign(emb, id, vec, maxSeeds=4, oversample=5)
  //   twoLevelProbe(emb, id, vec, nprobe, maxSeeds=5, oversample=6)
  //   semDedupTwoLevel(emb, id, vec, threshold, maxSeeds=5, maxPairs=6, oversample=7)
  //   semDedupTwoLevelProbe(emb, id, vec, threshold, nprobe, maxSeeds=6, maxPairs=7, oversample=8)
  //   knnJoinTwoLevel(emb, id, vec, k, maxSeeds=5, maxPairs=6, oversample=7)
  //   knnJoinTwoLevelProbe(emb, id, vec, k, nprobe, maxSeeds=6, maxPairs=7, oversample=8)
  //   contrastivePairsTwoLevel(emb, id, vec, kPos, kNeg, posMin, negMax,
  //     maxSeeds=8, maxPairs=9, oversample=10)
  private val oversamples = Seq(
    "twoLevelAssign" -> 5, "twoLevelProbe" -> 6, "twoLevelProbeWide" -> 7,
    "semDedupTwoLevel" -> 7, "semDedupTwoLevelProbe" -> 8,
    "knnJoinTwoLevel" -> 7, "knnJoinTwoLevelProbe" -> 8,
    "contrastivePairsTwoLevel" -> 10)
  private val maxSeeds = Seq(
    "twoLevelAssign" -> 4, "twoLevelProbe" -> 5, "twoLevelProbeWide" -> 6,
    "semDedupTwoLevel" -> 5, "semDedupTwoLevelProbe" -> 6,
    "knnJoinTwoLevel" -> 5, "knnJoinTwoLevelProbe" -> 6,
    "contrastivePairsTwoLevel" -> 8)
  private val maxPairs = Seq(
    "semDedupTwoLevel" -> 6, "semDedupTwoLevelProbe" -> 7,
    "knnJoinTwoLevel" -> 6,
    "knnJoinTwoLevelProbe" -> 7, "contrastivePairsTwoLevel" -> 9)

  test("the two-level family's dial defaults agree across every form") {
    def values(dial: Seq[(String, Int)]): Seq[Any] =
      dial.map { case (m, n) => default(m, n) }
    val os = values(oversamples)
    assert(os.distinct.size == 1,
      s"oversample defaults drifted across the family: $os")
    val ms = values(maxSeeds)
    assert(ms.distinct.size == 1,
      s"maxSeeds defaults drifted across the family: $ms")
    val mp = values(maxPairs)
    assert(mp.distinct.size == 1,
      s"maxPairs defaults drifted across the family: $mp")
    // and maxPairs is the documented shared budget constant
    assert(mp.head == SimilarityOps.DefaultPairBudget)
  }

  test("Example drives the two-level family and its oversample dial at the API default") {
    val os = default("semDedupTwoLevel", 7)
    // the demo calls the two-level form …
    assert(exampleSrc.contains("semDedupTwoLevel"),
      "Example no longer drives semDedupTwoLevel")
    // … passes the dial literally at the reflected default …
    assert(exampleSrc.contains(s"oversample = $os"),
      s"Example does not drive oversample at the API default ($os); " +
        "either update the literal or this contract")
    // … and shows the dial's recall side (the cellRecall measurement
    // the q189/q190 oracles check) at BOTH endpoints of the measured
    // trade (oversample 1 vs the default)
    assert(exampleSrc.contains("cellRecall"),
      "Example no longer demonstrates the dial's recall measurement")
    assert(exampleSrc.contains("oversample = os") ||
      exampleSrc.contains("blockedRecall(1)"),
      "Example's recall demo no longer sweeps the dial")
  }

  test("Example drives the multi-probe dial across its measured curve") {
    // the r12 nprobe dial: the demo must sweep twoLevelProbe +
    // cellRecallProbe at more than one probe width, so the
    // recall-vs-cost curve (q191-q194's oracle surface) stays a
    // driven, demonstrated capability — not a dormant parameter
    assert(exampleSrc.contains("twoLevelProbe"),
      "Example no longer drives twoLevelProbe")
    assert(exampleSrc.contains("cellRecallProbe"),
      "Example no longer measures multi-probe recall")
    assert(exampleSrc.contains("probedRecall(1)") &&
      exampleSrc.contains("probedRecall(4)"),
      "Example's multi-probe demo no longer sweeps nprobe")
  }
}
