package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the banded-Hamming band/recall trade on the real pair
  * emitter — the q191-q196 nprobe pricing discipline applied to the
  * 64-bit Hamming family's band dial (SCALING r15 declared the 2-band
  * recall analytically as P ≈ 0.49 for distance-2/3 pairs; this
  * measures it). Corpus = the q201 synthetic fingerprints (16-doc
  * clusters at Hamming distance 2, flipped bits at doc_id % 60), so
  * ground truth is the 4-band run: pigeonhole makes bands=4 complete
  * for maxHamming=3 (two flipped bits can dirty at most 2 of 4
  * slices), and every wider-band pair set is a subset of it.
  *
  * Run: sbt "runMain graft.tools.HammingRecallProbe [sfDir]"
  * Not part of the engine — measurement tool; results land in
  * SCALING.md round-15.
  */
object HammingRecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/tmp/graft_10x_sf0.1_v4"
    val spark = SparkSession.builder().master("local[32]")
      .appName("hamming-recall-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.sources.ImportSource.table(spark, sfDir, "documents")
    val hashes = graft.SparkEntry.syntheticMediaHashes(docs)
    val n = hashes.count()
    println(s"corpus n=$n selfScalingBands=" +
      graft.ops.MultimodalOps.selfScalingBands(n))
    var truth = -1L
    for (bands <- Seq(4, 2, 1)) {
      val t0 = System.nanoTime()
      val pairs = graft.ops.MultimodalOps
        .bandedHammingPairs(hashes, "phash", maxHamming = 3, bands = bands)
        .count()
      val sec = (System.nanoTime() - t0) / 1e9
      if (bands == 4) truth = pairs
      val recall = if (truth > 0) pairs.toDouble / truth else Double.NaN
      println(f"bands=$bands%d width=${64 / bands}%d pairs=$pairs%d " +
        f"recall=$recall%.4f elapsed=$sec%.2fs")
    }
    spark.stop()
  }
}
