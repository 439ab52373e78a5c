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

    /** Adversarial twin of the q201 corpus: one 2-member cluster per
      * doc, the copy differing in two INDEPENDENT md5-uniform bit
      * positions in [0, 64) (distinct by construction), so band
      * recall has no locality to exploit — the measured number should
      * land on the uniform-bit analytic 2·(32·31)/(64·63) ≈ 0.492
      * for bands = 2. Ground truth stays the 4-band run (pigeonhole:
      * 2 dirty bits ≤ bands − 1 ⇒ complete at maxHamming 3). */
    def uniformPairHashes = {
      val base = conv(substring(md5(concat(lit("u"),
          col("doc_id").cast("string"))), 1, 15), 16, 10).cast("long")
      val b1 = conv(substring(md5(concat(lit("a"),
          col("doc_id").cast("string"))), 1, 4), 16, 10).cast("long") % 64
      // second position: uniform over the other 63, never equal to b1
      val b2 = (b1 + 1L + conv(substring(md5(concat(lit("b"),
          col("doc_id").cast("string"))), 1, 4), 16, 10).cast("long") % 63) % 64
      docs.select(col("doc_id"), base.as("base"),
          b1.as("b1"), b2.as("b2"))
        .withColumn("flipped", expr(
          "base ^ shiftleft(cast(1 as bigint), cast(b1 as int)) " +
          "^ shiftleft(cast(1 as bigint), cast(b2 as int))"))
        .select(col("doc_id"), explode(array(
          struct(lit(0L).as("m"), col("base").as("h")),
          struct(lit(1L).as("m"), col("flipped").as("h")))).as("e"))
        .select((col("doc_id") * 2 + col("e.m")).as("media_id"),
          col("e.h").as("phash"))
    }

    for ((label, hashes) <- Seq(
        ("clustered(q201)", graft.SparkEntry.syntheticMediaHashes(docs)),
        ("uniform2bit", uniformPairHashes))) {
      val n = hashes.count()
      println(s"[$label] corpus n=$n selfScalingBands=" +
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
        println(f"[$label] bands=$bands%d width=${64 / bands}%d " +
          f"pairs=$pairs%d recall=$recall%.4f elapsed=$sec%.2fs")
      }
    }
    spark.stop()
  }
}
