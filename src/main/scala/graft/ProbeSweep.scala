package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.SimilarityOps

/** Measurement harness for the round-13 retrieval-grade question:
  * where (if anywhere) does the two-level multi-probe family reach
  * recall@10 ≥ 0.8, and what does that operating point COST relative
  * to the single-level ANN surface at the same recall?
  *
  * Both surfaces are swept through the SAME evaluators on the SAME
  * (id, vec, cell, probe_cells) shape — `cellRecallProbe` for the
  * recall side, `probePairCost` for the cost side — so the numbers
  * are comparable by construction:
  *   - two-level: `twoLevelProbeWide` over (nprobeCoarse × nprobe)
  *   - single-level: `ivfProbe` (√n centroids) over nprobe
  *
  * Prints one JSON line per operating point:
  *   {"surface":..,"nc":N,"np":N,"recall":..,"pairs":..,"cells":..}
  * plus a header with n, the brute-force self-join pair count n², and
  * the query-sample size. Run:
  *   sbt "runMain graft.ProbeSweep /root/testdata/sf0.01"
  */
object ProbeSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SessionDefaults(SparkSession.builder()
        .master(s"local[$cpus]"), cores = cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftSparkExtensions.register(spark)
    import spark.implicits._

    val emb = graft.sources.ImportSource.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding")).localCheckpoint()
    val n = emb.count()
    val samplePred = col("id") % 10 === 0
    val nq = math.ceil(n / 10.0).toLong
    println(s"""{"n":$n,"queries":$nq,"brute_pairs":${n * n}}""")

    def evalPoint(surface: String, nc: Int, np: Int,
        assigned: org.apache.spark.sql.DataFrame): Unit = {
      val a = assigned.localCheckpoint()
      val recall = SimilarityOps.cellRecallProbe(a, "id", "vec", "cell",
          "probe_cells", samplePred, k = 10)
        .agg(avg(col("recall"))).as[Double].collect()(0)
      val costRow = SimilarityOps.probePairCost(a, "cell", "probe_cells")
        .collect()(0)
      val pairs = BigDecimal(costRow.getDecimal(1))
      val cells = costRow.getLong(0)
      println(f"""{"surface":"$surface","nc":$nc,"np":$np,""" +
        f""""recall":$recall%.4f,"pairs":$pairs,"cells":$cells}""")
      a.unpersist()
    }

    // single-level: √n centroids, the ANN store's blocking rule
    val cents = SimilarityOps.sqrtSeedCentroids(emb, "vec_id", "embedding")
    println(s"""{"single_level_centroids":${cents.size}}""")
    for (np <- Seq(1, 2, 4, 8, 12, 16, 24, 32, 48, 64)
         if np <= cents.size)
      evalPoint("single", 1, np,
        SimilarityOps.ivfProbe(emb, "vec_id", "embedding", cents, np))

    // two-level wide: coarse beam × fine probes
    for (nc <- Seq(1, 2, 4, 9); np <- Seq(4, 8, 16, 32, 64, 128))
      evalPoint("two_level", nc, np,
        SimilarityOps.twoLevelProbeWide(emb, "vec_id", "embedding",
          nprobeCoarse = nc, nprobe = np))

    spark.stop()
  }
}
