package graft.tools

import org.apache.spark.sql.functions._

/** Scratch probe: stage timings and blocking quality of
  * twoLevelAssign vs single-level √n seeding at a given SF dir. The
  * oversample sweep drives the PRODUCTION operator (the factor is a
  * parameter), so the pair sums measured here are the plans that
  * ship — this probe is where the ⌈2c/t⌉ default was measured
  * (SCALING.md round-10 notes).
  */
object TwoLevelProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_100x_sf0.1_v4")
    val spark = SessionDefaultsProbe.session("twolevelprobe")
    val emb = graft.sources.ImportSource.table(spark, sfDir, "embeddings")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3fs")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    val base = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val n = t("count")(base.count())
    println(s"n=$n t=${math.ceil(math.sqrt(n.toDouble)).toLong}")
    val full = graft.ops.SimilarityOps.twoLevelAssign(emb, "vec_id", "embedding")
    t("full assign noop")(noop(full))
    t("full assign noop warm")(noop(full))
    val pinned = t("localCheckpoint")(full.localCheckpoint())
    t("pinned noop")(noop(pinned))

    // blocking quality: Σ c·(c−1) and the biggest cells — the pair
    // join's work is exactly this sum — single-level vs the
    // production two-level at several fine-seed densities
    val single = base.select(col("id"),
      graft.ops.SimilarityOps.ivfAssign(col("vec"),
        graft.ops.SimilarityOps.sqrtSeedCentroids(emb, "vec_id", "embedding"))
        .as("cell"))
    val sweeps = Seq(("single", single), ("twolevel x2", pinned)) ++
      Seq(1, 4).map(m => (s"twolevel x$m", graft.ops.SimilarityOps
        .twoLevelAssign(emb, "vec_id", "embedding", oversample = m)))
    for ((tag, df) <- sweeps) {
      val cells = df.groupBy(col("cell")).agg(count(lit(1)).as("c"))
      val top = cells.orderBy(col("c").desc).limit(5)
        .collect().map(_.getLong(1)).mkString(",")
      val nc = cells.count()
      val pairs = cells.agg(sum(col("c") * (col("c") - 1))).collect()(0).getLong(0)
      println(f"$tag%-12s pairs=$pairs%12d nCells=$nc%6d topCells=$top")
    }

    // recall proxy: near-dup PAIRS each blocking actually finds at
    // the q141 threshold — finer cells block fewer candidate pairs,
    // so found-pair count is the direct measure of the oversample's
    // recall cost (single-level = the calibrated baseline)
    for (thr <- Seq(0.3, 0.9); (tag, df) <- sweeps) {
      val assignedV = base.join(df.select(col("id"), col("cell")), "id")
      val a = assignedV.alias("a"); val b = assignedV.alias("b")
      val t0 = System.nanoTime()
      val found = a.join(b,
          col("a.cell") === col("b.cell") && col("a.id") < col("b.id"))
        .where(round(graft.ops.SimilarityOps.cosine(
          col("a.vec"), col("b.vec")), 6) >= thr)
        .count()
      println(f"$tag%-12s thr=$thr dupPairsFound=$found%10d " +
        f"(${(System.nanoTime() - t0) / 1e9}%6.2fs)")
    }
    spark.stop()
  }
}
