package graft.tools

import org.apache.spark.sql.functions._

/** Scratch probe: stage-by-stage timing of twoLevelAssign at a given
  * SF dir, to localize the dominant cost inside the one big job the
  * SPARK_GRAFT_JOBS profile shows.
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
    val tt = math.ceil(math.sqrt(n.toDouble)).toLong
    val k1 = math.min(math.ceil(math.sqrt(tt.toDouble)).toLong, 4096L).toInt
    println(s"n=$n t=$tt k1=$k1")
    val coarse = t("coarse collect") {
      base.withColumn("_h", md5(col("id").cast("string")))
        .orderBy(col("_h"), col("id")).limit(k1)
        .select(col("vec")).collect()
        .map(_.getSeq[Float](0).toSeq).toSeq
    }
    val assigned = base.select(col("id"), col("vec"),
      graft.ops.SimilarityOps.ivfAssign(col("vec"), coarse).as("_coarse"))
    t("coarse assign noop")(noop(assigned))
    t("coarse assign noop warm")(noop(assigned))
    val full = t("twoLevelAssign build")(
      graft.ops.SimilarityOps.twoLevelAssign(emb, "vec_id", "embedding"))
    t("full assign noop")(noop(full))
    t("full assign noop warm")(noop(full))
    val pinned = t("localCheckpoint")(full.localCheckpoint())
    t("pinned noop")(noop(pinned))
    // blocking quality: Σ c·(c−1) and the biggest cells, single- vs
    // two-level — the pair join's work is exactly this sum
    val single = base.select(col("id"),
      graft.ops.SimilarityOps.ivfAssign(col("vec"),
        graft.ops.SimilarityOps.sqrtSeedCentroids(emb, "vec_id", "embedding"))
        .as("cell"))
    // oversampled fine seeding: same two-level shape with k2 scaled
    // by m — does extra sub-seed density cure the conditional-argmax
    // skew, and at what total-cell-count (recall) cost?
    def fineWith(m: Int): org.apache.spark.sql.DataFrame = {
      val wCell = org.apache.spark.sql.expressions.Window
        .partitionBy(col("_coarse"))
      val wRank = wCell.orderBy(md5(col("id").cast("string")), col("id"))
      val norm = sqrt(aggregate(col("vec"), lit(0.0),
        (acc, x) => acc + x.cast("double") * x.cast("double")))
      val unit = when(norm === lit(0.0), transform(col("vec"), _.cast("double")))
        .otherwise(transform(col("vec"), x => x.cast("double") / norm))
      val subcents = assigned
        .withColumn("_r", row_number().over(wRank))
        .withColumn("_k2",
          ceil(count(lit(1)).over(wCell).cast("double") * m / tt.toDouble))
        .where(col("_r") <= col("_k2"))
        .select(col("_coarse"), col("_r"), unit.as("_cv"))
        .groupBy(col("_coarse"))
        .agg(transform(sort_array(collect_list(struct(col("_r"), col("_cv")))),
          x => x.getField("_cv")).as("_subcents"))
      assigned.join(broadcast(subcents), Seq("_coarse"))
        .select(col("id"),
          (col("_coarse").cast("long") * lit(4294967296L) +
            graft.functions.VectorExpressions
              .argmaxDotCells(col("vec"), col("_subcents")).cast("long"))
            .as("cell"))
    }
    for ((df, tag) <- Seq((single, "single"), (pinned, "twolevel"),
        (fineWith(2), "fine x2"), (fineWith(4), "fine x4"))) {
      val cells = df.groupBy(col("cell")).agg(count(lit(1)).as("c"))
      val top = cells.orderBy(col("c").desc).limit(5)
        .collect().map(_.getLong(1)).mkString(",")
      val nc = cells.count()
      val pairs = cells.agg(sum(col("c") * (col("c") - 1))).collect()(0).getLong(0)
      println(f"$tag%-9s pairs=$pairs%12d nCells=$nc%6d topCells=$top")
    }
    spark.stop()
  }
}
