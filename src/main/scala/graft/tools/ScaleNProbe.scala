package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe: replay the heavy-tail queries against an N-factor
  * organic replica (N up to Scale10x's collision-free span of 100) —
  * the manual third decade on top of the bench's committed 10x/30x
  * sweeps. `sbt "runMain graft.tools.ScaleNProbe [factor] [sfDir]"`.
  */
object ScaleNProbe {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(100)
    val sfDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .appName("scalenprobe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.buffer.pageSize", "4m")
      .config("spark.sql.files.maxPartitionBytes", "1m") // see Bench.scala
      .config("spark.sql.files.openCostInBytes", "64k")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftSparkExtensions.register(spark)

    // the bench's 30x heavy-tail set (Bench.heavy30) plus the three
    // floor-denominated top-10x-ratio rows worth a third-decade look
    val qs = Seq(
      "q17_json_extract", "q23_langid", "q28_near_dups",
      "q44_jaccard_dedup", "q47_dedup_clusters", "q55_rollup",
      "q74_scalar_subquery", "q84_multi_distinct", "q128_clean_corpus",
      "q135_unpivot", "q141_semdedup", "q149_pagerank", "q154_kmeans",
      "q170_curation_pipeline", "q171_knn_join", "q173_contrastive_pairs",
      "q174_kn_bigram", "q183_kmv_algebra",
      "q181_jl_project", "q34_embedding_neardups", "q25_minhash",
      "q158_covariance")

    def hygiene(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc(); Thread.sleep(200)
    }

    val dir = graft.Scale10x.ensure(spark, sfDir, factor)
    println(s"replica ready: $dir")
    qs.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, dir).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      once(); hygiene()
      val ts = Seq(once(), { hygiene(); once() })
      hygiene()
      println(f"${factor}x $name%-26s min=${ts.min}%.3f runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
