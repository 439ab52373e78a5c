package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe: validates the v3 scan-parallel replica layout +
  * split sizing on the queries the r8 30x sweep flagged (not part of
  * the engine; run via `sbt "runMain graft.tools.SplitProbe"`).
  */
object SplitProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .appName("splitprobe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.buffer.pageSize", "4m")
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.files.openCostInBytes", "64k")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftSparkExtensions.register(spark)

    val qs = Seq("q17_json_extract", "q23_langid", "q157_gopher_rules",
      "q74_scalar_subquery", "q84_multi_distinct", "q135_unpivot",
      "q128_clean_corpus", "q109_market_share")

    def run(dir: String, label: String): Unit = {
      def hygiene(): Unit = {
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        System.gc(); Thread.sleep(200)
      }
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
        println(f"$label $name%-26s min=${ts.min}%.3f")
      }
    }

    val d10 = graft.Scale10x.ensure(spark, sfDir)
    run(d10, "10x")
    val d30 = graft.Scale10x.ensure(spark, sfDir, 30)
    run(d30, "30x")
    spark.stop()
  }
}
