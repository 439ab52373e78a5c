package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: time individual SparkEntry queries without the full
  * bench sweep. `sbt "runMain graft.TimeQuery q28_near_dups [sfDir]"`.
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val names = args.filter(_.startsWith("q"))
    val sfDir = args.find(a => !a.startsWith("q"))
      .getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // production posture: graft SQL functions + optimizer rules active
    graft.functions.GraftSparkExtensions.register(spark)
    spark.read.parquet(s"$sfDir/nation.parquet").count() // warmup
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      if (sys.env.contains("SPARK_GRAFT_EXPLAIN"))
        fn(spark, sfDir).explain("formatted")
      (1 to 5).foreach { i =>
        val t0 = System.nanoTime()
        // the bench's protocol: execute the FULL plan through the noop
        // sink (count() lets the optimizer prune aggregate values and
        // the final sort — readings here must be comparable to
        // BENCH_DETAIL)
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        println(f"$name run$i: ${(System.nanoTime() - t0) / 1e9}%.2fs")
        // same hygiene as Bench: drop cached plans / checkpoint
        // blocks so runs don't contaminate each other
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        System.gc()
        Thread.sleep(200)
      }
    }
    spark.stop()
  }
}
