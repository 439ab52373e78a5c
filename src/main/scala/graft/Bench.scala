package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints one JSON line for the driver.
  * Each query runs twice and reports the warm timing — the first
  * pass absorbs JVM/codegen warmup, which at this scale dwarfs the
  * queries themselves.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // session/codegen warmup on a small scan + shuffle
    spark.read.parquet(s"$sfDir/nation.parquet").groupBy("n_regionkey").count().count()

    def time(fn: => Unit): Double = {
      val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val r = try {
        time(fn(spark, sfDir).count()) // cold (codegen + plan)
        name -> time(fn(spark, sfDir).count()) // warm, reported
      } catch { case _: Throwable => name -> -1.0 }
      // Hygiene between queries, outside the timed sections: drop any
      // cached plans and force a GC so the ContextCleaner releases
      // shuffle files, broadcasts, and checkpoint blocks. Without this
      // the 84-query sweep accumulates blocks across queries and, on a
      // small driver heap, later queries GC-thrash 10-30x (BENCH_r02:
      // q47 120s vs 2s in isolation at the same heap).
      spark.catalog.clearCache()
      System.gc()
      r
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
