package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{SampleOps, TextOps}

/** Decade probe for q164_token_budget's prefix cut (not part of the
  * engine; `sbt "runMain graft.tools.TokenBudgetProbe"`). Times the
  * declared q164 spelling at the bench's 1x-32file and 10x levels
  * with the Bench warm/hygiene protocol, so the r15 fix (two-phase
  * partial sums replacing the per-stratum single-task window) reads
  * in the same units as BENCH_DETAIL's ratio table.
  */
object TokenBudgetProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.SessionDefaults(SparkSession.builder()
        .master(s"local[$cpus]")
        .appName("token-budget-probe"), cores = cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftSparkExtensions.register(spark)
    spark.read.parquet("/root/testdata/sf0.1/nation.parquet")
      .groupBy("n_regionkey").count().count()

    def q164(dir: String) =
      SampleOps.tokenBudgetSample(
          spark.read.parquet(s"$dir/documents.parquet")
            .select(col("doc_id"), col("lang"),
              TextOps.tokenCount(col("text")).cast("long").as("w")),
          "doc_id", "lang", "w", budget = 20000L)
        .select(col("doc_id"), col("lang"), col("w"))
        .orderBy(col("doc_id"))

    def hygiene(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc(); Thread.sleep(200)
    }
    def once(dir: String): Double = {
      val t0 = System.nanoTime()
      q164(dir).write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    def level(name: String, dir: String): Double = {
      once(dir); hygiene() // warm
      val ts = (1 to 3).map { _ => val t = once(dir); hygiene(); t }
      println(f"$name%-10s min=${ts.min}%.3f runs=${ts.map(t => f"$t%.2f").mkString(",")}")
      ts.min
    }
    val t1 = level("1x_32file", "/tmp/graft_1x_sf0.1_v4")
    val t10 = level("10x", "/tmp/graft_10x_sf0.1_v4")
    println(f"ratio_10x=${t10 / t1}%.2f")
    spark.stop()
  }
}
