package graft.tools

import org.apache.spark.sql.SparkSession

import graft.{Scale10x, SessionDefaults}

/** Builds (or reuses) the N× replica of a testdata directory and
  * prints its path — the standalone form of the sweep's
  * Scale10x.ensure step, so scale-decade correctness runs
  * (tools/correctness_10x.py) can target a replica without running a
  * bench. Usage: runMain graft.tools.EnsureReplica [sfDir] [factor]. */
object EnsureReplica {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val factor = if (args.length > 1) args(1).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SessionDefaults(SparkSession.builder()
        .master(s"local[$cpus]"), cores = cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println("replica: " + Scale10x.ensure(spark, sfDir, factor))
    spark.stop()
  }
}
