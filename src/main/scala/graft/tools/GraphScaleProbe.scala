package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.{Scale10x, SessionDefaults}
import graft.sources.ImportSource

/** Probe for the iterative-graph family's fourth-decade posture
  * (VERDICT r11 finding #1): q149's 100x/30x ratio read 5.26 vs
  * linear 3.33 with the mechanism named as the 3-iteration join's
  * pinned working set (localCheckpoint'd edges + ranks, DESERIALIZED
  * row blocks by default) outgrowing one host's memory + page cache.
  * Times the exact q149 edge build + pageRank at 30x and 100x under
  * both checkpoint storage levels (MEMORY_AND_DISK vs
  * MEMORY_AND_DISK_SER), cold + 2 warm each, so the cure is adopted
  * from measurement, not vibes.
  *
  * Run: sbt "runMain graft.tools.GraphScaleProbe" (~15 min: builds
  * the 100x replica on first use).
  */
object GraphScaleProbe {
  def main(args: Array[String]): Unit = {
    val sf = "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SessionDefaults(SparkSession.builder()
        .master(s"local[$cpus]"), cores = cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftSparkExtensions.register(spark)

    def q149(dir: String, storage: StorageLevel): DataFrame = {
      val o = ImportSource.table(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
      val l = ImportSource.table(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"))
      val cs = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("src"),
          (col("l_suppkey") + 1000000L).as("dst"))
      val edges = cs.unionByName(
        cs.select(col("dst").as("src"), col("src").as("dst")))
      graft.ops.GraphOps.pageRank(edges, iterations = 3, storage = storage)
        .orderBy(col("id"))
    }

    def hygiene(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
      Thread.sleep(300)
    }
    def time(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }

    val levels = Seq(
      "deser" -> StorageLevel.MEMORY_AND_DISK,
      "ser" -> StorageLevel.MEMORY_AND_DISK_SER)
    Seq(30, 100).foreach { factor =>
      val dir = Scale10x.ensure(spark, sf, factor)
      levels.foreach { case (name, lvl) =>
        hygiene()
        val runs = (1 to 3).map { _ =>
          val t = time(q149(dir, lvl)); hygiene(); t
        }
        println(f"q149 ${factor}x $name%-6s runs=${
          runs.map(t => f"$t%.2f").mkString(",")} min=${runs.min}%.2f")
      }
    }
    spark.stop()
  }
}
