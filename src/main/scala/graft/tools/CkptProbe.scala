package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: AQE exchange reuse across aggregation consumers of one
  * checkpointed table. */
object CkptProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dt = spark.range(100000).select(
      (col("id") % 937).as("w1"), (col("id") % 31).as("w2"),
      lit(1L).as("tf")).localCheckpoint(false)
    val types = dt.groupBy(col("w1"), col("w2")).agg(sum(col("tf")).as("c"))
    val byW1 = types.groupBy(col("w1")).agg(sum(col("c")).as("cf"))
    val byW2 = types.groupBy(col("w2")).agg(count(lit(1)).as("nc"))
    val q = types.join(byW1, "w1").join(byW2, "w2")
    q.write.mode("overwrite").format("noop").save()
    q.explain()
  }
}
