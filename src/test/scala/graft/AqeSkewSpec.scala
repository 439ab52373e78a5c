package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Proof for the "skewed keys → AQE skew-join" claims the scaling
  * notes lean on: build a join whose shuffle puts ~all rows in one
  * key's partition, lower the skew thresholds to sandbox scale, and
  * assert the ADAPTIVE final plan actually split the skewed partition
  * (the join marks itself `skew=true`) — while returning exactly the
  * rows the even plan returns.
  */
class AqeSkewSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("a skewed sort-merge join is split by AQE and stays correct") {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // sandbox-scale thresholds: a partition is "skewed" past 64 KB
      // and 2x the median — the production defaults are 256 MB / 5x,
      // the MECHANISM under test is the same
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16384",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val prior = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 200k rows of key 0 + 2k spread keys vs a small-but-unbroadcast
      // right side carrying every key
      val left = spark.range(0, 202000).select(
        when(col("id") < 200000, 0L).otherwise(col("id") % 97).as("k"),
        // incompressible payload that SURVIVES into the shuffle (a
        // pruned or constant pad compresses the skewed partition
        // below any threshold)
        concat(md5(col("id").cast("string")),
          md5((col("id") + 1).cast("string"))).as("pad"))
      val right = spark.range(0, 97).select(col("id").as("k"),
        (col("id") * 10).as("w"))
      val joined = left.join(right, "k").select(col("k"), col("w"), col("pad"))
      // execute THIS Dataset's plan (count() would spawn a separate
      // query execution and leave this one's adaptive plan unfinalized)
      val n = joined.collect().length
      // every left row matches exactly one right row
      assert(n == 202000, s"join lost rows: $n")
      // the FINAL adaptive plan must have split the skewed side
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark the join skewed:\n$plan")
    } finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
