package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Runtime scale behaviors that the 100 TB design leans on, proven at
  * local scale: AQE splitting a skewed join partition (the mitigation
  * SCALING.md names for hot keys) and the RocksDB state store (the
  * streaming state backend whose capacity is disk-, not heap-, bound
  * — what lets a stateful query hold 100s of GB of state per
  * executor).
  */
class ScaleBehaviorSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Run `body` with SQLConf overrides, restoring previous values. */
  private def withConf(kvs: (String, String)*)(body: => Unit): Unit = {
    val old = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("AQE splits the skewed partition of a shuffle join (hot-key mitigation)") {
    // one pathological key carrying ~95% of the left side — the shape
    // that stalls a 1000-executor join on one straggler task
    val left = spark.range(0, 200000)
      .select(when($"id" % 20 =!= 0, 0L).otherwise($"id").as("k"),
        concat(lit("padpadpadpadpadpadpadpadpadpad-"), $"id").as("payload"))
    val right = spark.range(0, 2000)
      .select(($"id" % 200).as("k"), $"id".as("r"))

    withConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "100KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val joined = left.join(right, "k")
      // execute THIS queryExecution (count() would plan a separate
      // one, leaving this AdaptiveSparkPlan unfinalized)
      val n = joined.queryExecution.toRdd.count()
      // result correct AND the final adaptive plan shows the skew split:
      // hot key 0 carries 190001 left rows x 10 right rows; the cold
      // keys 20,40,...,180 (9 of them) match 10 right rows each
      assert(n == 190001L * 10 + 9 * 10)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.toLowerCase.contains("skew"),
        s"expected a skew-split shuffle read in:\n$plan")
    }
  }

  test("RocksDB state store backs a stateful stream and survives restart") {
    val dir = Files.createTempDirectory("graft-rocksdb").toString
    val ckpt = s"$dir/ckpt"
    val src = s"$dir/in"
    Files.createDirectories(java.nio.file.Paths.get(src))

    def run(): Unit = withConf(
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider") {
      val counts = spark.readStream
        .schema("k LONG, v LONG")
        .parquet(s"$src/*")
        .groupBy($"k").agg(sum($"v").as("total"))
      val q = counts.writeStream
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .format("memory").queryName("rocks_out")
        .trigger(Trigger.ProcessingTime("1 second"))
        .start()
      try q.processAllAvailable() finally q.stop()
    }

    Seq((1L, 10L), (2L, 20L)).toDF("k", "v").write.parquet(s"$src/b0")
    run()
    assert(spark.table("rocks_out").as[(Long, Long)].collect().toSet ==
      Set((1L, 10L), (2L, 20L)))

    // restart from the checkpoint with more data: RocksDB state must
    // carry the previous totals across the stop/start boundary
    Seq((1L, 5L), (3L, 7L)).toDF("k", "v").write.parquet(s"$src/b1")
    run()
    assert(spark.table("rocks_out").as[(Long, Long)].collect().toSet ==
      Set((1L, 15L), (2L, 20L), (3L, 7L)))
  }
}
