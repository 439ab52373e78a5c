package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scratch decomposition probe for q01-shaped aggregates (not part of
  * the engine; run via `sbt "runMain graft.tools.QProbe"`).
  */
object QProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .appName("qprobe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.buffer.pageSize", "4m")
      .config("spark.sql.files.maxPartitionBytes", "1m") // see Bench.scala
      .config("spark.sql.files.openCostInBytes", "64k")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = graft.sources.ImportSource.table(spark, sfDir, "lineitem")
      .where(col("l_shipdate") <= lit("1998-09-02").cast(TimestampType))
    def run(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      // call-by-name: plan construction (incl. any eager checkpoint
      // jobs) happens INSIDE the timed window, matching Bench
      def once(): Double = {
        val t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      def hygiene(): Unit = {
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        System.gc(); Thread.sleep(200)
      }
      once(); hygiene()
      val ts = Seq(once(), { hygiene(); once() }, { hygiene(); once() })
      hygiene()
      println(f"$name%-28s min=${ts.min}%.3f runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    val g = li.groupBy(col("l_returnflag"), col("l_linestatus"))
    run("count_only")(g.agg(count(lit(1)).as("n")))
    run("sum_double")(g.agg(sum(col("l_quantity")).as("a"),
      sum(col("l_extendedprice")).as("b"),
      sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("c"),
      count(lit(1)).as("n")))
    run("sum_decimal")(g.agg(
      sum(col("l_quantity").cast(DecimalType(18, 2))).cast(DoubleType).as("a"),
      sum(col("l_extendedprice").cast(DecimalType(18, 2))).cast(DoubleType).as("b"),
      round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast(DecimalType(18, 6))), 2).cast(DoubleType).as("c"),
      count(lit(1)).as("n")))
    run("sum_scaled_long")(g.agg(
      (sum(round(col("l_quantity") * 100).cast(LongType)) / 100.0).as("a"),
      (sum(round(col("l_extendedprice") * 100).cast(LongType)) / 100.0).as("b"),
      (sum(round((col("l_extendedprice") * (lit(1) - col("l_discount"))) * 1000000)
        .cast(LongType)) / 1000000.0).as("c"),
      count(lit(1)).as("n")))
    // two-stage: per-partition long partials, decimal across partials
    run("sum_twostage")({
      val s1 = li.groupBy(col("l_returnflag"), col("l_linestatus"),
          spark_partition_id().as("_pid"))
        .agg(sum(round(col("l_quantity") * 100).cast(LongType)).as("_a"),
          sum(round(col("l_extendedprice") * 100).cast(LongType)).as("_b"),
          sum(round((col("l_extendedprice") * (lit(1) - col("l_discount"))) * 1000000)
            .cast(LongType)).as("_c"),
          count(lit(1)).as("_n"))
      s1.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg((sum(col("_a").cast(DecimalType(38, 0))) / 100).cast(DoubleType).as("a"),
          (sum(col("_b").cast(DecimalType(38, 0))) / 100).cast(DoubleType).as("b"),
          round(sum(col("_c").cast(DecimalType(38, 0))) / 1000000, 2)
            .cast(DoubleType).as("c"),
          sum(col("_n")).as("n"))
    })
    // scan-only floor
    run("scan_noagg")(li.select(col("l_quantity")))

    // ---- q119 variants ----
    val docs = graft.sources.ImportSource.table(spark, sfDir, "documents")
    run("oov_current")(graft.ops.TextOps.oovRate(docs, "doc_id", "text", 100)
      .orderBy(col("doc_id")))
    run("oov_keyed_ckpt")({
      import graft.ops.TextOps
      val dt = graft.ops.Parallelism.ensureKeyed(
          docs.select(col("doc_id"), col("text")), col("doc_id"))
        .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("token"))
        .where(col("token") =!= "")
        .groupBy(col("doc_id"), col("token"))
        .agg(count(lit(1)).as("_c"))
        .localCheckpoint()
      val vocab = dt.groupBy(col("token")).agg(sum(col("_c")).as("_n"))
        .orderBy(col("_n").desc, col("token")).limit(100)
        .select(col("token"), lit(1).as("_in_vocab"))
      dt.join(broadcast(vocab), Seq("token"), "left_outer")
        .groupBy(col("doc_id"))
        .agg(sum(col("_c")).as("n_tokens"),
          sum(when(col("_in_vocab").isNull, col("_c")).otherwise(0L)).as("n_oov"))
        .withColumn("oov_rate",
          round(col("n_oov").cast("double") / col("n_tokens").cast("double"), 6))
        .orderBy(col("doc_id"))
    })
    run("oov_checkpointed")({
      import graft.ops.TextOps
      val dt = graft.ops.Parallelism.ensure(docs.select(col("doc_id"), col("text")))
        .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("token"))
        .where(col("token") =!= "")
        .groupBy(col("doc_id"), col("token"))
        .agg(count(lit(1)).as("_c"))
        .localCheckpoint()
      val vocab = dt.groupBy(col("token")).agg(sum(col("_c")).as("_n"))
        .orderBy(col("_n").desc, col("token")).limit(100)
        .select(col("token"), lit(1).as("_in_vocab"))
      dt.join(broadcast(vocab), Seq("token"), "left_outer")
        .groupBy(col("doc_id"))
        .agg(sum(col("_c")).as("n_tokens"),
          sum(when(col("_in_vocab").isNull, col("_c")).otherwise(0L)).as("n_oov"))
        .withColumn("oov_rate",
          round(col("n_oov").cast("double") / col("n_tokens").cast("double"), 6))
        .orderBy(col("doc_id"))
    })
    spark.stop()
  }
}
