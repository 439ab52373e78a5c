package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class SessionDefaultsSpec extends AnyFunSuite {
  test("the shared test session carries the full measured posture") {
    // SparkTestSession builds through SessionDefaults — asserting on
    // its effective conf proves the helper lands every knob end to
    // end (builder options are package-private, and getOrCreate in a
    // shared-JVM suite would just return this session anyway)
    val spark = SparkTestSession.spark
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
    assert(spark.conf.get(
      "spark.sql.adaptive.coalescePartitions.enabled") == "true")
    assert(spark.conf.get("spark.sql.session.timeZone") == "UTC")
    assert(spark.conf.get("spark.buffer.pageSize") == "4m")
    assert(spark.conf.get("spark.sql.files.maxPartitionBytes") == "1m")
    assert(spark.conf.get("spark.sql.files.openCostInBytes") == "64k")
    assert(spark.conf.get("spark.sql.shuffle.partitions") == "4")
  }

  test("later explicit config wins over the defaults (builder is fluent)") {
    // the helper returns the same mutable builder, so a subsequent
    // .config overrides: prove it via a throwaway session-state-free
    // path — SparkConf-level application on a cloned builder
    val b = SessionDefaults(SparkSession.builder(), cores = 7)
      .config("spark.sql.files.maxPartitionBytes", "2m")
    // applying the accumulated options to a fresh SparkConf through
    // the same mechanism getOrCreate uses is private; instead assert
    // on the one surface Spark exposes: a second getOrCreate in this
    // JVM returns the EXISTING session with runtime-settable options
    // applied — maxPartitionBytes is runtime-settable, so the
    // override must be visible afterwards, then restore
    val spark = SparkTestSession.spark
    // getOrCreate applies the builder's runtime-settable options to
    // the EXISTING session — snapshot and restore everything this
    // builder touches so the shared session stays pristine
    val touched = Seq("spark.sql.shuffle.partitions",
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.session.timeZone",
      "spark.sql.files.maxPartitionBytes",
      "spark.sql.files.openCostInBytes")
    val before = touched.map(k => k -> spark.conf.get(k))
    try {
      val s2 = b.getOrCreate()
      assert(s2 eq spark, "same JVM session is reused")
      assert(s2.conf.get("spark.sql.files.maxPartitionBytes") == "2m",
        "the explicit override, not the default, is what landed")
    } finally before.foreach { case (k, v) => spark.conf.set(k, v) }
  }
}
