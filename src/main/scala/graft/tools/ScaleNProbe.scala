package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe: replay the heavy-tail queries against an N-factor
  * organic replica (N up to Scale10x's collision-free span of 100) —
  * the manual third decade on top of the bench's committed 10x/30x
  * sweeps. `sbt "runMain graft.tools.ScaleNProbe [factor] [sfDir]"`.
  */
object ScaleNProbe {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(100)
    val sfDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .appName("scalenprobe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.buffer.pageSize", "4m")
      .config("spark.sql.files.maxPartitionBytes", "1m") // see Bench.scala
      .config("spark.sql.files.openCostInBytes", "64k")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftSparkExtensions.register(spark)

    // the bench's 30x heavy-tail set — ONE definition (Bench.heavy30),
    // so this probe and the committed sweep can never drift; a name
    // that stops resolving fails loudly before any replica is built
    val qs = graft.Bench.heavy30
    qs.foreach(n => require(graft.SparkEntry.queries.contains(n),
      s"Bench.heavy30 lists '$n' but SparkEntry.queries does not define it"))

    def hygiene(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc(); Thread.sleep(200)
    }

    val dir = graft.Scale10x.ensure(spark, sfDir, factor)
    println(s"replica ready: $dir")
    qs.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, dir).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      once(); hygiene()
      val ts = Seq(once(), { hygiene(); once() })
      hygiene()
      println(f"${factor}x $name%-26s min=${ts.min}%.3f runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
