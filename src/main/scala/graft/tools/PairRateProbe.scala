package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe: the dedup pair emitters across decades with PAIR
  * COUNTS alongside wall time, so output growth separates from plan
  * growth. These operators are OUTPUT-BOUND — the pair list IS the
  * product, and a ratio table alone can't tell "the plan got slower"
  * from "the answer got bigger" (r9's one above-linear reading,
  * q44's 30x/10x = 3.64 on tight runs, is exactly that ambiguity).
  * The decision number is pairs+rows per second per decade: flat or
  * rising rate = the plan scales, whatever the wall-clock ratio.
  *
  * `sbt "runMain graft.tools.PairRateProbe [factors] [sfDir]"`,
  * factors comma-separated (default 10,30,100).
  */
object PairRateProbe {
  def main(args: Array[String]): Unit = {
    val factors = args.headOption.getOrElse("10,30,100")
      .split(",").map(_.trim.toInt).toSeq
    val sfDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SessionDefaultsProbe.session("pairrateprobe")
    val names = Seq("q25_minhash", "q28_near_dups", "q44_jaccard_dedup")
    names.foreach(n => require(graft.SparkEntry.queries.contains(n),
      s"PairRateProbe lists '$n' but SparkEntry.queries does not define it"))

    def hygiene(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc(); Thread.sleep(200)
    }

    factors.foreach { factor =>
      val dir = graft.Scale10x.ensure(spark, sfDir, factor)
      hygiene()
      names.foreach { name =>
        val fn = graft.SparkEntry.queries(name)
        def once(): Double = {
          val t0 = System.nanoTime()
          fn(spark, dir).write.mode("overwrite").format("noop").save()
          (System.nanoTime() - t0) / 1e9
        }
        once(); hygiene() // cold absorbs codegen
        val ts = Seq(once(), { hygiene(); once() })
        hygiene()
        // rows counted once, after timing — the count() action prunes
        // differently than the noop sink, so it never contaminates ts
        val rows = fn(spark, dir).count()
        hygiene()
        val rate = rows / ts.min
        println(f"${factor}x $name%-22s min=${ts.min}%8.3fs rows=$rows%12d " +
          f"rows_per_sec=$rate%12.0f runs=${ts.map(t => f"$t%.2f").mkString(",")}")
      }
    }
    spark.stop()
  }
}

/** Shared probe session: the bench's measured posture (SessionDefaults
  * + decoded-byte split sizing) so probe readings are comparable to
  * BENCH_DETAIL rows. */
private[tools] object SessionDefaultsProbe {
  def session(app: String): SparkSession = {
    // SessionDefaults already carries the measured split sizing
    // (maxPartitionBytes/openCostInBytes) — re-setting it here would
    // silently pin the probe to stale values if the posture moves
    val spark = graft.SessionDefaults(SparkSession.builder()
        .master("local[32]").appName(app), cores = 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftSparkExtensions.register(spark)
    spark
  }
}
