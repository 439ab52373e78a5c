package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

import graft.{Scale10x, SessionDefaults}
import graft.ops.{DedupOps, Parallelism, TextOps}
import graft.sources.ImportSource

/** Probe for q44_jaccard_dedup's recurring 30x wobble (VERDICT r12
  * finding #4): the driver sweep read ratio 3.55 vs linear 3.0–3.33
  * under loadavg ~14 while idle runs read 2.64 — bimodal across host
  * contexts, consistent within a window, three rounds running.
  *
  * Hypothesis (the q149 shape, different tissue): the shipped plan
  * shares ONE keyed exchange of RAW token arrays across three
  * consumers — the fingerprint branch and both verify joins — so the
  * token shuffle is written once and READ THREE TIMES via
  * ReusedExchange. Under memory pressure those re-reads fall out of
  * page cache and the run lands in the slow mode; idle, they're all
  * cache hits. This probe measures the exact q44 pipeline at 30x in
  * three shapes, cold + 2 warm each, with per-variant shuffle
  * read/write bytes from a stage listener:
  *
  *   A "shipped"  — DedupOps.jaccardNearDuplicates as declared
  *   B "split"    — fingerprint computed MAP-SIDE (no keyed exchange
  *                  feeds it; the groupBy(fp) exchange carries only
  *                  (id, 32-byte fp)), verify exchange carries
  *                  array_distinct tokens only (what Jaccard needs),
  *                  read twice not three times
  *   C "sercache" — the shipped shape with the shared token frame
  *                  persisted MEMORY_AND_DISK_SER (q149's cure)
  *
  * All three must emit identical rows (asserted once per factor).
  * Run: sbt "runMain graft.tools.Q44ScaleProbe" (builds the 30x
  * replica on first use).
  */
object Q44ScaleProbe {

  def main(args: Array[String]): Unit = {
    val sf = "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SessionDefaults(SparkSession.builder()
        .master(s"local[$cpus]"), cores = cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftSparkExtensions.register(spark)

    // stage-level shuffle accounting between marks
    val shufRead = new java.util.concurrent.atomic.AtomicLong(0)
    val shufWrite = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        shufRead.addAndGet(s.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead)
        shufWrite.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      }
    })

    def docs(dir: String): DataFrame =
      ImportSource.table(spark, dir, "documents")

    // ---- variant A: the r12-and-earlier shipped shape (kept inline
    // so the A/B stays re-runnable after B's adoption into
    // DedupOps.jaccardNearDuplicates in round 13) ----
    def vA(dir: String): DataFrame = {
      val tok = Parallelism.ensureKeyed(
        docs(dir).select(col("doc_id").as("id"),
          TextOps.tokens(col("text")).as("_t")),
        col("id"))
      val fp = tok.select(col("id"),
        TextOps.minShingleFingerprintOfTokens(col("_t"), 3).as("fp"))
      val toks = tok.select(col("id"), array_distinct(col("_t")).as("toks"))
      verify(pairsOf(fp), toks)
    }

    // shared verify tail over a (id, toks[distinct]) frame
    def verify(pairs: DataFrame, toks: DataFrame): DataFrame = {
      val inter = size(array_intersect(col("toks_a"), col("toks_b"))).cast("double")
      val union = size(array_union(col("toks_a"), col("toks_b"))).cast("double")
      pairs
        .join(toks.select(col("id").as("id_a"), col("toks").as("toks_a")), "id_a")
        .join(toks.select(col("id").as("id_b"), col("toks").as("toks_b")), "id_b")
        .withColumn("jaccard",
          round(when(union === 0, 0.0).otherwise(inter / union), 6))
        .where(col("jaccard") >= 0.0)
        .select(col("id_a"), col("id_b"), col("jaccard"))
        .orderBy(col("id_a"), col("id_b"))
    }

    // probe-local copy of the pair-explode (DedupOps' is private)
    def pairsOf(fp: DataFrame): DataFrame =
      fp.groupBy(col("fp"))
        .agg(sort_array(collect_set(col("id"))).as("ids"))
        .where(size(col("ids")) > 1)
        .select(explode(transform(col("ids"), (x, i) =>
          transform(slice(col("ids"), i + 2, size(col("ids"))),
            y => struct(x.as("id_a"), y.as("id_b"))))).as("ps"))
        .select(explode(col("ps")).as("p"))
        .select(col("p.id_a"), col("p.id_b"))

    // ---- variant B: map-side fingerprint + distinct-token verify ----
    def vB(dir: String): DataFrame = {
      val base = Parallelism.ensure(
        docs(dir).select(col("doc_id").as("id"), col("text")))
      val fp = base.select(col("id"),
        TextOps.minShingleFingerprintOfTokens(
          TextOps.tokens(col("text")), 3).as("fp"))
      val toks = Parallelism.ensureKeyed(
        base.select(col("id"),
          array_distinct(TextOps.tokens(col("text"))).as("toks")),
        col("id"))
      verify(pairsOf(fp), toks)
    }

    // ---- variant C: shipped shape, shared token frame persisted SER ----
    def vC(dir: String): (DataFrame, () => Unit) = {
      val tok = Parallelism.ensureKeyed(
        docs(dir).select(col("doc_id").as("id"),
          TextOps.tokens(col("text")).as("_t")),
        col("id")).persist(StorageLevel.MEMORY_AND_DISK_SER)
      val fp = tok.select(col("id"),
        TextOps.minShingleFingerprintOfTokens(col("_t"), 3).as("fp"))
      val toks = tok.select(col("id"), array_distinct(col("_t")).as("toks"))
      (verify(pairsOf(fp), toks), () => { tok.unpersist(blocking = true); () })
    }

    def hygiene(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
      Thread.sleep(300)
    }
    def time(df: => DataFrame, cleanup: () => Unit = () => ()): (Double, Long, Long) = {
      shufRead.set(0); shufWrite.set(0)
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      val dt = (System.nanoTime() - t0) / 1e9
      cleanup()
      // listener events drain asynchronously — settle before reading
      // (listenerBus is private[spark]; a short sleep suffices for a
      // probe that only reports per-variant magnitudes)
      Thread.sleep(500)
      (dt, shufRead.get, shufWrite.get)
    }

    def gcMillis(): Long =
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .stream.mapToLong(_.getCollectionTime).sum
    def loadavg(): Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .getSystemLoadAverage

    val factors = if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(1, 30)
    factors.foreach { factor =>
      val dir = Scale10x.ensure(spark, sf, factor)
      // identical output across variants, once
      val ca = vA(dir).count(); val cb = vB(dir).count()
      val (cdf, cclean) = vC(dir); val cc = cdf.count(); cclean()
      println(s"q44 ${factor}x rows A=$ca B=$cb C=$cc")
      require(ca == cb && cb == cc, "variant outputs differ")
      hygiene()
      // INTERLEAVED rounds (A,B,C per round): weather hits all
      // variants equally instead of whichever ran last; per-run GC
      // time + loadavg separate JVM stalls from host contention
      val mb = 1024.0 * 1024.0
      val results = collection.mutable.Map[String,
        collection.mutable.ArrayBuffer[(Double, Long, Long, Long, Double)]]()
      (1 to 5).foreach { round =>
        Seq("A", "B", "C").foreach { v =>
          val la = loadavg()
          val gc0 = gcMillis()
          val r = v match {
            case "A" => time(vA(dir))
            case "B" => time(vB(dir))
            case "C" => val (df, clean) = vC(dir); time(df, clean)
          }
          val gc = gcMillis() - gc0
          results.getOrElseUpdate(v, collection.mutable.ArrayBuffer())
            .append((r._1, r._2, r._3, gc, la))
          hygiene()
        }
      }
      Seq("A", "B", "C").foreach { v =>
        val rs = results(v)
        val ts = rs.map(_._1).sorted
        println(f"q44 ${factor}x $v runs=${
          rs.map(r => f"${r._1}%.2f").mkString(",")} min=${ts.head}%.2f " +
          f"med=${ts(ts.size / 2)}%.2f gcMs=${
          rs.map(_._4).mkString(",")} loadavg=${
          rs.map(r => f"${r._5}%.1f").mkString(",")} shufRead=${
          rs.map(r => f"${r._2 / mb}%.0f").mkString(",")}MB shufWrite=${
          rs.head._3 / mb}%.0fMB")
      }
    }
    spark.stop()
  }
}
