package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

import graft.{Scale10x, SessionDefaults}
import graft.ops.{DedupOps, Parallelism, TextOps}
import graft.sources.ImportSource

/** Round-14 A/B for the REMAINING raw-token keyed exchanges in the
  * LSH signature/verify family (VERDICT r13 ask #2): q44's 30x probe
  * (Q44ScaleProbe) proved that a keyed exchange of raw token arrays,
  * re-read by several consumers, is an allocation-pressure GC lottery
  * — bimodal 3.4–21.2s at 30x with up to 5.2s of measured GC — and
  * the map-side-fingerprint + array_distinct-verify restructure
  * (Shape B) removed the catastrophic mode structurally. q25
  * (minhashSignatures), q26 (simhashTable) and q28 (nearDuplicates)
  * still ship shapes in or adjacent to that family; this probe runs
  * the identical A/B at 1x and 30x, interleaved, with per-run GC /
  * loadavg / shuffle accounting, so adoption is a measurement, not a
  * pattern-match:
  *
  *   q25 A "shipped" — tokenized→ensureKeyed(id) raw-token exchange,
  *         then explode+k-min aggregates (exchange-free groupBy)
  *   q25 B "mapside" — ensure(text) round-robin, tokens computed
  *         map-side, groupBy(id) partial agg — the exchange carries
  *         (id, k partial mins), never a token array
  *   q26 A "shipped" — simhashTable as declared (explode_outer above
  *         the scan, 32 sum partials through the one exchange; no
  *         raw-token exchange exists — expected "not needed")
  *   q26 B "guarded" — identical plan behind ensure(text) (spreads
  *         the md5 work when the scan arrives single-partition)
  *   q28 A "shipped" — nearDuplicates' shared tokenized frame: ONE
  *         keyed raw-token exchange read by three consumers
  *         (signature branch + both verify joins) — exactly the
  *         pre-r13 q44 shape
  *   q28 B "split"   — signatures from map-side tokens (partial-agg
  *         exchange), verify joins on an ensureKeyed
  *         array_distinct-token frame — the adopted q44 Shape B
  *
  * All variants of a query must emit identical rows (asserted per
  * factor). Run: sbt "runMain graft.tools.DedupScaleProbe [factors]".
  */
object DedupScaleProbe {

  def main(args: Array[String]): Unit = {
    val sf = "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SessionDefaults(SparkSession.builder()
        .master(s"local[$cpus]"), cores = cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftSparkExtensions.register(spark)

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
        .select(col("doc_id").as("id"), col("text"))

    // ---------- q25: minhash signatures (k=4, as the q-row dials) ----------
    // A: the shipped tokenized() shape — raw tokens through the keyed
    // exchange (kept inline so the A/B stays re-runnable post-adoption)
    def q25A(dir: String): DataFrame =
      sigString(DedupOps.minhashSignaturesOfTokens(
        Parallelism.ensureKeyed(
          docs(dir).select(col("id"), TextOps.tokens(col("text")).as("_t")),
          col("id")),
        k = 4))
    // B: text through a round-robin exchange, tokens map-side — the
    // groupBy(id) partial agg is what crosses the wire
    def q25B(dir: String): DataFrame =
      sigString(DedupOps.minhashSignaturesOfTokens(
        Parallelism.ensure(docs(dir))
          .select(col("id"), TextOps.tokens(col("text")).as("_t")),
        k = 4))
    def sigString(sigs: DataFrame): DataFrame =
      sigs.select(col("id").as("doc_id"),
          concat_ws("|", transform(col("sig"), v => v.cast("string"))).as("sig"))
        .orderBy(col("doc_id"))

    // ---------- q26: simhash table ----------
    def q26A(dir: String): DataFrame =
      DedupOps.simhashTable(docs(dir), "id", "text")
        .select(col("id").as("doc_id"), col("simhash")).orderBy(col("doc_id"))
    def q26B(dir: String): DataFrame =
      DedupOps.simhashTable(Parallelism.ensure(docs(dir)), "id", "text")
        .select(col("id").as("doc_id"), col("simhash")).orderBy(col("doc_id"))

    // ---------- q28: LSH near-duplicates (threshold 0.0, the q-row dial) ----------
    // A: the shipped shared-raw-token-exchange shape (nearDuplicates
    // as of r13; inlined for post-adoption re-runs)
    def q28A(dir: String): DataFrame = {
      val tok = Parallelism.ensureKeyed(
        docs(dir).select(col("id"), TextOps.tokens(col("text")).as("_t")),
        col("id"))
      val pairs = DedupOps.lshCandidatePairsOfTokens(tok, 4, 4, 3, 0)
      verify(pairs, tok.select(col("id"), array_distinct(col("_t")).as("toks")))
    }
    // B: q44's adopted split — signatures from map-side tokens,
    // verify exchange carries array_distinct tokens only
    def q28B(dir: String): DataFrame = {
      val base = Parallelism.ensure(docs(dir))
      val pairs = DedupOps.lshCandidatePairsOfTokens(
        base.select(col("id"), TextOps.tokens(col("text")).as("_t")),
        4, 4, 3, 0)
      val toks = Parallelism.ensureKeyed(
        base.select(col("id"),
          array_distinct(TextOps.tokens(col("text"))).as("toks")),
        col("id"))
      verify(pairs, toks)
    }
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

    def hygiene(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
      Thread.sleep(300)
    }
    def time(df: => DataFrame): (Double, Long, Long) = {
      shufRead.set(0); shufWrite.set(0)
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // listener events drain asynchronously
      (dt, shufRead.get, shufWrite.get)
    }
    def gcMillis(): Long =
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .stream.mapToLong(_.getCollectionTime).sum
    def loadavg(): Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .getSystemLoadAverage

    val queries: Seq[(String, String => DataFrame, String => DataFrame)] = Seq(
      ("q25", q25A _, q25B _),
      ("q26", q26A _, q26B _),
      ("q28", q28A _, q28B _))

    val factors = if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(1, 30)
    factors.foreach { factor =>
      val dir = Scale10x.ensure(spark, sf, factor)
      queries.foreach { case (qn, vA, vB) =>
        val ca = vA(dir).count(); val cb = vB(dir).count()
        println(s"$qn ${factor}x rows A=$ca B=$cb")
        require(ca == cb, s"$qn variant outputs differ")
        hygiene()
        val mb = 1024.0 * 1024.0
        val results = collection.mutable.Map[String,
          collection.mutable.ArrayBuffer[(Double, Long, Long, Long, Double)]]()
        (1 to 5).foreach { _ =>
          Seq("A", "B").foreach { v =>
            val la = loadavg()
            val gc0 = gcMillis()
            val r = if (v == "A") time(vA(dir)) else time(vB(dir))
            val gc = gcMillis() - gc0
            results.getOrElseUpdate(v, collection.mutable.ArrayBuffer())
              .append((r._1, r._2, r._3, gc, la))
            hygiene()
          }
        }
        Seq("A", "B").foreach { v =>
          val rs = results(v)
          val ts = rs.map(_._1).sorted
          println(f"$qn ${factor}x $v runs=${
            rs.map(r => f"${r._1}%.2f").mkString(",")} min=${ts.head}%.2f " +
            f"med=${ts(ts.size / 2)}%.2f max=${ts.last}%.2f gcMs=${
            rs.map(_._4).mkString(",")} loadavg=${
            rs.map(r => f"${r._5}%.1f").mkString(",")} shufRead=${
            rs.map(r => f"${r._2 / mb}%.0f").mkString(",")}MB shufWrite=${
            rs.head._3 / mb}%.0fMB")
        }
      }
    }
    spark.stop()
  }
}
