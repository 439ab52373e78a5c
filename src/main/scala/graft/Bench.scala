package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints one JSON line for the driver.
  * Each query runs twice and reports the warm timing — the first
  * pass absorbs JVM/codegen warmup, which at this scale dwarfs the
  * queries themselves.
  *
  * The driver captures only the LAST ~2000 chars of output
  * (BENCH_r01/r02 both show a truncated, unparseable tail), so the
  * stdout line carries the total plus a fixed headline subset, and
  * the full per-query map goes to BENCH_DETAIL.json next to the
  * build instead of stdout.
  */
object Bench {
  /** Representative subset kept small enough that the one-line JSON
    * survives a 2000-char tail capture: the flagship aggregate /
    * window / join shapes plus every historically slow query. */
  private val headline = Seq(
    "q01_agg", "q04_latest_row", "q28_near_dups", "q31_tumbling_window",
    "q35_ship_priority", "q44_jaccard_dedup", "q47_dedup_clusters",
    "q53_local_supplier_volume", "q60_zscore", "q63_tfidf", "q64_bm25",
    "q69_bloom_join", "q109_market_share", "q114_important_parts",
    "q125_boilerplate", "q134_asof_native")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // SessionDefaults carries the measured posture — page sizing,
    // AQE, and the split-by-DECODED-bytes rule whose absence made
    // whole map-heavy scans run as one task (see its scaladoc and
    // SCALING.md round-8 notes)
    val spark = SessionDefaults(SparkSession.builder()
        .master(s"local[$cpus]")
        .appName("graft-bench"), cores = cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // production posture: graft SQL functions + optimizer rules active
    graft.functions.GraftSparkExtensions.register(spark)

    // session/codegen warmup on a small scan + shuffle
    spark.read.parquet(s"$sfDir/nation.parquet").groupBy("n_regionkey").count().count()

    def time(fn: => Unit): Double = {
      val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
    }
    // Execute via the noop datasource: the full plan runs (scan →
    // transforms → final sort) in ONE job with a zero-cost sink.
    // `df.count()` instead APPENDS a two-stage global aggregation
    // (partial + exchange + final) to every query — pure harness
    // overhead that at 138 queries dominates the total.
    def run(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def hygiene(): Unit = {
      spark.catalog.clearCache()
      // localCheckpoint blocks are freed by their owners with
      // blocking=false — the asynchronous removal otherwise lands in
      // the NEXT query's timed window (q47's cleanup was billed to
      // q48, 1.1s -> 4.6s in sweep context). Finish the removals
      // synchronously between queries.
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
      // the gc enqueues ContextCleaner work (broadcast/shuffle/RDD
      // removals) that the cleaner thread processes ASYNCHRONOUSLY —
      // without a settle pause it competes with the next timed window
      // (q48 billed 2-3s of q47's cleanup even with the blocking
      // unpersist above). ~200ms drains it; untimed, so it costs
      // sweep wall-clock only.
      Thread.sleep(200)
    }
    // When the 10x sweep will run, every 1x reading is a RATIO
    // DENOMINATOR: the r7 sweep published 25x and 70x for the same
    // ~26s 10x reading because a 0.39s-vs-1.0s denominator swing slid
    // under the old skip-rerun thresholds. With the sweep on, take
    // min-of-3 for every query regardless of magnitude; without it
    // (dev iteration) keep the threshold short-circuits.
    val scale10 = sys.env.getOrElse("SPARK_GRAFT_SCALE10", "1") != "0"
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val r = try {
        time(run(fn(spark, sfDir))) // cold (codegen + plan)
        // drop the cold run's cache/checkpoint blocks BEFORE timing
        // the warm runs (outside the timed section): queries that
        // legitimately persist intermediate state (iterative
        // clustering) otherwise measure the cold run's garbage, not
        // the query — q47 reads 3s worse without this
        hygiene()
        val w1 = time(run(fn(spark, sfDir)))
        // min of two warm runs: single-sweep totals previously swung
        // ±5s because GC/cleaner timing lands on different queries
        // each sweep; the min is the query's cost without that noise.
        // Sub-0.4s queries MAY skip the second run (noise there is
        // bounded by the floor) — but only when their reading won't
        // serve as a 10x-ratio denominator (see scale10 note above).
        if (w1 < 0.4 && !scale10) name -> w1
        else {
          hygiene()
          val w2 = time(run(fn(spark, sfDir)))
          val m2 = math.min(w1, w2)
          // heavy queries' generated code takes ~3 invocations to
          // reach C2 steady state (q61 isolated: 1.75 → 0.95 → 0.48);
          // one more run separates engine cost from JIT warm-up for
          // the queries where that gap is material
          if (m2 < 0.8 && !scale10) name -> m2
          else {
            hygiene()
            val w3 = time(run(fn(spark, sfDir)))
            name -> math.min(m2, w3)
          }
        }
      } catch { case scala.util.control.NonFatal(_) => name -> -1.0 }
      // Same hygiene between queries: without it the 100+-query sweep
      // accumulates blocks across queries and, on a small driver heap,
      // later queries GC-thrash 10-30x (BENCH_r02: q47 120s vs 2s in
      // isolation at the same heap).
      hygiene()
      r
    }
    def fmt(v: Double): String = f"$v%.3f"
    def jsonOf(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum

    // ---- 10x scale sweep: the same query surface against a replica of
    // the bench data with 10x the rows AND 10x the key cardinality
    // (Scale10x shifts keys per replica). The sf0.1 sweep is floor-
    // dominated (~0.05s/query scheduling cost), so per-query 1x→10x
    // ratios are the scale evidence the totals can't provide: a
    // shuffle-bound plan reads ~linear (ratio ≲ 10 plus constant
    // floors), a quadratic or driver-bound one jumps out immediately.
    // Disable with SPARK_GRAFT_SCALE10=0 (dev iteration; scale10 is
    // defined above the 1x sweep because it widens 1x to min-of-3).
    val byName1 = results.toMap
    // Per-run watchdog for the scale sweeps: a query whose plan
    // degrades super-linearly must not hang the sweep — cancel its
    // job group at the limit and record the -2.0 timeout sentinel
    // (distinct from -1.0 failure) so the regression is DATA in the
    // ratio table, not a driver-killed round.
    def bounded(name: String, limitSec: Int)(fn: => Unit): Double = {
      val group = s"scale-$name"
      val deadline = System.currentTimeMillis + limitSec * 1000L
      @volatile var finished = false
      @volatile var cancelled = false
      spark.sparkContext.setJobGroup(group, name, interruptOnCancel = true)
      val watchdog = new Thread(() => {
        while (!finished && System.currentTimeMillis < deadline)
          Thread.sleep(100)
        if (!finished) { cancelled = true
          spark.sparkContext.cancelJobGroup(group) }
      })
      watchdog.setDaemon(true)
      watchdog.start()
      // NonFatal only (an OOMed driver must fail the sweep, not
      // file a sentinel row); timeout is classified by WHETHER THE
      // WATCHDOG FIRED, not by comparing wall clock to the deadline
      // — a fast genuine error surfacing after the deadline is a
      // failure (-1.0), not a timeout (-2.0)
      try { val t = time(fn); finished = true; t }
      catch { case scala.util.control.NonFatal(_) =>
        finished = true
        if (cancelled) -2.0 else -1.0
      } finally spark.sparkContext.clearJobGroup()
    }
    val results10: Seq[(String, Double)] = if (!scale10) Seq.empty else {
      val bigDir = Scale10x.ensure(spark, sfDir)
      hygiene()
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val v = {
          val cold = bounded(name, 150)(run(fn(spark, bigDir)))
          if (cold < 0) cold
          else {
            hygiene()
            val w1 = bounded(name, 150)(run(fn(spark, bigDir)))
            // the 10x sweep reads TRENDS (is the ratio ~linear?), not
            // records, so one warm run suffices for most queries. A
            // second warm run fires exactly when the single reading
            // would MOVE the table: heavy rows (>= 5s), and rows whose
            // implied ratio exceeds 8x their own 1x time — either a
            // genuine super-linearity (the re-run confirms it) or a
            // neighbor's GC landing in the timed window (the re-run
            // corrects it; measured: q21 read 4.4s in sweep context
            // vs 0.9s isolated under the single-warm protocol).
            val t1 = byName1.getOrElse(name, 0.0)
            val suspicious = t1 > 0 && w1 > math.max(8 * t1, 1.0)
            if (w1 < 0) cold
            else if ((w1 < 5.0 && !suspicious) || cold > 30) w1
            else {
              hygiene()
              val w2 = bounded(name, 150)(run(fn(spark, bigDir)))
              if (w2 < 0) w1 else math.min(w1, w2)
            }
          }
        }
        hygiene()
        name -> v
      }
    }
    val ratios10: Seq[(String, Double)] = results10.flatMap { case (n, t10) =>
      byName1.get(n) match {
        case Some(t1) if t1 > 0 && t10 > 0 => Some(n -> t10 / t1)
        case _ => None
      }
    }

    // ---- 30x heavy-tail sweep: one more decade for the heaviest
    // queries (the 10x tail plus every family the r7 audit watched:
    // pair-emitting dedup, iterative graph, rollup/multi-distinct
    // expansions, the decorrelated scalar subquery, the reparameter-
    // ized √n ANN trio). 10x catches quadratics; 30x catches the
    // log-factors and memory cliffs that hide under 10x's constants.
    // Ratios are read AGAINST THE 10x ROW (linear ⇒ ~3x; the √n
    // blockers' n^1.5 law ⇒ ~5.2x): several 1x rows are floor-bound,
    // so a 30x/1x ratio would measure floors, not growth.
    // Disable with SPARK_GRAFT_SCALE30=0.
    val heavy30 = Seq(
      "q17_json_extract", "q23_langid", "q28_near_dups",
      "q44_jaccard_dedup", "q47_dedup_clusters", "q55_rollup",
      "q74_scalar_subquery", "q84_multi_distinct", "q128_clean_corpus",
      "q135_unpivot", "q141_semdedup", "q149_pagerank", "q154_kmeans",
      "q170_curation_pipeline", "q171_knn_join", "q173_contrastive_pairs",
      "q174_kn_bigram", "q183_kmv_algebra",
      // post-layout-fix tail: the floor-denominated top-10x-ratio
      // rows and the two heaviest 100x absolutes (ScaleNProbe r8)
      "q181_jl_project", "q34_embedding_neardups", "q25_minhash",
      "q158_covariance")
    val scale30 = scale10 && results10.nonEmpty &&
      sys.env.getOrElse("SPARK_GRAFT_SCALE30", "1") != "0"
    val results30: Seq[(String, Double)] = if (!scale30) Seq.empty else {
      val bigDir = Scale10x.ensure(spark, sfDir, 30)
      hygiene()
      heavy30.flatMap { name =>
        SparkEntry.queries.get(name).map { fn =>
          val v = {
            val cold = bounded(name, 300)(run(fn(spark, bigDir)))
            if (cold < 0) cold
            else {
              hygiene()
              // min of two warm runs unconditionally: the subset is
              // small and every row here IS a headline ratio
              val w1 = bounded(name, 300)(run(fn(spark, bigDir)))
              if (w1 < 0) cold
              else {
                hygiene()
                val w2 = bounded(name, 300)(run(fn(spark, bigDir)))
                if (w2 < 0) w1 else math.min(w1, w2)
              }
            }
          }
          hygiene()
          name -> v
        }
      }
    }
    val byName10 = results10.toMap
    val ratios30: Seq[(String, Double)] = results30.flatMap { case (n, t30) =>
      byName10.get(n) match {
        case Some(t10) if t10 > 0 && t30 > 0 => Some(n -> t30 / t10)
        case _ => None
      }
    }
    // Failed queries hold a -1.0 sentinel and are excluded from the
    // total; report the split so a reader can't mistake a partial
    // sweep for a full one (the r4 verdict compared a 149-query Spark
    // total against a 151-query oracle without noticing).
    val nFailed = results.count(_._2 < 0)
    val nRan = results.size - nFailed
    // Per-query scheduling floor: a no-op query (tiny range + one
    // shuffle) through the same cold/warm protocol. Multiplied by
    // n_queries this bounds the pure harness overhead in the total —
    // lets round-over-round comparisons separate engine cost from
    // Spark's fixed per-query cost at this scale.
    val floor = {
      def noop(): Unit = run(spark.range(1024)
        .groupBy((org.apache.spark.sql.functions.col("id") % 8).as("k"))
        .count())
      time(noop()); time(noop())
      time(noop())
    }
    // Protocol marker: r4 switched from count()-based timing (which
    // let the optimizer prune aggregate values and final sorts) to
    // full-plan noop-sink execution — totals are NOT comparable to
    // r1-r3 numbers; this field makes the change machine-visible.
    val protocol = "noop-full-plan,min3warm"
    // Host-weather-normalized total: raw totals drift round to round
    // with the machine's per-query scheduling floor (r6→r7 read +10s
    // on UNTOUCHED queries while the floor itself moved) — subtracting
    // n·floor reads engine cost, not host weather. Both numbers ship.
    val totalMinusFloor = math.max(0.0, total - nRan * floor)
    // Compact scale10x summary for the stdout line (the full table
    // would blow the driver's ~2000-char tail capture); the complete
    // per-query 10x timings and ratios go to BENCH_DETAIL.json.
    val scaleSummary: String = if (results10.isEmpty) "" else {
      val rs = ratios10.map(_._2).sorted
      def pct(p: Double): Double =
        if (rs.isEmpty) 0.0 else rs(math.min(rs.size - 1, (p * rs.size).toInt))
      val total10 = results10.map(_._2).filter(_ >= 0).sum
      val worst = ratios10.sortBy(-_._2).take(3)
        .map { case (n, r) => "\"" + n + "\":" + fmt(r) }.mkString("{", ",", "}")
      s""","scale10x":{"total":${fmt(total10)},""" +
        s""""n_timeout":${results10.count(_._2 == -2.0)},""" +
        s""""n_failed":${results10.count(_._2 == -1.0)},""" +
        s""""ratio_p50":${fmt(pct(0.50))},"ratio_p90":${fmt(pct(0.90))},""" +
        s""""ratio_max":${fmt(pct(1.0))},"worst":$worst}"""
    }
    // Compact 30x summary (ratios are vs the 10x row; linear ⇒ ~3x)
    val scale30Summary: String = if (results30.isEmpty) "" else {
      val rs = ratios30.map(_._2).sorted
      def pct(p: Double): Double =
        if (rs.isEmpty) 0.0 else rs(math.min(rs.size - 1, (p * rs.size).toInt))
      val worst = ratios30.sortBy(-_._2).take(3)
        .map { case (n, r) => "\"" + n + "\":" + fmt(r) }.mkString("{", ",", "}")
      s""","scale30x":{"n":${results30.size},""" +
        s""""n_timeout":${results30.count(_._2 == -2.0)},""" +
        s""""n_failed":${results30.count(_._2 == -1.0)},""" +
        s""""ratio_vs10_p50":${fmt(pct(0.50))},""" +
        s""""ratio_vs10_max":${fmt(pct(1.0))},"worst":$worst}"""
    }
    // full detail to a file (driver tail capture would truncate it)
    val detail = s"""{"metric":"total","value":${fmt(total)},"unit":"sec",""" +
      s""""n_queries":${results.size},"n_ran":$nRan,"n_failed":$nFailed,""" +
      s""""overhead_floor":${fmt(floor)},""" +
      s""""total_minus_floor":${fmt(totalMinusFloor)},""" +
      s""""protocol":"$protocol",""" +
      s""""queries":${jsonOf(results)}""" +
      (if (results10.isEmpty) ""
       else s""","queries_10x":${jsonOf(results10)}""" +
         s""","ratios_10x":${jsonOf(ratios10)}""") +
      (if (results30.isEmpty) ""
       else s""","queries_30x":${jsonOf(results30)}""" +
         s""","ratios_30x_vs_10x":${jsonOf(ratios30)}""") +
      s""","sf":"$sfDir"}"""
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_DETAIL.json"), detail + "\n")
    val byName = results.toMap
    val head = headline.flatMap(n => byName.get(n).map(n -> _))
    // Stop Spark BEFORE printing the summary: the driver keeps only
    // the last ~2000 chars of combined output, so any shutdown-path
    // log line landing after the JSON would evict it from the tail.
    spark.sparkContext.setLogLevel("ERROR")
    spark.stop()
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec",""" +
      s""""n_queries":${results.size},"n_ran":$nRan,"n_failed":$nFailed,""" +
      s""""overhead_floor":${fmt(floor)},""" +
      s""""total_minus_floor":${fmt(totalMinusFloor)},""" +
      s""""protocol":"$protocol","detail":"BENCH_DETAIL.json"""" +
      scaleSummary + scale30Summary +
      s""","queries":${jsonOf(head)},"sf":"$sfDir"}""")
  }
}
