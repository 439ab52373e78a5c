package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{ChangelogOps, DedupOps, TemporalJoins, TextOps}
import graft.sources.ImportSource

/** Scaling probe: times representative operators at 1x (sf0.1) and
  * 10x (sf0.1 replicated with shifted keys) and prints the observed
  * scaling ratio. A shuffle-bound operator should scale ~linearly
  * (ratio ≈ 10 ± constant overheads); a quadratic or driver-bound
  * operator shows up immediately. Writes the 10x copy under /tmp.
  *
  * Run: sbt "runMain graft.ScaleProbe"   (~2 min; needs an idle box
  * for meaningful ratios)
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sf = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.buffer.pageSize", "4m") // see Bench.scala
      .config("spark.sql.files.maxPartitionBytes", "1m") // see Bench.scala
      .config("spark.sql.files.openCostInBytes", "64k")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftSparkExtensions.register(spark)
    val big = Scale10x.ensure(spark, sf)

    // shared 10x replica (Scale10x): keys shift per replica so
    // cardinalities scale with the data, and replica CONTENT is made
    // distinct (word-tagged text, dimension-flipped embeddings) so
    // near-duplicate DENSITY stays constant, as organic growth
    // behaves — identical copies made every pair-emitting probe's
    // true answer quadratic (see SCALING.md round-7 notes)

    def events(dir: String) = ImportSource.table(spark, dir, "events")
    // noop-sink execution: .count() lets the optimizer prune aggregate
    // values, projections, and final sorts (the round-4 bench lesson) —
    // the probe must run the COMPLETE plan or ratios compare plans
    // with different amounts of work
    def run(df: DataFrame): Long = {
      df.write.mode("overwrite").format("noop").save(); 0L
    }
    // Same inter-query hygiene the bench needed (see Bench.scala): a
    // probe's shuffle/checkpoint debris left on the heap GC-thrashes
    // the NEXT probe's timing 4-30x (measured: repetition 10x read
    // 22.0s inside the sweep vs 6.0s isolated). Collect between
    // timings and take the best of two timed runs so one unlucky GC
    // pause doesn't masquerade as a scaling defect.
    def timeIt(fn: => Long): Double = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
      fn // warm (JIT + shuffle-file cache)
      val runs = Seq.fill(2) {
        val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
      }
      runs.min
    }

    val probes: Seq[(String, String => Long)] = Seq(
      "groupBy agg (q01 shape)" -> { dir =>
        run(ImportSource.table(spark, dir, "lineitem")
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(sum(col("l_quantity")), count(lit(1))))
      },
      // int128 vs decimal accumulators: the per-row BigDecimal cost of
      // >18-digit decimal sums scales with rows, the int128 limbs stay
      // in codegen — the gap should WIDEN at 10x
      "exact sum int128 (q01)" -> { dir =>
        run(ImportSource.table(spark, dir, "lineitem")
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(graft.functions.Int128Sum.exactScaledSum(col("l_quantity"), 2),
            graft.functions.Int128Sum.exactScaledSum(col("l_extendedprice"), 2),
            count(lit(1))))
      },
      "exact sum decimal (q01)" -> { dir =>
        run(ImportSource.table(spark, dir, "lineitem")
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(sum(col("l_quantity").cast(
              org.apache.spark.sql.types.DecimalType(18, 2))),
            sum(col("l_extendedprice").cast(
              org.apache.spark.sql.types.DecimalType(18, 2))),
            count(lit(1))))
      },
      "latest-row window" -> { dir =>
        val cl = events(dir).select(
          col("ts").as(graft.model.Envelope.TimestampCol),
          col("event_id").as(graft.model.Envelope.LsnCol),
          col("user_id"), lit("UPDATE").as(graft.model.Envelope.OperationCol),
          col("value"))
          .withColumn(graft.model.Envelope.SequenceCol, lit(null).cast("long"))
        run(ChangelogOps.latestRowView(cl, Seq(col("user_id"))))
      },
      "fact-fact join + agg" -> { dir =>
        run(ImportSource.table(spark, dir, "lineitem")
          .join(ImportSource.table(spark, dir, "orders"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderpriority")).count())
      },
      "as-of join (window)" -> { dir =>
        val e = events(dir)
        run(TemporalJoins.asOfJoin(
          e.where(col("event_type") === "click")
            .select(col("event_id"), col("user_id"), col("ts")),
          e.where(col("event_type") === "purchase")
            .select(col("user_id").as("pu"), col("ts").as("pt"), col("value").as("pv")),
          "user_id", "pu", "ts", "pt", Seq("pv")))
      },
      "as-of join (native exec)" -> { dir =>
        val e = events(dir)
        run(TemporalJoins.asOfJoinNative(
          e.where(col("event_type") === "click")
            .select(col("event_id"), col("user_id"), col("ts")),
          e.where(col("event_type") === "purchase")
            .select(col("user_id").as("pu"), col("ts").as("pt"), col("value").as("pv")),
          "user_id", "pu", "ts", "pt", Seq("pv")))
      },
      "exact dedup" -> { dir =>
        run(DedupOps.exactDuplicates(
          ImportSource.table(spark, dir, "documents"), "doc_id", "text"))
      },
      "tfidf top-terms" -> { dir =>
        run(TextOps.tfidfTopTerms(
          ImportSource.table(spark, dir, "documents"), "doc_id", "text", 3))
      },
      "repetition (keyed pipeline)" -> { dir =>
        run(TextOps.repetitionStats(
          ImportSource.table(spark, dir, "documents"), "doc_id", "text"))
      },
      "minhash signatures" -> { dir =>
        run(DedupOps.minhashSignatures(
          ImportSource.table(spark, dir, "documents"), "doc_id", "text", 16))
      },
      "simhash table" -> { dir =>
        run(DedupOps.simhashTable(
          ImportSource.table(spark, dir, "documents"), "doc_id", "text"))
      },
      "semdedup (cell-blocked)" -> { dir =>
        val e = ImportSource.table(spark, dir, "embeddings")
          .select(col("vec_id"), col("embedding"))
        // k ≈ √n: cell-blocked all-pairs costs O(n·k) assignment +
        // O(n²/k) pair verification, minimized at k = √n → O(n^1.5)
        // total. Fixed k degrades to quadratic pairs; k ∝ n degrades
        // to quadratic assignment.
        val k = if (dir == sf) 8 else 25
        val cents = (0 until k).map(c => Seq.tabulate(64)(d =>
          ((((c * 131L + d) * 2654435761L) % 1000L) / 500.0 - 1.0).toFloat))
        run(graft.ops.SimilarityOps.semDedup(e, "vec_id", "embedding", cents, 0.3))
      },
      // round-4/5 additions: the iterative / model-building operators
      // whose scale posture the notes claim — measure, don't assert
      "dedup clusters (conn comp)" -> { dir =>
        val pairs = DedupOps.fingerprintCandidatePairs(
          ImportSource.table(spark, dir, "documents"), "doc_id", "text")
        run(DedupOps.duplicateClusters(pairs))
      },
      "nb classifier (train+score)" -> { dir =>
        run(graft.ops.ClassifierOps.nbClassify(
          ImportSource.table(spark, dir, "documents"), "doc_id", "lang", "text"))
      },
      "pagerank (3 iterations)" -> { dir =>
        val o = ImportSource.table(spark, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"))
        val l = ImportSource.table(spark, dir, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey"))
        val cs = o.join(l, col("o_orderkey") === col("l_orderkey"))
          .select(col("o_custkey").as("src"),
            (col("l_suppkey") + 1000000L).as("dst"))
        val edges = cs.unionByName(
          cs.select(col("dst").as("src"), col("src").as("dst")))
        run(graft.ops.GraphOps.pageRank(edges, iterations = 3))
      },
      "sessionize + session stats" -> { dir =>
        run(ChangelogOps.sessionize(events(dir), col("user_id"), col("ts"), 1800L)
          .groupBy(col("user_id"), col("session_id"))
          .agg(count(lit(1)).as("n"), sum(col("value")).as("v")))
      },
      // round-5 additions
      "kmeans (2 rounds, k~sqrt n)" -> { dir =>
        val e = ImportSource.table(spark, dir, "embeddings")
          .select(col("vec_id"), col("embedding"))
        run(graft.ops.ClusterOps.kmeans(e, "vec_id", "embedding",
          k = if (dir == sf) 8 else 25, rounds = 2))
      },
      "duplicate spans (4-gram)" -> { dir =>
        run(TextOps.duplicateSpans(
          ImportSource.table(spark, dir, "documents"), "doc_id", "text", 4))
      },
      "logreg (2 GD steps)" -> { dir =>
        run(graft.ops.ClassifierOps.logregTrainScore(
          ImportSource.table(spark, dir, "documents")
            .withColumn("is_en", (col("lang") === "en").cast("int")),
          "doc_id", "is_en", "text", steps = 2, lr = 0.5))
      },
      "gopher rules (map-side)" -> { dir =>
        run(TextOps.gopherQuality(
          ImportSource.table(spark, dir, "documents"), "doc_id", "text"))
      },
      "span cut (keep-first)" -> { dir =>
        run(TextOps.cutDuplicateSpans(
          ImportSource.table(spark, dir, "documents"), "doc_id", "text", 4))
      },
      "shard assign (global rank)" -> { dir =>
        run(graft.ops.PackOps.shardAssign(
          ImportSource.table(spark, dir, "documents")
            .select(col("doc_id"),
              TextOps.tokenCount(col("text")).cast("long").as("w")),
          "doc_id", "w", nShards = 32))
      },
      // round-6 additions
      "curation pipeline (q170)" -> { dir =>
        val docs = ImportSource.table(spark, dir, "documents")
        run(graft.ops.CurationOps.curate(
          docs.where(col("doc_id") % 20 =!= 0),
          docs.where(col("doc_id") % 20 === 0), "doc_id", "text"))
      },
      "knn join (cell-blocked, k~sqrt n)" -> { dir =>
        val e = ImportSource.table(spark, dir, "embeddings")
          .select(col("vec_id"), col("embedding"))
        val k = if (dir == sf) 8 else 25
        val cents = (0 until k).map(c => Seq.tabulate(64)(d =>
          ((((c * 131L + d) * 2654435761L) % 1000L) / 500.0 - 1.0).toFloat))
        run(graft.ops.SimilarityOps.knnJoin(e, "vec_id", "embedding", cents, 5))
      })

    // optional arg: case-insensitive substring filter over probe names
    val wanted = probes.filter { case (name, _) =>
      args.isEmpty || args.exists(a => name.toLowerCase.contains(a.toLowerCase))
    }
    println(f"${"operator"}%-26s ${"1x"}%8s ${"10x"}%8s ratio")
    wanted.foreach { case (name, fn) =>
      val t1 = timeIt(fn(sf))
      val t10 = timeIt(fn(big))
      println(f"$name%-26s $t1%7.2fs $t10%7.2fs ${t10 / t1}%5.1fx")
    }
    spark.stop()
  }
}
