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
    val big = "/tmp/graft_scaleprobe"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftSparkExtensions.register(spark)

    // 10x replicas: key columns shift per replica so cardinalities
    // scale with the data (10x users, 10x orders), as real growth would
    def replicate(t: String, keyShifts: Map[String, Long]): Unit = {
      val base = ImportSource.table(spark, sf, t)
      val out = s"$big/$t.parquet"
      if (!new java.io.File(out).exists()) {
        val r = base.crossJoin(spark.range(10).select(col("id").as("_rep")))
        val shifted = keyShifts.foldLeft(r) { case (df, (c, span)) =>
          df.withColumn(c, col(c) + col("_rep") * span)
        }.drop("_rep")
        shifted.write.mode("overwrite").parquet(out)
      }
    }
    replicate("events", Map("event_id" -> 10000000L, "user_id" -> 1000000L))
    replicate("documents", Map("doc_id" -> 1000000L))
    replicate("lineitem", Map("l_orderkey" -> 10000000L))
    replicate("orders", Map("o_orderkey" -> 10000000L))

    def events(dir: String) = ImportSource.table(spark, dir, "events")
    def timeIt(fn: => Long): Double = {
      fn // warm
      val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
    }

    val probes: Seq[(String, String => Long)] = Seq(
      "groupBy agg (q01 shape)" -> { dir =>
        ImportSource.table(spark, dir, "lineitem")
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(sum(col("l_quantity")), count(lit(1))).count()
      },
      "latest-row window" -> { dir =>
        val cl = events(dir).select(
          col("ts").as(graft.model.Envelope.TimestampCol),
          col("event_id").as(graft.model.Envelope.LsnCol),
          col("user_id"), lit("UPDATE").as(graft.model.Envelope.OperationCol),
          col("value"))
          .withColumn(graft.model.Envelope.SequenceCol, lit(null).cast("long"))
        ChangelogOps.latestRowView(cl, Seq(col("user_id"))).count()
      },
      "fact-fact join + agg" -> { dir =>
        ImportSource.table(spark, dir, "lineitem")
          .join(ImportSource.table(spark, dir, "orders"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderpriority")).count().count()
      },
      "as-of join (window)" -> { dir =>
        val e = events(dir)
        TemporalJoins.asOfJoin(
          e.where(col("event_type") === "click")
            .select(col("event_id"), col("user_id"), col("ts")),
          e.where(col("event_type") === "purchase")
            .select(col("user_id").as("pu"), col("ts").as("pt"), col("value").as("pv")),
          "user_id", "pu", "ts", "pt", Seq("pv")).count()
      },
      "as-of join (native exec)" -> { dir =>
        val e = events(dir)
        TemporalJoins.asOfJoinNative(
          e.where(col("event_type") === "click")
            .select(col("event_id"), col("user_id"), col("ts")),
          e.where(col("event_type") === "purchase")
            .select(col("user_id").as("pu"), col("ts").as("pt"), col("value").as("pv")),
          "user_id", "pu", "ts", "pt", Seq("pv")).count()
      },
      "exact dedup" -> { dir =>
        DedupOps.exactDuplicates(
          ImportSource.table(spark, dir, "documents"), "doc_id", "text").count()
      },
      "tfidf top-terms" -> { dir =>
        TextOps.tfidfTopTerms(
          ImportSource.table(spark, dir, "documents"), "doc_id", "text", 3).count()
      })

    println(f"${"operator"}%-26s ${"1x"}%8s ${"10x"}%8s ratio")
    probes.foreach { case (name, fn) =>
      val t1 = timeIt(fn(sf))
      val t10 = timeIt(fn(big))
      println(f"$name%-26s $t1%7.2fs $t10%7.2fs ${t10 / t1}%5.1fx")
    }
    spark.stop()
  }
}
