package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ImportSource

/** Guard against timestamp-type inference drift.
  *
  * Spark's parquet reader changed its inference default between
  * releases: unadjusted MICROS columns came back as TIMESTAMP in 3.5
  * and TIMESTAMP_NTZ in 4.1, which silently broke every epoch cast,
  * `unix_micros`, and `withWatermark` downstream (round-4 regression:
  * q29/q85/q97 + 7 specs). The engine now owns its ingestion types —
  * [[ImportSource.normalizeTimestamps]] coerces NTZ→TIMESTAMP at the
  * read boundary — and this spec proves the property the fix
  * guarantees: every declared query that touches a timestamp-bearing
  * table returns IDENTICAL results whether the underlying parquet
  * stores event time as NTZ (isAdjustedToUTC=false) or LTZ
  * (isAdjustedToUTC=true). If a future Spark flips the default again,
  * or someone bypasses the normalize helper, this fails loudly.
  */
class TimestampDriftSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private val allTables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Tables holding timestamp columns in the driver testdata. */
  private val tsTables = Seq("events", "orders", "lineitem")

  /** Write a scale-factor directory where timestamp tables are
    * re-encoded in the requested flavor; the rest symlink to the
    * original files (same bytes, so any divergence is the flavor's).
    */
  private def makeFlavor(suffix: String, toNtz: Boolean): String = {
    val dir = Files.createTempDirectory(s"graft-drift-$suffix").toString
    for (t <- allTables) {
      val df = ImportSource.table(spark, sf, t)
      val tsCols = df.schema.fields
        .filter(_.dataType == TimestampType).map(_.name)
      if (tsCols.isEmpty) {
        Files.createSymbolicLink(
          Paths.get(s"$dir/$t.parquet"), Paths.get(s"$sf/$t.parquet"))
      } else {
        val out =
          if (toNtz) tsCols.foldLeft(df) { (d, c) =>
            d.withColumn(c, col(c).cast(TimestampNTZType))
          } else df
        out.write.mode("overwrite").parquet(s"$dir/$t.parquet")
      }
    }
    dir
  }

  /** Does this query's plan read any timestamp-bearing table? */
  private def readsTsTable(df: DataFrame): Boolean =
    df.queryExecution.analyzed.collectLeaves().exists {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.exists { p =>
          tsTables.exists(t => p.toString.endsWith(s"/$t.parquet"))
        }
        case _ => false
      }
      case _ => false
    }

  test("every declared query is invariant to NTZ vs LTZ parquet event time") {
    val ntzDir = makeFlavor("ntz", toNtz = true)
    val ltzDir = makeFlavor("ltz", toNtz = false)

    // flavor sanity: the rewritten events tables really differ at the
    // parquet level (raw reads — NOT through the normalizing reader)
    val rawNtz = spark.read.parquet(s"$ntzDir/events.parquet")
      .schema("ts").dataType
    val rawLtz = spark.read.parquet(s"$ltzDir/events.parquet")
      .schema("ts").dataType
    assert(rawNtz == TimestampNTZType, s"ntz flavor read back as $rawNtz")
    assert(rawLtz == TimestampType, s"ltz flavor read back as $rawLtz")

    val affected = SparkEntry.queries.keys.toSeq.sorted.filter { name =>
      readsTsTable(SparkEntry.queries(name)(spark, sf))
    }
    assert(affected.size >= 20, s"expected a broad ts surface, got $affected")

    val diverged = affected.flatMap { name =>
      val a = SparkEntry.queries(name)(spark, ntzDir)
        .collect().map(_.toString).sorted.toSeq
      val b = SparkEntry.queries(name)(spark, ltzDir)
        .collect().map(_.toString).sorted.toSeq
      if (a == b) None else Some(name)
    }
    assert(diverged.isEmpty,
      s"queries diverged between NTZ and LTZ inputs: $diverged")
  }

  test("the normalizing reader yields TIMESTAMP regardless of stored flavor") {
    // direct unit check on the helper: NTZ in, LTZ out; LTZ untouched
    import spark.implicits._
    val ntz = Seq("2024-01-01 00:00:00").toDF("s")
      .select(col("s").cast(TimestampNTZType).as("ts"), lit(1L).as("v"))
    val out = ImportSource.normalizeTimestamps(ntz)
    assert(out.schema("ts").dataType == TimestampType)
    assert(out.schema("v").dataType.typeName == "long")
    // UTC session: the wall clock survives the coercion exactly
    assert(out.select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"))
      .head().getString(0) == "2024-01-01 00:00:00")
    val already = ImportSource.normalizeTimestamps(out)
    assert(already.schema("ts").dataType == TimestampType)
  }
}
