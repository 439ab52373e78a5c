package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.ImportSource

/** Builds an N× replica of a testdata scale-factor directory for the
  * bench's scale sweeps (BENCH's `scale10x`/`scale30x` sections) and
  * ScaleProbe.
  *
  * Fact tables are replicated `factor` times with per-replica key
  * shifts so cardinalities scale WITH the data — 10x orders means 10x
  * distinct order keys, 10x customers, 10x documents — the way organic
  * growth behaves, not ten identical copies whose groupBy cardinality
  * stays flat. Shift spans are chosen per key family and kept
  * consistent across tables so every foreign-key join still matches
  * within its replica (lineitem.l_orderkey lands on orders.o_orderkey
  * shifted by the same span). `region`/`nation` stay fixed, as TPC-H
  * scaling does.
  *
  * The replica is written once under /tmp and reused by existence
  * check — the source testdata is read-only and deterministic, so a
  * present replica is never stale.
  */
object Scale10x {
  /** (table, key column → per-replica shift span). Spans exceed the
    * sf0.1 key ranges by >100x, so factors up to 100 never collide. */
  private val shifted: Seq[(String, Map[String, Long])] = Seq(
    "orders" -> Map("o_orderkey" -> 10000000L, "o_custkey" -> 1000000L),
    "lineitem" -> Map("l_orderkey" -> 10000000L, "l_suppkey" -> 100000L,
      "l_partkey" -> 1000000L),
    "customer" -> Map("c_custkey" -> 1000000L),
    "supplier" -> Map("s_suppkey" -> 100000L),
    "part" -> Map("p_partkey" -> 1000000L),
    "events" -> Map("event_id" -> 10000000L, "user_id" -> 1000000L),
    "documents" -> Map("doc_id" -> 1000000L),
    "embeddings" -> Map("vec_id" -> 1000000L))
  private val fixed = Seq("region", "nation")

  /** Ensures the `factor`× replica of `sfDir` exists; returns its
    * path. (`_v2`: replica CONTENT made distinct; `_v3`: scan-
    * parallel multi-file layout; `_v4`: factor 1 supported — a
    * byte-identical rewrite of the 1× input into the same 32-file
    * layout, so every 10x/1x bench ratio is layout-consistent — and
    * the fixed dimension tables repartitioned like the facts.)
    *
    * factor = 1 is the bench's official ratio DENOMINATOR input:
    * the generic path below is an identity there (one replica, zero
    * key shift, replica-0 content untouched), so only the file
    * layout changes — the original single-file, single-row-group
    * testdata parquet is unsplittable below a row group and made
    * map-heavy 1× rows measure a SERIALIZED scan (q160 read 3.67s
    * at 1× vs 2.04s at 10x in BENCH_r08).
    */
  def ensure(spark: SparkSession, sfDir: String, factor: Int = 10): String = {
    require(factor >= 1 && factor <= 100,
      s"Scale10x.ensure: factor $factor outside the collision-free span range")
    val name = new java.io.File(sfDir).getName
    val out = s"/tmp/graft_${factor}x_${name}_v4"
    val marker = new java.io.File(s"$out/_complete")
    if (!marker.exists()) {
      shifted.foreach { case (table, shifts) =>
        val base = ImportSource.table(spark, sfDir, table)
        val r = base.crossJoin(
          spark.range(factor).select(col("id").as("_rep")))
        val shiftedDf = shifts.foldLeft(r) { case (df, (c, span)) =>
          df.withColumn(c, col(c) + col("_rep") * span)
        }
        // Content must scale like ORGANIC growth, not carbon copies.
        // Ten textually identical replicas give every document ten
        // exact twins, so near-duplicate DENSITY grows 10x and every
        // pair-emitting operator's TRUE answer grows ~100x — the
        // first sweep measured q44 at 101x for exactly this reason,
        // with the extra time spent emitting the genuinely quadratic
        // pair list. Tagging each word with its replica id keeps the
        // token count and length distribution while making every
        // shingle replica-distinct (vocabulary grows with the corpus,
        // as organic text does); flipping a replica-keyed subset of
        // embedding dimensions keeps norms and within-replica
        // structure while pushing cross-replica cosine far below
        // near-dup thresholds.
        // replica 0 stays byte-identical to the base corpus; 1-9 get
        // replica-distinct content (a hash-keyed ~1/3 dimension flip
        // puts any two replicas' copies of a vector ~2/3·2 apart in
        // flipped mass — far outside cosine near-dup range — and a
        // modulo pattern would alias replicas onto each other)
        val distinct = table match {
          case "documents" => shiftedDf.withColumn("text",
            when(col("_rep") === 0, col("text")).otherwise(
              array_join(transform(split(col("text"), " "),
                w => concat(lit("r"), col("_rep"), w)), " ")))
          case "embeddings" => shiftedDf.withColumn("embedding",
            when(col("_rep") === 0, col("embedding")).otherwise(
              zip_with(col("embedding"),
                sequence(lit(0), size(col("embedding")) - 1),
                (v, d) => when(pmod(hash(d, col("_rep")), lit(3)) === 0, -v)
                  .otherwise(v))))
          case _ => shiftedDf
        }
        // Write SCAN-PARALLEL files. The naive write inherits the
        // base scan's 1-2 partitions and lands each table in ONE
        // snappy file with one row group — and a single-file,
        // single-row-group parquet scan is ONE task no matter the
        // cluster. The r8 30x sweep read q17 (JSON parse) at 6.7x
        // vs 10x and q74's two lineitem passes at 12x vs 1x for
        // exactly this reason: the map-heavy half of the tail was
        // measuring a serialized scan, not the plan. A real corpus
        // at any scale arrives in many files; 32 matches the bench
        // host's cores and keeps files well above parquet's footer
        // overhead at these sizes.
        distinct.drop("_rep").repartition(32)
          .write.mode("overwrite").parquet(s"$out/$table.parquet")
      }
      fixed.foreach { table =>
        // dimension tables stay fixed-content as TPC-H scaling does,
        // but get the same multi-file layout as the facts (they are
        // 5-25 rows — 4 files keeps footer overhead trivial while no
        // table in the replica is ever a single-file scan)
        ImportSource.table(spark, sfDir, table).repartition(4)
          .write.mode("overwrite").parquet(s"$out/$table.parquet")
      }
      marker.createNewFile()
    }
    out
  }
}
