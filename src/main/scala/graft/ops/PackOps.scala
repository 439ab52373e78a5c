package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence-packing operators for pretraining pipelines: concatenate
  * the corpus in a deterministic order and cut it into fixed-size
  * token chunks (documents may straddle chunk boundaries — the
  * GPT-style packing layout).
  *
  * The core primitive is a global ordered prefix sum. The naive
  * `Window.orderBy(...)` with no partition key funnels 100 TB through
  * ONE task; [[globalPrefixSum]] instead range-partitions by the
  * order key, cumsums within each partition, and shifts every
  * partition by the (driver-computed, k-row) prefix of preceding
  * partition totals — the classic two-phase scan. Results are a pure
  * function of the order key, independent of how the range
  * partitioner splits.
  */
object PackOps {

  /** Adds `cum` = inclusive prefix sum of `valueCol` over the total
    * order given by `orderCol` (must be unique). */
  def globalPrefixSum(
      df: DataFrame, orderCol: String, valueCol: Column): DataFrame =
    prefixSummed(df, orderCol, valueCol).drop("_v")

  /** [[globalPrefixSum]] keeping the evaluated `_v` value column —
    * callers whose value expression is expensive (a tokenizing regex)
    * read the materialized `_v` from the checkpoint instead of
    * re-evaluating the expression per downstream use. */
  private def prefixSummed(
      df: DataFrame, orderCol: String, valueCol: Column): DataFrame = {
    val parallelism = df.sparkSession.sparkContext.defaultParallelism
    val ranged = df
      .withColumn("_v", valueCol.cast("long"))
      .repartitionByRange(parallelism, col(orderCol))
      .withColumn("_pid", spark_partition_id())
    // per-partition running sum (partition-local window: cheap sort,
    // no single giant partition); lazily checkpointed because it is
    // consumed twice — once for the partition totals, once for the
    // final shift — and must not recompute the scan for each
    val local = ranged.withColumn("_local",
      sum(col("_v")).over(Window.partitionBy(col("_pid")).orderBy(col(orderCol))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .localCheckpoint(false)
    // k partition totals -> driver -> exclusive prefix offsets; k is
    // the parallelism, not the data size
    val totals = local.groupBy(col("_pid")).agg(max(col("_local")).as("_t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = totals.scanLeft((0, 0L)) { case ((_, acc), (pid, t)) =>
      (pid, acc + t)
    }.init.map { case (_, off) => off } // offset for pid i = sum of totals < i
    val spark = df.sparkSession
    import spark.implicits._
    val offsetDf = totals.map(_._1).zip(offsets).toSeq.toDF("_pid", "_off")
    local.join(broadcast(offsetDf), "_pid")
      .withColumn("cum", col("_local") + col("_off"))
      .drop("_pid", "_local", "_off")
  }

  /** Chunk layout of the concatenated corpus: for each document (in
    * `orderCol` order), its start offset in the token stream, the
    * chunk it starts in, and how many `chunkTokens`-sized chunks it
    * spans (0 for empty documents).
    */
  /** Size-balanced shard assignment for training output: rank
    * documents by (weight DESC, id) with the two-phase
    * [[StatsOps.globalRank]] (no single-task window), then deal them
    * serpentine across `nShards` — block k goes left-to-right, block
    * k+1 right-to-left — the classic LPT-style folding that bounds
    * per-shard weight spread by one document within every
    * 2·nShards block, against ANY weight distribution. Deterministic
    * and engine-exact: the assignment is pure integer arithmetic on
    * the dense rank.
    *
    * Returns (idCol, weightCol, shard). Shuffle profile: one range
    * exchange for the rank, then a pure projection; at 100 TB the
    * writer follows with `repartition(col("shard"))` so each shard
    * lands as one output stream.
    */
  def shardAssign(df: DataFrame, idCol: String, weightCol: String,
      nShards: Int): DataFrame = {
    require(nShards > 0, "shardAssign: need at least one shard")
    val (ranked, _) = StatsOps.globalRank(
      df.select(col(idCol), col(weightCol)), "_r",
      col(weightCol).desc, col(idCol).asc)
    val r0 = col("_r") - 1
    // floor-div: exact for any feasible rank (double holds integers
    // to 2^52; a 100 TB corpus is ~1e11 documents)
    val block = floor(r0 / nShards).cast("long")
    val pos = r0 % nShards
    ranked.select(col(idCol), col(weightCol),
      when(block % 2 === 0, pos).otherwise(lit(nShards - 1) - pos)
        .cast("int").as("shard"))
  }

  def chunkAssignments(
      df: DataFrame, orderCol: String, tokenCountCol: Column,
      chunkTokens: Long): DataFrame = {
    require(chunkTokens > 0)
    // read the token count back from the prefix pass's materialized
    // `_v` — re-evaluating tokenCountCol here would re-run its
    // (typically regex-tokenizing) expression twice more per row on
    // top of the checkpointed scan
    val withCum = prefixSummed(df, orderCol, tokenCountCol)
    val tc = col("_v")
    val start = col("cum") - tc
    withCum
      .withColumn("start_offset", start)
      .withColumn("chunk_id", floor(start / chunkTokens.toDouble).cast("long"))
      .withColumn("n_chunks",
        when(tc === 0, 0L).otherwise(
          floor((col("cum") - 1) / chunkTokens.toDouble).cast("long")
            - col("chunk_id") + 1))
      .drop("_v")
  }
}
