package graft.ops

import org.apache.spark.sql.DataFrame

/** Parallelism guard for compute-heavy per-row operators.
  *
  * A small input (one parquet file, one kafka partition, a single
  * coalesced AQE stage) arrives as a handful of partitions; feeding
  * it straight into a CPU-dense projection (minhash over shingles,
  * per-vector arithmetic) serializes the work on that handful of
  * cores no matter how large the cluster is. [[ensure]] round-robin
  * repartitions up to the session's default parallelism — but ONLY
  * when the input has fewer partitions, so at production scale
  * (where a 100 TB scan already yields thousands of splits) it is a
  * no-op and adds no shuffle.
  *
  * A second, deliberate effect: the exchange materializes the
  * projection below it. Operators that tokenize before [[ensure]]
  * pay the tokenizing regex once per document instead of once per
  * lambda element after Catalyst inlines the shared subexpression
  * into every higher-order-function lambda (which are interpreted,
  * not codegen'd, so no common-subexpression elimination applies).
  */
object Parallelism {

  def ensure(df: DataFrame): DataFrame = {
    // streaming frames have no static partitioning to inspect (and
    // micro-batch sizing governs their parallelism) — pass through
    if (df.isStreaming) return df
    val target = df.sparkSession.sparkContext.defaultParallelism
    // getNumPartitions forces physical planning of the (batch) frame;
    // cheap relative to the compute this guard protects.
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** [[ensure]], but hash-partitioned on `key` instead of round-robin.
    * Every downstream `groupBy(key, ...)` — the key alone OR the key
    * plus more columns — and every join on `key` is then satisfied by
    * this one exchange (HashPartitioning(key) satisfies any
    * ClusteredDistribution that contains key), so a
    * tokenize→explode→aggregate-per-doc pipeline runs with a single
    * shuffle of the compact token arrays instead of re-shuffling the
    * exploded rows at every stage.
    */
  def ensureKeyed(df: DataFrame, key: org.apache.spark.sql.Column): DataFrame = {
    if (df.isStreaming) return df
    val target = df.sparkSession.sparkContext.defaultParallelism
    df.repartition(target, key)
  }
}
