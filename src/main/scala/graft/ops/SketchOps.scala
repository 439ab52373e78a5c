package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.KMinValuesAggregator

/** Sketch-based approximations for corpus-scale statistics.
  *
  * The KMV (k-minimum-values) distinct sketch trades Spark's built-in
  * HLL++ (`approx_count_distinct`) for one whose state is plain order
  * statistics over a portable hash: any engine reproduces the exact
  * same estimate from the same data, so the approximation itself is
  * testable against an independent oracle — no "close enough"
  * tolerance in the correctness gate. Standard error ≈ 1/sqrt(k-2)
  * (~12% at k=64, ~3% at k=1024); state is O(k) per group and
  * partial-aggregates map-side.
  */
object SketchOps {

  /** Per-group approximate distinct count of `valueCol`.
    *
    * Estimate: with fewer than k distinct hashes the sketch is exact
    * (it holds every distinct hash); otherwise D̂ = (k-1)/h_(k), the
    * classic KMV estimator over the k-th smallest of uniform [0,1)
    * hashes. All arithmetic is IEEE-exact (dyadic hash values, one
    * division), hence engine-reproducible bit for bit.
    */
  def kmvDistinct(
      df: DataFrame, groupCol: String, valueCol: String, k: Int): DataFrame = {
    val kmins = udaf(new KMinValuesAggregator(k))
    // drop null values BEFORE the typed aggregator: its primitive
    // Double encoder would silently read null as 0.0, injecting a
    // phantom minimal hash into the sketch
    df.select(col(groupCol), SampleOps.hashUnit(col(valueCol)).as("_h"))
      .where(col("_h").isNotNull)
      .groupBy(col(groupCol))
      .agg(kmins(col("_h")).as("_mins"))
      .select(col(groupCol),
        when(size(col("_mins")) < k, size(col("_mins")).cast("double"))
          .otherwise(lit((k - 1).toDouble) / element_at(col("_mins"), k))
          .as("approx_distinct"))
  }

  /** KMV sketch SET ALGEBRA — the mergeable-summary payoff: union,
    * intersection, and Jaccard estimates for two sets from their
    * k-minimum-value sketches alone, never the sets. This is how
    * corpus-overlap questions ("how much of crawl B is already in
    * crawl A?") get answered at 100 TB: each side reduces to k
    * doubles, the combine is list arithmetic on 2k values.
    *
    *   union    ≈ (k−1)/h_k over the merged k smallest
    *   ρ        = fraction of those k present in BOTH sketches
    *   intersect≈ ρ · union,  Jaccard ≈ ρ      (Beyer et al. 2007)
    *
    * Deterministic end-to-end (md5-based hashes, sorted merges), so
    * the estimates — not just the exact answers — are oracle-exact
    * cross-engine. Small-set regime (fewer than k distinct values
    * observed) falls back to exact counts by construction.
    */
  def kmvSetAlgebra(a: DataFrame, b: DataFrame, valueCol: String,
      k: Int): DataFrame = {
    val agg = udaf(new KMinValuesAggregator(k))
    def sketch(df: DataFrame, out: String) =
      df.select(SampleOps.hashUnit(col(valueCol)).as("_h"))
        .where(col("_h").isNotNull)
        .agg(agg(col("_h")).as(out))
    val merged = slice(array_sort(array_distinct(
      concat(col("sa"), col("sb")))), 1, k)
    sketch(a, "sa").crossJoin(sketch(b, "sb"))
      .select(col("sa"), col("sb"), merged.as("m"))
      .select(
        size(col("m")).as("_mn"),
        when(size(col("m")) < k, size(col("m")).cast("double"))
          .otherwise(lit((k - 1).toDouble) / element_at(col("m"), k))
          .as("_union"),
        (size(filter(col("m"), x =>
          array_contains(col("sa"), x) && array_contains(col("sb"), x)))
          .cast("double") /
          greatest(size(col("m")), lit(1)).cast("double")).as("_rho"))
      .select(
        round(col("_union"), 6).as("union_est"),
        round(col("_rho") * col("_union"), 6).as("intersect_est"),
        round(col("_rho"), 6).as("jaccard_est"))
  }

  /** Exact heavy hitters (frequency > n/k) found in two bounded
    * passes: a Misra-Gries sketch pass whose per-partition state is
    * ≤ k−1 counters (see [[graft.functions.MisraGriesAggregator]])
    * yields a candidate superset plus the total count in ONE
    * aggregation; a second pass counts only the ≤ k−1 candidates
    * exactly and filters by the true threshold. The result is the
    * exact heavy-hitter set — deterministic even though MG counter
    * values are merge-order-dependent — without ever holding a
    * full-cardinality count table (the naive groupBy would carry one
    * entry per distinct value; stopword discovery over a web corpus
    * has billions).
    */
  def heavyHitters(df: DataFrame, valueCol: String, k: Int): DataFrame = {
    val mg = udaf(new graft.functions.MisraGriesAggregator(k))
    val vals = df.select(col(valueCol).cast("string").as("_v"))
      .where(col("_v").isNotNull)
    val row = vals.agg(mg(col("_v")).as("_cands"), count(lit(1)).as("_n")).head()
    val cands = row.getSeq[String](0)
    val n = row.getLong(1)
    vals.where(col("_v").isin(cands: _*))
      .groupBy(col("_v").as(valueCol))
      .agg(count(lit(1)).as("freq"))
      .where(col("freq") > lit(n.toDouble) / k)
  }

  /** Builds the bit-packed Bloom filter of `dim(keyCol)` — one tiny
    * driver row of numBits/64 longs (see [[graft.functions
    * .BloomFilterAggregator]] for the merge shape).
    */
  def bloomFilterOf(dim: DataFrame, keyCol: String,
      numBits: Int, numHashes: Int): Array[Long] = {
    val spark = dim.sparkSession
    import spark.implicits._
    val agg = new graft.functions.BloomFilterAggregator(numBits, numHashes)
    dim.select(xxhash64(col(keyCol)).as("h")).as[Long]
      .select(agg.toColumn).head()
  }

  /** Bloom membership probe, staying inside whole-stage codegen on
    * the scan via the native [[graft.functions.BloomProbeExpr]]: the
    * bitset rides as a primitive `long[]` codegen reference and each
    * row pays one static-call tight loop with first-clear-bit early
    * exit. (The earlier built-in composition — k× `getbit(element_at(
    * <16384-element array literal>, …))` — walked a boxed array per
    * probe at ~2.6 µs/row; the native probe is the 100 TB posture:
    * once per corpus shingle, nanoseconds each.)
    */
  def bloomMightContain(words: Array[Long], numHashes: Int,
      keyHash: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.functions.BloomProbeExpr(
        org.apache.spark.sql.graftbridge.Bridge.expression(keyHash),
        words, numHashes))

  /** Equi-join with a Bloom-filter pre-filter on the fact side — the
    * manual twin of Spark's runtime bloom-filter join pruning, for
    * when the build side is too big to broadcast but its KEY SET
    * sketches into kilobytes.
    *
    * The filter drops non-matching fact rows at the scan, BEFORE the
    * join shuffle — at 100 TB that is the difference between
    * shuffling the whole fact table and shuffling only the ~matching
    * slice (plus the false-positive tail). False positives are
    * harmless: the real join still decides membership exactly, so the
    * result is identical to the plain join.
    */
  def bloomPrefilterJoin(fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String,
      numBits: Int = 1 << 20, numHashes: Int = 5): DataFrame = {
    val words = bloomFilterOf(dim, dimKey, numBits, numHashes)
    fact.where(bloomMightContain(words, numHashes, xxhash64(col(factKey))))
      .join(dim, col(factKey) === col(dimKey))
  }
}
