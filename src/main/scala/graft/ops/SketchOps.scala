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
}
