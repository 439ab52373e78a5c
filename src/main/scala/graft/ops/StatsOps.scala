package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Feature-statistics operators for training pipelines. */
object StatsOps {

  /** Per-group Pearson correlation of two columns, by the same
    * decimal-exact-sums recipe as [[zscore]]: the five sufficient
    * statistics (n, Σx, Σy, Σx², Σy², Σxy) accumulate exactly and
    * order-independently; the closed-form correlation is then a fixed
    * sequence of IEEE operations, reproducible in any engine (unlike
    * built-in `corr`, whose double accumulation is partitioning-
    * dependent). */
  def pearson(df: DataFrame, groupCol: String, x: Column, y: Column): DataFrame = {
    val d = DecimalType(28, 8)
    // pairwise deletion: a row contributes only when both are present
    df.where(x.isNotNull && y.isNotNull)
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).cast(DoubleType).as("_n"),
        sum(x.cast(d)).cast(DoubleType).as("_sx"),
        sum(y.cast(d)).cast(DoubleType).as("_sy"),
        sum((x * x).cast(d)).cast(DoubleType).as("_sxx"),
        sum((y * y).cast(d)).cast(DoubleType).as("_syy"),
        sum((x * y).cast(d)).cast(DoubleType).as("_sxy"))
      .select(col(groupCol),
        ((col("_n") * col("_sxy") - col("_sx") * col("_sy")) /
          (sqrt(col("_n") * col("_sxx") - col("_sx") * col("_sx")) *
            sqrt(col("_n") * col("_syy") - col("_sy") * col("_sy"))))
          .as("corr"))
  }

  /** Per-group z-score standardization: z = (x − mean) / stddev with
    * population variance, appended as `zscore`.
    *
    * The group statistics accumulate in DECIMAL (sum and sum of
    * squares), not double: decimal addition is exact and
    * order-independent, so partial aggregation across any
    * partitioning yields bit-identical statistics — the same recipe
    * as the oracle-checked revenue sums. The only floating-point
    * steps are the final divisions, identical IEEE operations in any
    * engine. Zero-variance groups get zscore 0.
    *
    * One aggregation (map-side partial) + one broadcast join back —
    * group cardinality is the broadcast bound, not data size.
    */
  def zscore(df: DataFrame, groupCol: String, valueCol: Column): DataFrame = {
    val stats = df.groupBy(col(groupCol))
      .agg(
        count(valueCol).as("_n"), // non-null count, consistent with the null-skipping sums
        sum(valueCol.cast(DecimalType(28, 8))).cast(DoubleType).as("_sum"),
        sum((valueCol * valueCol).cast(DecimalType(28, 8))).cast(DoubleType).as("_sumsq"))
      .select(col(groupCol),
        (col("_sum") / col("_n")).as("_mean"),
        sqrt((col("_sumsq") / col("_n")) -
          (col("_sum") / col("_n")) * (col("_sum") / col("_n"))).as("_std"))
    df.join(broadcast(stats), groupCol)
      .withColumn("zscore",
        when(col("_std") === 0.0 || col("_std").isNaN, 0.0)
          .otherwise((valueCol.cast("double") - col("_mean")) / col("_std")))
      .drop("_mean", "_std")
  }
}
