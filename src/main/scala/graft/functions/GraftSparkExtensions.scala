package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** Session extension wiring for graft's native expressions.
  *
  * Production path: `spark.sql.extensions=graft.functions.GraftSparkExtensions`
  * (or `.withExtensions(new GraftSparkExtensions)`) makes
  * `vector_dot` / `vector_cosine` available to plain SQL on every
  * session of the cluster.
  *
  * [[GraftSparkExtensions.register]] does the same on an
  * already-built session (tests, notebooks).
  */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    VectorExpressions.functions.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => graft.plans.VectorFoldRewrite)
    ext.injectOptimizerRule(_ => graft.plans.LevenshteinThresholdRewrite)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}

object GraftSparkExtensions {
  def register(spark: SparkSession): Unit = {
    VectorExpressions.functions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
    // sessionState is already built here, so the optimizer rule goes
    // through the experimental-methods escape hatch instead of
    // injectOptimizerRule (which only works pre-build)
    val rules = Seq(graft.plans.VectorFoldRewrite,
      graft.plans.LevenshteinThresholdRewrite)
    val missing = rules.filterNot(spark.experimental.extraOptimizations.contains)
    if (missing.nonEmpty)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations ++ missing
    if (!spark.experimental.extraStrategies.contains(graft.plans.AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.AsOfJoinStrategy
  }
}
