package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The end-to-end training-data curation pipeline as ONE Spark plan —
  * the composition every web-scale corpus actually runs (RefinedWeb /
  * Gopher A1.1 shape): canonicalize → quality-gate → exact-dedup →
  * decontaminate → budget-sample, each stage an operator this library
  * already ships, chained so Catalyst sees the whole thing at once.
  *
  * Why one plan matters at 100 TB: the gate and the sample are pure
  * map-side filters, so they prune BEFORE every expensive stage that
  * follows them — the dedup window and the decontamination shingle
  * join only ever see gate survivors, and nothing is materialized
  * between stages. Shuffle profile: one fingerprint exchange for the
  * keep-first window, the shingle join's exchanges on the (already
  * pruned) corpus, and the final anti-join — exactly the stages'
  * intrinsic costs, no inter-stage barriers.
  *
  * Stage order is the cheap-filter-first rule: the Gopher gate (pure
  * arithmetic) runs before the dedup shuffle, and dedup (one window)
  * runs before decontamination (the only explode). The deterministic
  * md5-threshold sample runs LAST because a sampled-out duplicate
  * must not change which copy of a cluster survives, and a
  * sampled-out contaminated doc must still not reappear — semantics
  * first, then cost.
  */
object CurationOps {

  /** Run the pipeline over `corpus`, decontaminating against
    * `testSet`. Returns the surviving rows of `corpus` plus
    * `n_tokens` (whitespace tokens of the NFC-normalized text).
    *
    * `sampleThresholdHex` keeps rows whose `md5(id)` hex string sorts
    * below it — "c" ≈ 75%, "" keeps nothing, "g" keeps all; the
    * lexicographic-compare form is engine-portable by construction.
    */
  def curate(corpus: DataFrame, testSet: DataFrame,
      idCol: String, textCol: String,
      minWords: Int = 20, maxWords: Int = 100000,
      minMeanLen: Double = 2.0, maxMeanLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1, minAlphaFrac: Double = 0.8,
      minStopwords: Int = 1, shingleSize: Int = 5,
      sampleThresholdHex: String = "c"): DataFrame = {
    val id = col(idCol)
    // 1. canonicalize: every later equality (fingerprint, shingles)
    //    sees one byte form per visible string
    def normalized(df: DataFrame): DataFrame =
      df.withColumn("_norm", graft.functions.NfcNormalize(col(textCol)))
    // 2. quality gate — map-side arithmetic, prunes before any shuffle
    val gated = normalized(corpus).where(
      TextOps.gopherKeep(col("_norm"), minWords, maxWords, minMeanLen,
        maxMeanLen, maxSymbolRatio, minAlphaFrac, minStopwords) === 1)
    // 3. exact dedup, keep-first: one fingerprint exchange
    val w = Window.partitionBy(col("_fp")).orderBy(id)
    val deduped = gated
      .withColumn("_fp", TextOps.normalizedFingerprint(col("_norm")))
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1).drop("_fp", "_rn")
    // 4. decontaminate the survivors against the eval set's shingles
    val clean = DedupOps.decontaminate(
      deduped, normalized(testSet), idCol, "_norm", shingleSize)
    // 5. deterministic budget sample + token accounting
    clean
      .where(md5(id.cast("string")) < lit(sampleThresholdHex))
      .withColumn("n_tokens",
        size(filter(TextOps.tokens(col("_norm")), x => x =!= ""))
          .cast("long"))
      .drop("_norm")
  }
}
