package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Supervised text classification as pure dataflow: training a
  * multinomial Naive Bayes model is ONE aggregation pass over the
  * labeled corpus (token counts → smoothed log-likelihoods), and
  * inference is a join of that model against per-document token
  * counts. No separate training system, no mutable state — the model
  * is a DataFrame, versioned and reproducible like any other derived
  * table. This is the quality/language-filter classifier shape of a
  * training-data pipeline (label a seed set, train, score the full
  * corpus).
  *
  * Scale shape: the only corpus-sized shuffles are the keyed (doc,
  * token) count every Text op pays and the |docs|×|labels| score
  * join. The model is (vocab × labels) rows, corpus-size-independent
  * — it broadcasts while the corpus streams past, so scoring adds no
  * token-sized exchange.
  *
  * Numeric reproducibility follows the repo's estimator contract
  * (see [[TextOps.unigramLogProb]]): per-token contributions sum as
  * DECIMAL(28,12) — order-independent under any partitioning — and
  * the argmax ranks the score's 6-dp rounding with the label as
  * tie-break, so a last-ulp libm difference between engines cannot
  * flip a prediction.
  */
object ClassifierOps {

  /** Train a multinomial NB model on (labelCol, textCol) and score
    * every document with its argmax label in the same plan.
    *
    * Laplace-smoothed: P(t|l) = (c_lt + 1) / (T_l + V) where c_lt is
    * the token's count in class l, T_l the class token total, V the
    * corpus vocabulary size; tokens unseen in class l contribute
    * ln(1/(T_l+V)) each. Priors are document-count fractions.
    * Output: (idCol, pred, score) — the winning joint log-likelihood
    * rounded to 6 dp. Zero-token documents still classify (pure
    * prior argmax).
    */
  def nbClassify(
      df: DataFrame, idCol: String, labelCol: String, textCol: String)
      : DataFrame = {
    val d = DecimalType(28, 12)
    // ONE tokenize, ZERO raw-token shuffles: the doc-keyed exchange
    // moves compact (id, label, text) rows, after which the
    // (id, label, len, token) count aggregation is exchange-free
    // (HashPartitioning(id) satisfies any clustering containing id).
    // Carrying label and len through the count rows costs three small
    // columns but eliminates BOTH extra corpus passes the previous
    // shape paid (a tf⋈labels shuffle join for the class counts and a
    // second tokenize for doc lengths). The checkpoint materializes
    // the compact count table once for its four consumers (tf, class
    // counts, doc table, lengths); it is bounded by distinct
    // (doc, token), far below the raw token stream. explode_outer
    // keeps zero-token documents as a single null-token row so they
    // still reach the prior-only argmax.
    val dt = Parallelism.ensureKeyed(
        df.select(col(idCol), col(labelCol), col(textCol)), col(idCol))
      .select(col(idCol), col(labelCol),
        filter(TextOps.tokens(col(textCol)), _ =!= "").as("_arr"))
      .select(col(idCol), col(labelCol),
        size(col("_arr")).cast("long").as("_len"),
        explode_outer(col("_arr")).as("token"))
      .groupBy(col(idCol), col(labelCol), col("_len"), col("token"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val tok = dt.where(col("token").isNotNull)
    val tf = tok.select(col(idCol), col("token"), col("tf"))
    // class-conditional counts: label is already on the count rows —
    // the shuffle is vocab×labels after map-side partial aggregation
    val ct = tok.groupBy(col(labelCol), col("token"))
      .agg(sum(col("tf")).as("c"))
    // one row per document (id is unique): label + length without
    // touching the corpus again
    val docs = dt.select(col(idCol), col(labelCol), col("_len")).distinct()
    // model-sized aggregates: class token totals (|labels| rows),
    // vocabulary size (1 row), doc counts (|labels| rows)
    val tl = ct.groupBy(col(labelCol)).agg(sum(col("c")).as("T"))
    val vocab = ct.select(col("token")).distinct()
      .agg(count(lit(1)).cast("double").as("V"))
    val tokenModel = ct.join(broadcast(tl), Seq(labelCol))
      .crossJoin(broadcast(vocab))
      .select(col(labelCol).as("_l"), col("token"),
        log((col("c") + 1).cast("double") / (col("T") + col("V")))
          .as("loglik"))
    val labelModel = {
      val nl = docs.groupBy(col(labelCol)).agg(count(lit(1)).as("nl"))
      val n = docs.agg(count(lit(1)).cast("double").as("n"))
      // left join + coalesce: a label whose documents are all empty
      // has no ct rows but still needs a prior and an unseen weight
      nl.join(broadcast(tl), Seq(labelCol), "left")
        .crossJoin(broadcast(n))
        .crossJoin(broadcast(vocab))
        .select(col(labelCol).as("_l"),
          log(col("nl").cast("double") / col("n")).as("prior"),
          log(lit(1.0) / (coalesce(col("T"), lit(0L)) + col("V"))).as("unk"))
    }
    // per-(doc, label) matched mass: the doc's tokens that exist in
    // the class vocabulary. Model side broadcasts at any corpus
    // scale; the aggregation stays on the id-hash partitioning.
    // (the 12-dp matched mass stays on the decimal accumulator: an
    // int128 rescale would round c·10¹² in double, which is lossy
    // past 2^53 — the decimal cast is what keeps the oracle bit-equal)
    val matched = tf
      .join(broadcast(tokenModel), Seq("token"))
      .groupBy(col(idCol), col("_l"))
      .agg(sum((col("tf") * col("loglik")).cast(d)).as("msum"),
        sum(col("tf")).as("mtf"))
    val docLen = docs.select(col(idCol), col("_len").as("len"))
    val scores = docLen
      .crossJoin(broadcast(labelModel))
      .join(matched, Seq(idCol, "_l"), "left")
      .select(col(idCol), col("_l"),
        round(col("prior") +
          coalesce(col("msum").cast("double"), lit(0.0)) +
          (col("len") - coalesce(col("mtf"), lit(0L))) * col("unk"),
          6).as("score"))
    // argmax as an aggregation, not a rank window: min_by on the
    // (-score, label) struct is exactly "max score, ties to the
    // smallest label", runs map-side-combinable on the existing id
    // partitioning, and skips the window's per-partition sort
    scores
      .groupBy(col(idCol))
      .agg(min_by(struct(col("_l").as("pred"), col("score")),
        struct((-col("score")).as("s"), col("_l").as("l"))).as("_best"))
      .select(col(idCol), col("_best.pred").as("pred"),
        col("_best.score").as("score"))
  }
}
