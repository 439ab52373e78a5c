package graft.ops

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType, StringType, StructField, StructType}

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
  * Scale shape: the only corpus-sized shuffle is the doc-keyed
  * exchange every Text op pays; scoring joins the model BROADCAST
  * against per-document token counts, adding no token-sized exchange.
  * The model is (features × labels) rows with the feature count
  * ENFORCED ≤ `maxFeatures` (raw web-scale vocabularies grow with the
  * corpus — billions of tokens at 100 TB would kill any driver
  * collect or executor broadcast; the cap cuts to the top-k tokens by
  * corpus frequency, ties to the smaller token, and out-of-cap tokens
  * score through the unseen-token term like any token absent from a
  * class). That enforced bound is what licenses the collect: the
  * class counts come back to the driver in one action, the smoothed
  * log-likelihoods are computed there with the same double arithmetic
  * Catalyst would use, and the finished model re-enters the plan as a
  * LocalRelation whose broadcast costs no job. With vocab ≤
  * maxFeatures the cap is a no-op and results are unchanged.
  *
  * Why this shape: the previous version kept the model distributed
  * and chained five broadcast builds (class totals → vocab → token
  * model → doc counts → priors), every one its own job with its own
  * 32-task stage — ~6 corpus-independent scheduling floors that
  * dominated the wall clock at any scale factor (measured: the same
  * plan on a 10× corpus costs the same). Three jobs remain: the
  * count-table checkpoint, the model collect, the scoring pass.
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
    * prior argmax). Labels are compared and returned as strings
    * (class labels name categories; the string form is canonical
    * across the driver↔executor boundary the model crosses).
    */
  def nbClassify(
      df: DataFrame, idCol: String, labelCol: String, textCol: String,
      maxFeatures: Int = 1 << 18): DataFrame = {
    require(maxFeatures >= 1, "nbClassify: the feature cap must be positive")
    val spark = df.sparkSession
    val d = DecimalType(28, 12)
    // ONE tokenize, ZERO raw-token shuffles: the doc-keyed exchange
    // moves compact (id, label, text) rows, after which the
    // (id, label, len, token) count aggregation is exchange-free
    // (HashPartitioning(id) satisfies any clustering containing id).
    // Carrying label and len through the count rows costs three small
    // columns but eliminates extra corpus passes (a tf⋈labels shuffle
    // join for the class counts and a second tokenize for doc
    // lengths). The checkpoint materializes the compact count table
    // once for its consumers; it is bounded by distinct (doc, token),
    // far below the raw token stream. explode_outer keeps zero-token
    // documents as a single null-token row so they still reach the
    // prior-only argmax.
    val dt = Parallelism.ensureKeyed(
        df.select(col(idCol), col(labelCol), col(textCol)), col(idCol))
      .select(col(idCol), col(labelCol),
        filter(TextOps.tokens(col(textCol)), _ =!= "").as("_arr"))
      .select(col(idCol), col(labelCol),
        size(col("_arr")).cast("long").as("_len"),
        explode_outer(col("_arr")).as("token"))
      .groupBy(col(idCol), col(labelCol), col("_len"), col("token"))
      .agg(count(lit(1)).as("tf"))
      // LAZY: the model collect below is the first action anyway —
      // an eager checkpoint would pay one extra job's scheduling just
      // to materialize blocks that action is about to produce
      .localCheckpoint(false)
    val tok = dt.where(col("token").isNotNull)
    // Model collect, ONE action: class-conditional counts (features ×
    // labels rows, map-side partially aggregated before the model-
    // sized exchange) unioned with per-label document counts. Both
    // branches read the checkpoint blocks — no second corpus pass.
    // The feature cap rides the SAME action as a broadcast top-k
    // subquery (TakeOrderedAndProject over token totals) applied
    // AFTER the class-count aggregation, so the join prunes
    // model-sized rows, not corpus-sized ones, and the driver never
    // sees more than maxFeatures × labels rows. The top-k DERIVES
    // FROM the class-count aggregation (token totals = Σ over labels
    // of the class counts), not from a second scan of the checkpoint
    // count table: the broadcast build's shuffle is then byte-
    // identical to the join side's and ReuseExchange serves both, so
    // the cap's only own work is one vocab×labels-sized aggregation
    // (the r7 sweep billed the cap ~0.4s for re-aggregating the
    // per-doc count table it didn't need).
    val labelAsString = col(labelCol).cast(StringType)
    val classCounts = tok.groupBy(col(labelCol), col("token"))
      .agg(sum(col("tf")).as("c"))
    val keepTokens = classCounts.groupBy(col("token"))
      .agg(sum(col("c")).as("_cf"))
      .orderBy(col("_cf").desc, col("token")).limit(maxFeatures)
      .select(col("token"))
    val modelRows = classCounts
      .join(broadcast(keepTokens), Seq("token"))
      .select(lit("ct").as("_src"), labelAsString.as("_l"), col("token"),
        col("c"))
      .unionByName(dt
        .groupBy(col(labelCol))
        .agg(count_distinct(col(idCol)).as("c"))
        .select(lit("doc").as("_src"), labelAsString.as("_l"),
          lit(null).cast(StringType).as("token"), col("c")))
      .collect()
    // driver-side model math — same double arithmetic Catalyst's
    // log/division expressions evaluate, on the same inputs, so the
    // scores are bit-identical to the previous distributed build
    val ctRows = modelRows.filter(_.getString(0) == "ct")
    val tByLabel = ctRows.groupBy(_.getString(1))
      .map { case (l, rs) => l -> rs.map(_.getLong(3)).sum }
    val vocabV = ctRows.map(_.getString(2)).distinct.length.toDouble
    val nlRows = modelRows.filter(_.getString(0) == "doc")
    val nDocs = nlRows.map(_.getLong(3)).sum.toDouble
    val tokenModelRows: Seq[Row] = ctRows.toSeq.map { r =>
      val tl = tByLabel(r.getString(1))
      Row(r.getString(1), r.getString(2),
        math.log((r.getLong(3) + 1).toDouble / (tl + vocabV)))
    }
    val labelModelRows: Seq[Row] = nlRows.toSeq.map { r =>
      val l = r.getString(1)
      val tl = tByLabel.getOrElse(l, 0L)
      Row(l,
        math.log(r.getLong(3).toDouble / nDocs),
        math.log(1.0 / (tl + vocabV)))
    }
    // ---- scoring: ONE corpus-side pass. The model is driver-held
    // and bounded (≤ maxFeatures × labels), so it re-enters the plan
    // WIDE — one LocalRelation row per vocabulary token, one loglik
    // column per label (null = unseen in that class) — and scoring
    // is a single left broadcast join plus ONE id-keyed aggregation
    // (per-label matched mass and matched count as 2·k sum columns,
    // doc length riding as max). Priors and unknown-token masses are
    // per-label LITERALS, and the argmax is array_min over
    // (-score, label) structs — pure projection. The previous shape
    // (per-(doc,label) matched ⋈ label table ⋈ doc table + min_by)
    // scanned the checkpoint twice and ran six shuffles plus a
    // two-stage sort-aggregate: under AQE the checkpoint loses its
    // id partitioning (the unexecuted adaptive plan reports
    // UnknownPartitioning, so LogicalRDD records none), making every
    // one of those shuffles real.
    // (the 12-dp matched mass stays on the decimal accumulator: an
    // int128 rescale would round c·10¹² in double, which is lossy
    // past 2^53 — the decimal cast is what keeps the oracle bit-equal)
    val labels = nlRows.map(_.getString(1)).toSeq.sorted
    if (labels.isEmpty)
      return df.select(col(idCol), lit(null).cast(StringType).as("pred"),
        lit(null).cast(DoubleType).as("score")).where(lit(false))
    val wideSchema = StructType(StructField("token", StringType) +:
      labels.indices.map(i => StructField(s"_ll$i", DoubleType)))
    val wideRows: Seq[Row] = tokenModelRows.groupBy(_.getString(1)).toSeq
      .sortBy(_._1).map { case (tokn, rs) =>
        val m = rs.map(r => r.getString(0) -> r.getDouble(2)).toMap
        Row.fromSeq(tokn +: labels.map(l =>
          m.get(l).map(java.lang.Double.valueOf).orNull))
      }
    val wideModel = spark.createDataFrame(wideRows.asJava, wideSchema)
    val priorUnk: Map[String, (Double, Double)] = labelModelRows
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val joined = dt.join(broadcast(wideModel), Seq("token"), "left")
    val msCols = labels.indices.map { i =>
      sum((col("tf") * coalesce(col(s"_ll$i"), lit(0.0))).cast(d)).as(s"_ms$i")
    }
    val mtCols = labels.indices.map { i =>
      sum(when(col(s"_ll$i").isNotNull, col("tf")).otherwise(lit(0L)))
        .as(s"_mt$i")
    }
    val aggCols = (msCols ++ mtCols :+ max(col("_len")).as("_dlen")).toSeq
    val g = joined.groupBy(col(idCol)).agg(aggCols.head, aggCols.tail: _*)
    val scoreCols = labels.zipWithIndex.map { case (l, i) =>
      val (prior, unk) = priorUnk(l)
      round(lit(prior) + coalesce(col(s"_ms$i").cast(DoubleType), lit(0.0)) +
        (col("_dlen") - col(s"_mt$i")) * lit(unk), 6).as(s"_sc$i")
    }
    val scoredDocs = g.select((col(idCol) +: scoreCols): _*)
    // array_min over (s = −score, l) structs = "max score, ties to
    // the smallest label" — the same contract min_by had, but as a
    // projection on the one aggregated row per doc
    val best = array_min(array(labels.zipWithIndex.map { case (l, i) =>
      struct((-col(s"_sc$i")).as("s"), lit(l).as("l"))
    }: _*))
    scoredDocs.select(col(idCol), best.getField("l").as("pred"),
      (-best.getField("s")).as("score"))
  }

  /** Binary logistic regression over bag-of-words features, trained
    * by full-batch gradient descent and scored in the same plan —
    * the iterative-trainer counterpart to [[nbClassify]]'s one-pass
    * model, and the shape of the linear quality classifiers real
    * training-data pipelines run (label a seed set, fit, gate the
    * corpus).
    *
    * Topology per step is ONE job: the current weights enter as a
    * broadcast LocalRelation, the doc-keyed partitioning carries
    * z-sums, sigmoid residuals and the join back to the token counts
    * without an exchange, and the collected gradient is bounded by
    * `maxFeatures` whatever the corpus. Driver state is the
    * (token → weight) map + bias — the bounded trainer-state pattern,
    * with the bound ENFORCED: raw web-scale vocabularies grow with
    * the corpus (billions of tokens at 100 TB), so the feature space
    * is cut to the top-`maxFeatures` tokens by corpus frequency
    * (ties to the lexicographically smaller token) INSIDE the step-1
    * gradient action — the driver never materializes more than the
    * cap, and later steps restrict the gradient to the fixed feature
    * set before aggregating. With vocab ≤ maxFeatures the cap is a
    * no-op and results are unchanged.
    *
    * Engine-exact contract: z-sums and gradients accumulate as
    * DECIMAL(28,12) (order-independent); probabilities round to
    * 12 dp after the sigmoid; weight updates round to 12 dp
    * (`w − lr·(g/N)` evaluated in that exact association). The only
    * libm call is exp(), whose cross-engine agreement the corpus
    * already demonstrates for ln() at thousands of sites (q145).
    *
    * `labelCol` must be numeric 0/1. Output: (idCol, prob, pred) —
    * the 6-dp positive-class probability and the 0/1 argmax at the
    * 0.5 threshold, ordered by nothing (caller sorts).
    */
  def logregTrainScore(
      df: DataFrame, idCol: String, labelCol: String, textCol: String,
      steps: Int = 2, lr: Double = 0.5,
      maxFeatures: Int = 1 << 18): DataFrame = {
    require(steps >= 1, "logreg: at least one gradient step")
    require(maxFeatures >= 1, "logreg: the feature cap must be positive")
    val spark = df.sparkSession
    val d = DecimalType(28, 12)
    // LAZY checkpoint: the step-1 gradient is the first action anyway
    // — an eager checkpoint would pay a whole extra corpus job just to
    // materialize blocks that action is about to produce
    val dt = Parallelism.ensureKeyed(
        df.select(col(idCol), col(labelCol).cast(DoubleType).as("_y"),
          col(textCol)), col(idCol))
      .select(col(idCol), col("_y"),
        explode_outer(filter(TextOps.tokens(col(textCol)), _ =!= ""))
          .as("token"))
      .groupBy(col(idCol), col("_y"), col("token"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint(false)
    val tok = dt.where(col("token").isNotNull)

    def round12(x: Double): Double =
      BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    val wSchema = StructType(Seq(
      StructField("token", StringType), StructField("_w", DoubleType)))
    def wRelation(w: Map[String, Double]): DataFrame =
      spark.createDataFrame(
        w.toSeq.sortBy(_._1).map { case (t, v) => Row(t, v): Row }.asJava,
        wSchema)

    // p(doc) under (weights, bias): LEFT broadcast weight join over
    // the whole count table, then ONE id-keyed aggregation carrying
    // the z-sum AND the label — no separate doc table, no doc⋈z-sum
    // join. Unmatched and null-token rows contribute exact decimal
    // zeros to the z-sum, so docs without matched tokens (incl.
    // zero-token docs) score at sigmoid(bias) as before, bit for
    // bit. Under AQE the checkpoint loses its id partitioning
    // (UnknownPartitioning on the unexecuted adaptive plan), so the
    // old docs-distinct + left-join shape re-shuffled three times
    // per step where this shuffles once. With no weights yet
    // (step 1) the join side is empty and the chain folds to the
    // constant-probability aggregation.
    def scored(w: Map[String, Double], b: Double): DataFrame = {
      val joined =
        if (w.isEmpty)
          dt.select(col(idCol), col("_y"),
            lit(null).cast(DoubleType).as("_w"), col("tf"))
        else
          dt.join(broadcast(wRelation(w)), Seq("token"), "left")
            .select(col(idCol), col("_y"), col("_w"), col("tf"))
      joined.groupBy(col(idCol))
        .agg(max(col("_y")).as("_y"),
          sum((col("tf") * coalesce(col("_w"), lit(0.0))).cast(d)).as("_zs"))
        .select(col(idCol), col("_y"),
          round(lit(1.0) / (lit(1.0) +
            exp(-(lit(b) + coalesce(col("_zs").cast(DoubleType), lit(0.0))))),
            12).as("_p"))
    }

    var w = Map.empty[String, Double]
    var b = 0.0
    var step = 0
    var nDocs = 0.0
    while (step < steps) {
      // one action per step: per-token gradient rows ∪ the
      // (bias gradient, N) row — the residual join stays on the id
      // partitioning and the collect is bounded by maxFeatures
      val gRows = if (w.isEmpty) {
        // step 1: the score is the CONSTANT sigmoid(b), so the
        // per-token residual is a pure function of tok's own label —
        // no doc-keyed join — and the FEATURE CAP fuses into the same
        // action: order the per-token rows by corpus frequency and
        // cut to maxFeatures before they reach the driver
        // (TakeOrderedAndProject: top-k per partition, k-row merge)
        val p0 = round12(1.0 / (1.0 + math.exp(-b)))
        tok.groupBy(col("token"))
          .agg(sum(col("tf")).as("_cf"),
            sum(((lit(p0) - col("_y")) * col("tf")).cast(d)).as("_g"))
          .orderBy(col("_cf").desc, col("token")).limit(maxFeatures)
          .select(col("token"), col("_g"), lit(0L).as("_n"))
          .unionByName(scored(w, b).agg(
              sum((lit(p0) - col("_y")).cast(d)).as("_g"),
              count(lit(1)).as("_n"))
            .select(lit(null).cast(StringType).as("token"), col("_g"),
              col("_n")))
          .collect()
      } else {
        // steps 2+: the feature set is FIXED (the weight map's keys,
        // already ≤ maxFeatures), so the gradient restricts to it
        // BEFORE aggregating — out-of-cap tokens never reach the
        // collect. The score subplan is NOT checkpointed: both union
        // branches re-read dt's materialized blocks through one
        // broadcast join, which costs less than the extra doc-sized
        // checkpoint JOB a shared materialization would schedule
        // (measured on q156: 3 actions total vs 5, ~0.4s saved at
        // sf0.1; at cluster scale the saving is a whole stage round)
        val sc = scored(w, b)
        val tokResid = tok
          .join(broadcast(wRelation(w).select(col("token"))), Seq("token"))
          .join(sc.select(col(idCol), (col("_p") - col("_y")).as("_r")),
            Seq(idCol))
        tokResid
          .groupBy(col("token"))
          .agg(sum((col("_r") * col("tf")).cast(d)).as("_g"),
            lit(0L).as("_n"))
          .unionByName(sc.agg(
              sum((col("_p") - col("_y")).cast(d)).as("_g"),
              count(lit(1)).as("_n"))
            .select(lit(null).cast(StringType).as("token"), col("_g"),
              col("_n")))
          .collect()
      }
      val bias = gRows.find(_.isNullAt(0)).get
      nDocs = bias.getLong(2).toDouble
      if (nDocs == 0)
        return scored(w, b).select(col(idCol),
          round(col("_p"), 6).as("prob"),
          when(col("_p") >= 0.5, 1).otherwise(0).as("pred"))
      b = round12(b - lr * (bias.getDecimal(1).doubleValue / nDocs))
      w = gRows.filter(!_.isNullAt(0)).map { r =>
        val t = r.getString(0)
        t -> round12(w.getOrElse(t, 0.0) -
          lr * (r.getDecimal(1).doubleValue / nDocs))
      }.toMap
      step += 1
    }
    scored(w, b).select(col(idCol), round(col("_p"), 6).as("prob"),
      when(col("_p") >= 0.5, 1).otherwise(0).as("pred"))
  }

  /** Token–label mutual information — the feature-selection step in
    * front of [[nbClassify]]/[[logregTrainScore]]: which tokens carry
    * signal about a binary label. MI over the 2×2 presence/label
    * contingency table, 0·ln0 = 0 by convention.
    *
    * One corpus pass: `array_distinct` collapses within-document
    * repeats BEFORE the explode (per-doc presence needs no distinct
    * shuffle), one token-keyed exchange aggregates the table's two
    * free cells, the (N, N₁) totals broadcast as a 1-row aggregate,
    * and the output is vocab-sized before the top-k cut. All counts
    * are exact integers in doubles, the four MI terms sum in fixed
    * order, so the 6-dp score is engine-identical (ln parity per
    * q145/q156).
    *
    * Returns the `topK` tokens by (mi DESC, token): (token, df_docs,
    * mi). `labelCol` must be numeric 0/1.
    */
  def tokenMI(df: DataFrame, idCol: String, labelCol: String,
      textCol: String, topK: Int): DataFrame = {
    val presence = Parallelism.ensureKeyed(
        df.select(col(idCol), col(labelCol).cast("int").as("_y"),
          col(textCol)), col(idCol))
      .select(col("_y"),
        explode(array_distinct(filter(TextOps.tokens(col(textCol)),
          x => x =!= ""))).as("token"))
    val totals = df.agg(
      count(lit(1)).cast(DoubleType).as("_N"),
      sum(col(labelCol).cast("long")).cast(DoubleType).as("_N1"))
    val cells = presence.groupBy(col("token"))
      .agg(sum(when(col("_y") === 1, 1).otherwise(0)).cast(DoubleType)
          .as("_n11"),
        sum(when(col("_y") === 0, 1).otherwise(0)).cast(DoubleType)
          .as("_n10"))
      .crossJoin(broadcast(totals))
    def term(n: Column, rowTot: Column, colTot: Column): Column =
      when(n > 0, (n / col("_N")) *
        log((col("_N") * n) / (rowTot * colTot))).otherwise(lit(0.0))
    val nt = col("_n11") + col("_n10")
    val nnt = col("_N") - nt
    val n0 = col("_N") - col("_N1")
    cells.select(col("token"), nt.cast("long").as("df_docs"),
        round(
          term(col("_n11"), nt, col("_N1")) +
            term(col("_n10"), nt, n0) +
            term(col("_N1") - col("_n11"), nnt, col("_N1")) +
            term(n0 - col("_n10"), nnt, n0), 6).as("mi"))
      .orderBy(col("mi").desc, col("token"))
      .limit(topK)
  }

  /** Probability-calibration report — the companion to [[evalReport]]
    * for SCORED classifiers: equal-width probability bins, each with
    * its count, mean predicted probability, observed positive rate,
    * and |gap|, plus the expected calibration error (the bin-weighted
    * gap sum — the one number that says whether a quality
    * classifier's 0.9 means 90%). Bin-sized aggregates only; the ECE
    * rides a 1-row cross join (the corpus-stat idiom). Rounding
    * discipline: mean/rate round to 6 dp and the gap/ECE compute FROM
    * the rounded values, so the report is engine-exact.
    */
  def calibrationReport(df: DataFrame, probCol: String,
      labelCol: String, bins: Int = 10): DataFrame = {
    val bin = least(floor(col(probCol) * bins).cast("int"), lit(bins - 1))
    val perBin = df.select(bin.as("bin"), col(probCol).as("p"),
        col(labelCol).cast("double").as("y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("p").cast(DecimalType(28, 12))).cast("double") /
          count(lit(1)), 6).as("mean_pred"),
        round(sum(col("y").cast(DecimalType(28, 12))).cast("double") /
          count(lit(1)), 6).as("obs_rate"))
      .withColumn("abs_gap",
        round(abs(col("mean_pred") - col("obs_rate")), 6))
    val ece = broadcast(perBin.groupBy()
      .agg(round(
        sum((col("n").cast("double") * col("abs_gap"))
          .cast(DecimalType(28, 12))).cast("double") / sum(col("n")), 6)
        .as("ece")))
    perBin.crossJoin(ece)
  }

  /** Operating-point sweep for a scored binary classifier: one row
    * per candidate threshold with the full confusion (tp/fp/fn/tn),
    * precision, recall and F1 — how a pipeline actually CHOOSES its
    * gate threshold. The scale shape is histogram-first: probabilities
    * floor-bin to 1e-3 (exact for any threshold that is a multiple of
    * 0.001 — `p >= t ⟺ floor(p·1000) >= t·1000`), the corpus reduces
    * to ≤ 2·1001 (bin, label) cells in ONE pass, and the sweep is
    * arithmetic over that bounded table × the threshold list — adding
    * thresholds costs nothing more from the data. Zero-denominator
    * points go NULL (the [[evalReport]] discipline); F1 computes from
    * the 6 dp-rounded P/R so the report is engine-exact.
    */
  def thresholdSweep(df: DataFrame, probCol: String, labelCol: String,
      thresholds: Seq[Double]): DataFrame = {
    require(thresholds.forall(t =>
        math.abs(t * 1000 - math.round(t * 1000)) < 1e-6),
      "thresholds must be multiples of 0.001 (the histogram grain)")
    val cells = df.select(
        floor(col(probCol) * 1000).cast("int").as("pbin"),
        col(labelCol).cast("int").as("y"))
      .groupBy(col("pbin"), col("y")).agg(count(lit(1)).as("n"))
    val sweep = cells.select(col("*"),
      explode(typedLit(thresholds.sorted)).as("t"))
    // ROUND before the int cast: 0.3*1000 is 299.99999… in doubles,
    // and a truncating cast would shift the bin edge (engines also
    // disagree on double→int casts — truncate vs round)
    val tb = round(col("t") * 1000).cast("int")
    def cnt(cond: org.apache.spark.sql.Column) =
      coalesce(sum(when(cond, col("n"))), lit(0L))
    val conf = sweep.groupBy(col("t"))
      .agg(cnt(col("pbin") >= tb && col("y") === 1).as("tp"),
        cnt(col("pbin") >= tb && col("y") === 0).as("fp"),
        cnt(col("pbin") < tb && col("y") === 1).as("fn"),
        cnt(col("pbin") < tb && col("y") === 0).as("tn"))
    val p = col("precision"); val r = col("recall")
    conf
      .withColumn("precision", when(col("tp") + col("fp") === 0, lit(null))
        .otherwise(round(col("tp").cast("double") / (col("tp") + col("fp")), 6)))
      .withColumn("recall", when(col("tp") + col("fn") === 0, lit(null))
        .otherwise(round(col("tp").cast("double") / (col("tp") + col("fn")), 6)))
      .withColumn("f1", when(p.isNull || r.isNull || (p + r === 0), lit(null))
        .otherwise(round(lit(2.0) * p * r / (p + r), 6)))
      .select(round(col("t"), 6).as("threshold"), col("tp"), col("fp"),
        col("fn"), col("tn"), p, r, col("f1"))
  }

  /** Classifier evaluation report: per-class precision / recall / F1
    * from (gold label, predicted label) pairs — the measurement half
    * of the classifier stack (a quality gate is only as good as its
    * measured precision on held-out labels). The class set is the
    * UNION of gold and predicted values (a class the model invents,
    * like `unknown`, shows up with n_true = 0 rather than vanishing).
    *
    * One (label, pred) count aggregation — confusion-matrix-sized,
    * tiny whatever the corpus — then class-keyed re-aggregations and
    * a full-outer stitch, all on catalog-sized frames. Ratios are
    * single IEEE divisions of exact integers (engine-identical),
    * F1 computed FROM the 6-dp-rounded precision/recall so both
    * engines see the same operands; zero-denominator cells are NULL,
    * not 0 (absence of evidence, not a zero score).
    */
  def evalReport(df: DataFrame, labelCol: String, predCol: String): DataFrame = {
    val cells = df
      .select(col(labelCol).as("_label"), col(predCol).as("_pred"))
      .groupBy(col("_label"), col("_pred")).agg(count(lit(1)).as("_n"))
    val byTrue = cells.groupBy(col("_label").as("cls"))
      .agg(sum(col("_n")).as("n_true"))
    val byPred = cells.groupBy(col("_pred").as("cls"))
      .agg(sum(col("_n")).as("n_pred"))
    val tp = cells.where(col("_label") === col("_pred"))
      .select(col("_label").as("cls"), col("_n").as("_tp"))
    val p = col("precision")
    val r = col("recall")
    byTrue.join(byPred, Seq("cls"), "full")
      .join(tp, Seq("cls"), "left")
      .select(col("cls"),
        coalesce(col("n_true"), lit(0L)).as("n_true"),
        coalesce(col("n_pred"), lit(0L)).as("n_pred"),
        coalesce(col("_tp"), lit(0L)).as("tp"))
      .withColumn("precision",
        when(col("n_pred") > 0,
          round(col("tp").cast(DoubleType) / col("n_pred"), 6)))
      .withColumn("recall",
        when(col("n_true") > 0,
          round(col("tp").cast(DoubleType) / col("n_true"), 6)))
      .withColumn("f1",
        when(p.isNotNull && r.isNotNull && (p + r) > 0,
          round(lit(2.0) * p * r / (p + r), 6)))
  }
}
