package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Feature-statistics operators for training pipelines. */
object StatsOps {

  /** Per-group Pearson correlation of two columns, by the same
    * decimal-exact-sums recipe as [[zscore]]: the five sufficient
    * statistics (n, Σx, Σy, Σx², Σy², Σxy) accumulate exactly and
    * order-independently; the closed-form correlation is then a fixed
    * sequence of IEEE operations, reproducible in any engine (unlike
    * built-in `corr`, whose double accumulation is partitioning-
    * dependent). */
  /** Per-group Pearson correlation via Spark's native `corr` — a
    * codegen one-pass central-moment aggregator (numerically stable
    * co-moment update, mergeable partials, no decimal boxing). For a
    * statistical ESTIMATOR this is the 100 TB plan: the decimal-exact
    * sum-of-products variant below ([[pearsonExact]]) pays ~4x in
    * BigDecimal arithmetic to make a quantity that is itself an
    * estimate bit-reproducible — warranted for accounting sums, not
    * for correlations consumed at fixed precision.
    */
  def pearson(df: DataFrame, groupCol: String, x: Column, y: Column): DataFrame =
    df.where(x.isNotNull && y.isNotNull)
      .groupBy(col(groupCol))
      // covar/stddev·stddev rather than corr(): under ANSI mode (the
      // Spark 4 default) corr's internal divide THROWS on a
      // zero-variance group; try_divide surfaces the undefined
      // correlation as NULL — same stable moment aggregators either way
      .agg(try_divide(covar_samp(x, y), stddev_samp(x) * stddev_samp(y)).as("corr"))

  /** Decimal-exact Pearson: five order-independent DECIMAL(28,8) sums
    * then one double-precision combine — bit-reproducible under any
    * partitioning, at the cost of byte-array decimal accumulators. */
  def pearsonExact(df: DataFrame, groupCol: String, x: Column, y: Column): DataFrame = {
    val d = DecimalType(28, 8)
    // pairwise deletion: a row contributes only when both are present.
    // The parallelism guard matters here: five decimal sums per row is
    // CPU-dense, and a single-row-group parquet file would otherwise
    // run the whole partial aggregation on one core (no-op at
    // production scale where the scan has thousands of splits).
    Parallelism.ensure(df.where(x.isNotNull && y.isNotNull))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).cast(DoubleType).as("_n"),
        sum(x.cast(d)).cast(DoubleType).as("_sx"),
        sum(y.cast(d)).cast(DoubleType).as("_sy"),
        sum((x * x).cast(d)).cast(DoubleType).as("_sxx"),
        sum((y * y).cast(d)).cast(DoubleType).as("_syy"),
        sum((x * y).cast(d)).cast(DoubleType).as("_sxy"))
      .select(col(groupCol),
        // try_divide: a zero-variance group has an undefined
        // correlation — NULL, not an ANSI divide-by-zero error
        try_divide(col("_n") * col("_sxy") - col("_sx") * col("_sy"),
          sqrt(col("_n") * col("_sxx") - col("_sx") * col("_sx")) *
            sqrt(col("_n") * col("_syy") - col("_sy") * col("_sy")))
          .as("corr"))
  }

  /** Decimal-exact Pearson for FIXED-POINT columns (money, counts):
    * each input is an integer number of 10^-dp units, so the five
    * moment sums become exact integer sums — per-row products stay in
    * long range and accumulate through the native int128 aggregate
    * ([[graft.functions.Int128Sum]]) at codegen speed, no per-row
    * BigDecimal. Correlation is invariant under the per-column linear
    * scaling, so the formula runs directly on the scaled sums; both
    * engines convert the same exact integers to double and evaluate
    * the same IEEE expression, making the result bit-reproducible
    * under any partitioning AND bit-equal to a DuckDB
    * `sum(BIGINT)→HUGEINT` oracle. Requires |x·10^xDp| and the row
    * products < 2^63 (money columns: comfortably).
    */
  def pearsonExactScaled(df: DataFrame, groupCol: String,
      x: Column, xDp: Int, y: Column, yDp: Int): DataFrame = {
    import graft.functions.Int128Sum.exactLongSum
    val xs = round(x * math.pow(10, xDp).toLong).cast("long")
    val ys = round(y * math.pow(10, yDp).toLong).cast("long")
    // no repartition guard: the int128 partial aggregation reduces
    // each scan split to one row per group before the only exchange —
    // map-side parallelism rides the file splits (plentiful at scale),
    // and a pre-agg shuffle would cost more than the combine saves
    df.where(x.isNotNull && y.isNotNull)
      .select(col(groupCol), xs.as("_xs"), ys.as("_ys"))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).cast(DoubleType).as("_n"),
        exactLongSum(col("_xs")).cast(DoubleType).as("_sx"),
        exactLongSum(col("_ys")).cast(DoubleType).as("_sy"),
        exactLongSum(col("_xs") * col("_xs")).cast(DoubleType).as("_sxx"),
        exactLongSum(col("_ys") * col("_ys")).cast(DoubleType).as("_syy"),
        exactLongSum(col("_xs") * col("_ys")).cast(DoubleType).as("_sxy"))
      .select(col(groupCol),
        try_divide(col("_n") * col("_sxy") - col("_sx") * col("_sy"),
          sqrt(col("_n") * col("_sxx") - col("_sx") * col("_sx")) *
            sqrt(col("_n") * col("_syy") - col("_sy") * col("_sy")))
          .as("corr"))
  }

  /** Per-group winsorization: exact interpolated percentiles (lo, hi)
    * clamp the value column — the standard outlier-clipping step before
    * training-statistics are computed. Returns one row per group with
    * the clamp bounds, the median, and the winsorized mean.
    *
    * Exact `percentile` (not approx) keeps the oracle comparable; at
    * 100 TB swap for `approx_percentile` with a documented error bound.
    * The mean accumulates in DECIMAL over the clamped values so the
    * sum is order-independent; only the final divide is floating-point.
    * One aggregation for the percentiles (sort-based, per group) + one
    * broadcast join back + one map-side-combinable aggregation.
    */
  def winsorize(df: DataFrame, groupCol: String, valueCol: Column,
      lo: Double = 0.05, hi: Double = 0.95): DataFrame = {
    val bounds = df.groupBy(col(groupCol))
      .agg(percentile(valueCol, lit(lo)).as("p_lo"),
        percentile(valueCol, lit(0.5)).as("p_med"),
        percentile(valueCol, lit(hi)).as("p_hi"))
    val clamped = least(greatest(valueCol.cast(DoubleType), col("p_lo")), col("p_hi"))
    df.join(broadcast(bounds), groupCol)
      .groupBy(col(groupCol))
      .agg(first(col("p_lo")).as("p_lo"),
        first(col("p_med")).as("p_med"),
        first(col("p_hi")).as("p_hi"),
        round(sum(clamped.cast(DecimalType(28, 8))).cast(DoubleType) /
          count(valueCol), 6).as("winsorized_mean"))
  }

  /** Robust per-group outlier detection by median absolute deviation:
    * score = |x − median| / (1.4826·MAD), outlier ⟺ score > k. The
    * MAD-based rule survives the contamination that wrecks μ/σ-based
    * z-scores — the standard robust filter before training statistics.
    *
    * Two exact-percentile aggregations (median, then MAD over the
    * residuals) with the group-level results broadcast back — groups
    * are few, rows are many, so both joins are map-side. Exact
    * `percentile` keeps the oracle comparable (quantile_cont parity);
    * at 100 TB swap for `approx_percentile` with an error bound.
    * A degenerate group (MAD = 0, half the values at the median)
    * yields NULL scores via try_divide — flagged not-outlier.
    */
  def madOutliers(df: DataFrame, groupCol: String, valueCol: Column,
      k: Double = 3.5): DataFrame = {
    val med = df.groupBy(col(groupCol))
      .agg(percentile(valueCol, lit(0.5)).as("_med"))
    val withMed = df.join(broadcast(med), groupCol)
    val mad = withMed.groupBy(col(groupCol))
      .agg(percentile(abs(valueCol.cast(DoubleType) - col("_med")), lit(0.5))
        .as("_mad"))
    withMed.join(broadcast(mad), groupCol)
      .withColumn("score",
        round(try_divide(abs(valueCol.cast(DoubleType) - col("_med")),
          lit(1.4826) * col("_mad")), 6))
      .withColumn("is_outlier",
        coalesce(col("score") > k, lit(false)))
      .drop("_med", "_mad")
  }

  /** Per-group central moments -> variance, skewness, excess kurtosis,
    * from exact DECIMAL power sums (Σx … Σx⁴). Decimal accumulation is
    * order-independent, so the statistics are partitioning-invariant
    * and engine-reproducible — built-in `skewness`/`kurtosis`
    * accumulate doubles and are neither. The closed forms:
    *   m_k = Σ(x-μ)^k / n  expanded in power sums;
    *   skew = m₃ / (m₂·√m₂),  kurt = m₄ / m₂² − 3.
    * One map-side-combinable aggregation; nothing per-row after it.
    */
  def moments(df: DataFrame, groupCol: String, valueCol: Column): DataFrame = {
    // Integral values only: the per-row powers stay in LONG (exact up
    // to |x| ≲ 55k for x⁴) and the sums accumulate in DECIMAL(38,0) —
    // decimal×decimal would hit engine-specific precision/scale
    // narrowing rules; long powers are bit-exact everywhere.
    val d = DecimalType(38, 0)
    val x = valueCol
    val agg = df.where(valueCol.isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).cast(DoubleType).as("_n"),
        sum(x.cast(d)).cast(DoubleType).as("_s1"),
        sum((x * x).cast(d)).cast(DoubleType).as("_s2"),
        sum((x * x * x).cast(d)).cast(DoubleType).as("_s3"),
        sum((x * x * x * x).cast(d)).cast(DoubleType).as("_s4"))
    val n = col("_n"); val mean = col("_s1") / n
    val m2 = col("_s2") / n - mean * mean
    val m3 = col("_s3") / n - lit(3.0) * mean * (col("_s2") / n) +
      lit(2.0) * mean * mean * mean
    val m4 = col("_s4") / n - lit(4.0) * mean * (col("_s3") / n) +
      lit(6.0) * mean * mean * (col("_s2") / n) -
      lit(3.0) * mean * mean * mean * mean
    agg.select(col(groupCol),
      n.cast("long").as("n"),
      round(mean, 6).as("mean"),
      round(m2, 6).as("variance"),
      round(m3 / (m2 * sqrt(m2)), 6).as("skewness"),
      round(m4 / (m2 * m2) - lit(3.0), 6).as("kurtosis"))
  }

  /** Per-group Gini coefficient of a non-negative integral value —
    * the imbalance measure for corpus composition (is one source's
    * token budget dominated by a few giant documents?).
    * G = 2·Σᵢ i·x₍ᵢ₎ / (n·Σx) − (n+1)/n over the ascending sort.
    *
    * The rank comes from a per-group `row_number` (ties get distinct
    * ranks, which cancels exactly in Σ i·x since tied x are equal);
    * both Σ i·x and Σx accumulate in DECIMAL. One shuffle + one sort
    * per group, then a map-side-combinable aggregation.
    */
  def gini(df: DataFrame, groupCol: String, valueCol: Column): DataFrame = {
    val d = DecimalType(38, 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(valueCol.asc)
    df.where(valueCol.isNotNull)
      .withColumn("_i", row_number().over(w))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).cast(DoubleType).as("_n"),
        sum(valueCol.cast(d)).cast(DoubleType).as("_sx"),
        sum((col("_i") * valueCol).cast(d)).cast(DoubleType).as("_siw"))
      .select(col(groupCol), col("_n").cast("long").as("n"),
        round(lit(2.0) * col("_siw") / (col("_n") * col("_sx")) -
          (col("_n") + lit(1.0)) / col("_n"), 6).as("gini"))
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

  /** Global row numbers over a total order, at scale — the
    * replacement for an unpartitioned `Window.orderBy(...)`, which
    * funnels the whole table through ONE partition ("No Partition
    * Defined" warning) and dies at fact-table size.
    *
    * Two-phase (the RDD `zipWithIndex` shape, same family as
    * PackOps's partition-local cumsum + broadcast shift):
    *  1. range-partition on the sort key and sort within partitions
    *     (one shuffle, every partition works in parallel);
    *  2. one lightweight job counts rows per partition (the shuffle
    *     files are reused — only the per-partition iteration
    *     repeats), the cumulative counts broadcast as plain offsets;
    *  3. a per-partition pass assigns `rank = offset(pid) + local
    *     position` — genuinely imperative per-partition logic, the
    *     sanctioned mapPartitions case.
    *
    * Returns the ranked frame (input columns + `rankCol`, 1-based)
    * and the total row count (free from the counts job — callers
    * need it for ntile/percent_rank arithmetic). The sort must be
    * total for ranks to be deterministic: pass a unique tiebreaker.
    */
  def globalRank(df: DataFrame, rankCol: String, sortCols: Column*): (DataFrame, Long) = {
    import org.apache.spark.TaskContext
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.LongType
    val spark = df.sparkSession
    val ranged = df.repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val rdd = ranged.rdd // one RDD: both jobs below reuse its shuffle
    val counts = rdd
      .mapPartitionsWithIndex((pid, it) => Iterator((pid, {
        var n = 0L; while (it.hasNext) { it.next(); n += 1 }; n
      })), preservesPartitioning = true)
      .collect().sortBy(_._1).map(_._2)
    val total = counts.sum
    val offsets = counts.scanLeft(0L)(_ + _) // offsets(pid) = rows before pid
    val bc = spark.sparkContext.broadcast(offsets)
    val ranked = rdd.mapPartitionsWithIndex({ (pid, it) =>
      var r = bc.value(pid)
      it.map { row => r += 1; Row.fromSeq(row.toSeq :+ r) }
    }, preservesPartitioning = true)
    (spark.createDataFrame(ranked,
      ranged.schema.add(rankCol, LongType, nullable = false)), total)
  }

  /** 1-based rank for the direct output of `orderBy(...).limit(k)`,
    * with zero extra jobs and no window. Both physical forms of a
    * global sort-limit (TakeOrderedAndProject, Sort + GlobalLimit)
    * contract to a SINGLE output partition holding rows in sort
    * order, so `monotonically_increasing_id` (partitionId << 33 |
    * position, = position here) numbers them 1..k exactly. Only
    * valid immediately above a sort-limit — anything that can
    * repartition in between voids the contract.
    */
  def postLimitRank(df: DataFrame, rankCol: String): DataFrame =
    df.withColumn(rankCol, (monotonically_increasing_id() + 1).cast("int"))

  /** Exact `ntile(k)` bucket from a 1-based global rank and the total
    * row count: the first `total mod k` buckets take ⌈total/k⌉ rows,
    * the rest ⌊total/k⌋ — the SQL-standard distribution, as plain
    * column arithmetic over [[globalRank]] output. */
  def ntileOfRank(rank: Column, total: Long, k: Int): Column = {
    val q = total / k // small-bucket size
    val r = total % k // number of large (q+1) buckets
    // column `/` is IEEE double division; floor over it is exact for
    // numerators below 2^53 — far past any physical row count
    if (total == 0L) lit(null).cast("int")
    else if (q == 0L) rank.cast("int") // fewer rows than buckets
    else when(rank <= r * (q + 1),
        floor((rank - 1) / lit((q + 1).toDouble)) + 1)
      .otherwise(lit(r) + floor((rank - 1 - r * (q + 1)) / lit(q.toDouble)) + 1)
      .cast("int")
  }

  /** Column profiling report — the ANALYZE-style statistics a
    * warehouse keeps per column (row count, null count, distinct
    * count, min, max), one output row per profiled column.
    *
    * ONE aggregation over the table computes every statistic
    * (count/sum-of-null-indicators/min/max are all map-side
    * combinable; the distinct counts ride Spark's multi-distinct
    * Expand — a single shuffle whose width is the number of profiled
    * columns, not the row count), then the 1×(5k) row explodes to k
    * rows in the same plan — no driver round-trip. min/max surface
    * as strings so one schema covers heterogeneous columns; callers
    * profile columns whose string form is canonical (integers,
    * strings — not doubles, whose formatting is engine-specific).
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"${c}__n"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__distinct"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val entries = cols.map { c =>
      struct(lit(c).as("column"),
        col(s"${c}__n").as("n"),
        coalesce(col(s"${c}__nulls"), lit(0L)).as("n_null"),
        col(s"${c}__distinct").as("n_distinct"),
        col(s"${c}__min").as("min_val"),
        col(s"${c}__max").as("max_val"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(entries: _*)).as("e"))
      .select(col("e.*"))
  }

  /** Upper-triangular sample covariance matrix of an embedding
    * column — the sufficient statistic for PCA/whitening over a
    * vector corpus, computed in one corpus pass.
    *
    * Per row, the dim·(dim+1)/2 upper-triangle products explode from
    * a nested-transform literal pattern (no self-join of the
    * exploded table, so the corpus is never shuffled twice); the
    * (i, j) aggregation output is dim²-sized regardless of corpus
    * size, and the per-dimension sums ride a second, dim-sized
    * aggregate broadcast back onto it. Engine-exact by the
    * estimator contract: Σxᵢxⱼ accumulates as DECIMAL(28,12) over
    * double-widened floats, Σxᵢ as DECIMAL(28,8); the closed form
    * (Σxy − Σx·Σy/n)/(n−1) is then a fixed sequence of IEEE
    * operations on engine-identical doubles — no folds, no libm —
    * so the 6-dp rounding cannot diverge.
    *
    * Returns (i, j, cov) for 0 ≤ i ≤ j < dim.
    */
  def embeddingCovariance(df: DataFrame, vecCol: String): DataFrame = {
    val d8 = DecimalType(28, 8)
    val v = Parallelism.ensure(df.select(col(vecCol).as("_v"))
      .where(col("_v").isNotNull))
    // ONE native sufficient-statistic aggregate: each row's
    // dim·(dim+1)/2 pairwise products accumulate into int128
    // picounit cells inside a tight JIT loop (VectorOuterSum), and
    // each partition contributes one ~dim²-long buffer to the merge.
    // The previous composed form (explode a dim²-length struct array
    // per row through interpreted lambdas, hash-aggregate the (i, j)
    // keys) paid its cost in row GENERATION, not arithmetic: ~2·10⁹
    // boxed structs at 10x data for the same long adds. Quantization
    // (round(xi·xj·1e12) → long → int128) is bit-identical between
    // the two forms, so the oracle SQL is unchanged.
    val pairs = v.groupBy()
      .agg(graft.functions.VectorOuterSum.outerSum(col("_v")).as("cells"))
      .select(explode(col("cells")).as("p"))
      .select(col("p.i").as("i"), col("p.j").as("j"),
        (col("p.sxy").cast(DoubleType) / 1e12).as("sxy"),
        col("p.n").as("n"))
    val dims = v
      .select(posexplode(col("_v")).as(Seq("i", "x")))
      .groupBy(col("i"))
      .agg(sum(col("x").cast(d8)).cast(DoubleType).as("sx"))
    pairs
      .join(broadcast(dims.select(col("i"), col("sx").as("_sxi"))), Seq("i"))
      .join(broadcast(dims.select(col("i").as("j"), col("sx").as("_sxj"))),
        Seq("j"))
      .select(col("i"), col("j"),
        round((col("sxy") - col("_sxi") * col("_sxj") / col("n"))
          / (col("n") - 1), 6).as("cov"))
  }

  /** PCA projection: the top-`k` principal components extracted
    * driver-side from [[embeddingCovariance]] (power iteration with
    * deflation on the dim×dim matrix — dim²-bounded trainer state,
    * like the k-means centroids), then ONE distributed projection
    * pass via the native vector dot against the centered input.
    *
    * Deterministic end to end: fixed start vector (1, 1/2, 1/3, …),
    * a fixed iteration count instead of a convergence test, and each
    * component's sign normalized so its largest-magnitude entry is
    * positive. Returns (idCol, pc) with `pc` the k-vector of
    * projections, 6 dp.
    */
  def pcaProject(df: DataFrame, idCol: String, vecCol: String, k: Int,
      iterations: Int = 50): DataFrame = {
    require(k > 0)
    val covRows = embeddingCovariance(df, vecCol).collect()
    if (covRows.isEmpty)
      return df.sparkSession.emptyDataFrame
        .withColumn(idCol, lit(null))
        .withColumn("pc", lit(null).cast("array<double>"))
        .select(col(idCol), col("pc"))
    val dim = covRows.iterator.map(_.getInt(1)).max + 1
    val n = df.where(col(vecCol).isNotNull).count().toDouble
    val cov = Array.ofDim[Double](dim, dim)
    covRows.foreach { r =>
      val (i, j, c) = (r.getInt(0), r.getInt(1), r.getDouble(2))
      cov(i)(j) = c; cov(j)(i) = c
    }
    // means for centering (decimal-exact like the covariance sums)
    val d8 = DecimalType(28, 8)
    val means = df.where(col(vecCol).isNotNull)
      .select(posexplode(col(vecCol)).as(Seq("i", "x")))
      .groupBy(col("i"))
      .agg((sum(col("x").cast(d8)).cast(DoubleType) / lit(n)).as("m"))
      .collect().sortBy(_.getInt(0)).map(_.getDouble(1))
    def matVec(m: Array[Array[Double]], x: Array[Double]): Array[Double] =
      Array.tabulate(x.length)(i => (0 until x.length)
        .foldLeft(0.0)((acc, j) => acc + m(i)(j) * x(j)))
    def normalize(x: Array[Double]): Array[Double] = {
      val nrm = math.sqrt(x.foldLeft(0.0)((a, v) => a + v * v))
      if (nrm == 0) x else x.map(_ / nrm)
    }
    val work = cov.map(_.clone())
    val comps = (0 until math.min(k, dim)).map { _ =>
      var x = normalize(Array.tabulate(dim)(i => 1.0 / (i + 1)))
      (0 until iterations).foreach { _ => x = normalize(matVec(work, x)) }
      // sign convention: largest-|entry| positive
      val lead = x.maxBy(math.abs)
      val c = if (lead < 0) x.map(-_) else x
      // deflate: work -= λ ccᵀ with λ = cᵀ work c
      val wc = matVec(work, c)
      val lambda = c.zip(wc).map { case (a, b) => a * b }.sum
      for (i <- 0 until dim; j <- 0 until dim)
        work(i)(j) -= lambda * c(i) * c(j)
      c
    }
    val proj = comps.map { c =>
      // projection = (v − mean)·c = v·c − mean·c (dot is linear)
      val meanDot = means.zip(c).map { case (m, ci) => m * ci }.sum
      round(graft.functions.VectorExpressions.dot(col(vecCol),
        typedLit[Seq[Double]](c.toSeq)) - lit(meanDot), 6)
    }
    df.where(col(vecCol).isNotNull)
      .select(col(idCol), array(proj: _*).as("pc"))
  }

  /** Shuffle-skew diagnostic for a prospective partitioning key — the
    * question to ask BEFORE a 100 TB `groupBy(key)`/`join(key)`:
    * how uneven would the hash partitions be, and which keys are the
    * hot ones that need salting (q33/q78's cure; this is the
    * measurement that says whether to pay for it).
    *
    * One pass each over two small aggregations: md5-hash buckets
    * (engine-portable — the hashUnit family) sized `buckets`, and the
    * top-`topK` heavy keys. `bucket_skew` is max-bucket over the
    * uniform expectation — 1.0 is perfectly even, the number is the
    * straggler multiplier a shuffle on this key would pay.
    */
  def skewReport(df: DataFrame, keyCol: String, buckets: Int = 32,
      topK: Int = 5): DataFrame = {
    val key = col(keyCol).cast("string")
    val bucket =
      conv(substring(md5(key), 1, 8), 16, 10).cast("long") % buckets
    val perBucket = df.select(bucket.as("b"))
      .groupBy(col("b")).agg(count(lit(1)).as("n"))
    val stats = broadcast(perBucket.groupBy()
      .agg(sum(col("n")).as("n_total"), max(col("n")).as("max_bucket")))
    df.select(key.as("key")).groupBy(col("key"))
      .agg(count(lit(1)).as("n_key"))
      .orderBy(col("n_key").desc, col("key")).limit(topK)
      .crossJoin(stats)
      .select(col("key"), col("n_key"), col("n_total"),
        round(col("n_key").cast("double") / col("n_total"), 6)
          .as("key_share"),
        round(col("max_bucket").cast("double") * buckets / col("n_total"), 6)
          .as("bucket_skew"))
  }
}
