package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * Random sampling (`df.sample`) is neither reproducible across
  * engines nor stable under retries — a re-run of a failed 100 TB
  * stage must keep the same rows. These samplers decide membership
  * from a hash of the row's id, so the sample is a pure function of
  * the data: reproducible anywhere (md5 is engine-portable), stable
  * under task retry and partition reshuffle, and joinable (the same
  * id samples identically in every table that carries it).
  */
object SampleOps {

  /** Uniform [0, 1) hash of an id column: first 8 md5 hex chars as
    * uint32 / 2^32. */
  def hashUnit(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0)

  /** Keep rows with hashUnit(id) < fraction — a deterministic
    * Bernoulli sample. Pure map-side filter: no shuffle, prunes
    * before any downstream compute. */
  def deterministicSample(df: DataFrame, idCol: String, fraction: Double): DataFrame =
    df.where(hashUnit(col(idCol)) < fraction)

  /** Weight-proportional deterministic sampling: row i is kept with
    * probability min(1, weight_i · ratePerUnit), decided by the same
    * id-hash threshold as [[deterministicSample]]. Only multiply and
    * compare — IEEE-exact, so membership reproduces across engines
    * (a pow-keyed scheme like Efraimidis–Spirakis would wobble in the
    * last ulp between libm implementations). Map-side filter, no
    * shuffle, no global pass: the caller picks `ratePerUnit` (e.g.
    * target_rows / total_weight from table stats). */
  def weightedSample(
      df: DataFrame, idCol: String, weightCol: String,
      ratePerUnit: Double): DataFrame =
    df.where(hashUnit(col(idCol)) <
      least(lit(1.0), col(weightCol).cast("double") * ratePerUnit))

  /** Downsample to a target stratum mixture (e.g. "40% en, 30% zh,
    * 30% code") at the largest achievable size: the binding stratum
    * (smallest count_s / share_s) is kept whole and every other
    * stratum downsamples to match. Rates derive from one k-row count
    * aggregate; membership is then the same deterministic hash
    * threshold as [[stratifiedSample]]. Strata missing from `shares`
    * are dropped. The per-stratum counts live on the driver — k
    * strata, not data — and the rate arithmetic is plain IEEE
    * multiply/divide, so the realized sample reproduces anywhere.
    */
  def mixtureSample(
      df: DataFrame, idCol: String, stratumCol: String,
      shares: Map[String, Double]): DataFrame = {
    require(shares.nonEmpty && shares.values.forall(_ > 0))
    val counts = df.where(col(stratumCol).isin(shares.keys.toSeq: _*))
      .groupBy(col(stratumCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // empty corpus / no requested stratum present: nothing to sample
    // (min over zero strata would throw)
    if (counts.isEmpty) return df.where(lit(false))
    val nTotal = shares.collect {
      case (s, share) if counts.contains(s) => counts(s) / share
    }.min
    val rates = shares.collect {
      case (s, share) if counts.contains(s) =>
        s -> (share * nTotal) / counts(s)
    }
    stratifiedSample(df, idCol, stratumCol, rates, default = 0.0)
  }

  /** Temperature-flattened mixture sampling — the multilingual
    * rebalancing rule (sampling share ∝ n_g^α, α < 1 upsamples the
    * tail relative to the head): compute the power-law target shares
    * from the observed stratum counts, then take the largest
    * achievable corpus at those shares via [[mixtureSample]]'s
    * binding-stratum rule. α = 1 keeps the natural distribution
    * (every rate 1); α → 0 approaches equal shares per stratum.
    *
    * Shares are rounded to 9 dp before the rate arithmetic: `pow` is
    * the one libm call engines may disagree on in the last ulp, and
    * the rounding makes the realized rates — and therefore sample
    * membership — engine-reproducible.
    */
  def alphaSample(df: DataFrame, idCol: String, stratumCol: String,
      alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1)
    val counts = df.where(col(stratumCol).isNotNull)
      .groupBy(col(stratumCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    if (counts.isEmpty) return df.where(lit(false))
    val powed = counts.view.mapValues(n => math.pow(n.toDouble, alpha)).toMap
    // sorted-order fold: double addition is not associative, and the
    // normalizer must come out bit-identical in any engine that mirrors
    // this computation (the oracle sums an ORDER BY'd list)
    val z = powed.values.toSeq.sorted.sum
    val shares = powed.map { case (s, p) =>
      s -> BigDecimal(p / z).setScale(9, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    }
    mixtureSample(df, idCol, stratumCol, shares)
  }

  /** Per-stratum deterministic sampling rates (e.g. downsample the
    * dominant language, keep the tail): rows keep membership iff
    * hashUnit(id) < fractions(stratum), `default` for strata not
    * listed. The rate expression compiles to a literal CASE — no
    * broadcast, no UDF. */
  def stratifiedSample(
      df: DataFrame, idCol: String, stratumCol: String,
      fractions: Map[String, Double], default: Double): DataFrame = {
    val rate = fractions.foldLeft(lit(default)) { case (acc, (k, f)) =>
      when(col(stratumCol) === k, lit(f)).otherwise(acc)
    }
    df.where(hashUnit(col(idCol)) < rate)
  }

  /** Exactly k rows per stratum, deterministically: rank rows within
    * each stratum by the id's hash (id itself as total-order
    * tie-break — md5 collisions must not make membership ambiguous)
    * and keep rank ≤ k. The fraction-based samplers above can't hit
    * an exact count; this is the "100 eval docs per language" shape.
    *
    * Scale: one shuffle on the stratum key, rank within partition.
    * A stratum's rows land on one partition — for the giant-stratum
    * case pre-thin with [[deterministicSample]] at a rate that
    * overshoots k (hash order is preserved under thinning: the k
    * smallest hashes survive any prefix-threshold cut with
    * overwhelming probability, and the composition stays exact-k and
    * deterministic), then rank the survivors. */
  def exactKPerGroup(
      df: DataFrame, idCol: String, groupCol: String, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("_rk", row_number().over(w))
      .where(col("_rk") <= k)
      .drop("_rk")
  }

  /** UniMax-style token-budget balancing: split a total token budget
    * across strata (languages) by WATER-FILLING — every stratum whose
    * corpus fits under the common water level keeps everything, the
    * rest are capped at the level, so head languages are downsampled
    * toward uniformity while tail languages are never starved (the
    * failure mode of proportional and α-sampling both).
    *
    * The level is found greedily over strata sorted by total weight
    * ascending (stratum name as tie-break): at step k the remaining
    * budget splits evenly (INTEGER floor division — engine-exact)
    * across the n−k unserved strata; a stratum below its share keeps
    * its whole corpus and returns the difference to the pool; the
    * first stratum ABOVE its share fixes the level for every stratum
    * from there on (totals are ascending, so all of them cap). Any
    * unspent floor remainder is forfeit — documented, deterministic.
    *
    * Row selection is the deterministic hash-order prefix: within a
    * stratum, documents sort by (md5(id), id) and keep while the
    * running token total stays ≤ the stratum's budget — the same
    * membership rule every sampler in this file uses, so re-runs and
    * cross-engine mirrors agree row-for-row.
    *
    * Shape at scale: the prefix cut is TWO-PHASE (the
    * [[StatsOps.globalRank]] discipline), not a stratum-partitioned
    * window, and the water-fill totals are the per-stratum sum of
    * the same collected partials (strata-sized driver state, no
    * separate aggregation scan): rows
    * range-partition on the full (stratum, md5(id), id) sort key so
    * a dominant-language stratum spreads across MANY partitions, a
    * lightweight job sums tokens per (partition, stratum) — at most
    * partitions + strata rows collected, since each partition holds
    * a contiguous key slice — and a per-partition pass adds the
    * broadcast offset to a local running sum and keeps rows while
    * the exact cumulative total stays ≤ the stratum's budget. No
    * single task ever owns a whole stratum, so the operator survives
    * the one-giant-language corpus without pre-thinning.
    */
  def tokenBudgetSample(df: DataFrame, idCol: String, stratumCol: String,
      weightCol: String, budget: Long): DataFrame = {
    require(budget >= 0)
    // Two-phase prefix cut (globalRank discipline, keyed by stratum).
    // Range-partitioning on the FULL sort key keeps each partition a
    // contiguous (stratum, hash, id) slice, so the partials job
    // collects ≤ partitions + strata rows and a giant stratum spans
    // as many tasks as its row share demands. The water-fill totals
    // are the per-stratum SUM of the same partials — no separate
    // aggregation scan.
    import org.apache.spark.sql.Row
    val spark = df.sparkSession
    val base = df.where(col(stratumCol).isNotNull)
      .withColumn("_h", md5(col(idCol).cast("string")))
      .withColumn("_wl", col(weightCol).cast("long"))
    val sortCols = Seq(col(stratumCol), col("_h"), col(idCol))
    val ranged = base.repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val schema = ranged.schema
    val sIdx = schema.fieldIndex(stratumCol)
    val wIdx = schema.fieldIndex("_wl")
    val rdd = ranged.rdd // one RDD: both jobs below reuse its shuffle
    // Job 1: per-(partition, stratum) token partials. nNonNull rides
    // along so the SQL running-sum null semantics (cum stays NULL
    // until the first non-null weight) survive partition boundaries.
    val partials = rdd.mapPartitionsWithIndex({ (pid, it) =>
      val m = scala.collection.mutable.LinkedHashMap[String, (Long, Long)]()
      it.foreach { r =>
        val s = r.getString(sIdx)
        val (t, nn) = m.getOrElse(s, (0L, 0L))
        if (r.isNullAt(wIdx)) m(s) = (t, nn)
        else m(s) = (t + r.getLong(wIdx), nn + 1L)
      }
      m.iterator.map { case (s, (t, nn)) => (pid, s, t, nn) }
    }, preservesPartitioning = true).collect()
    val totals = partials.groupBy(_._2)
      .map { case (s, rows) => s -> rows.map(_._3).sum }
      .toArray.sortBy { case (s, t) => (t, s) }
    if (totals.isEmpty) return df.where(lit(false))
    val n = totals.length
    var remaining = budget
    var level = Long.MaxValue
    val budgets = scala.collection.mutable.LinkedHashMap[String, Long]()
    var k = 0
    while (k < n) {
      val (s, t) = totals(k)
      val share = if (level == Long.MaxValue) remaining / (n - k) else level
      if (t <= share && level == Long.MaxValue) { budgets(s) = t; remaining -= t }
      else { if (level == Long.MaxValue) level = share; budgets(s) = level }
      k += 1
    }
    // offsets((pid, stratum)) = (tokens, non-null count) in EARLIER
    // partitions of the same stratum — strata-by-partitions sized.
    val offsets = scala.collection.mutable.HashMap[(Int, String), (Long, Long)]()
    partials.groupBy(_._2).foreach { case (s, rows) =>
      var t = 0L; var nn = 0L
      rows.sortBy(_._1).foreach { case (pid, _, pt, pnn) =>
        offsets((pid, s)) = (t, nn); t += pt; nn += pnn
      }
    }
    val bcOff = spark.sparkContext.broadcast(offsets.toMap)
    val bcBud = spark.sparkContext.broadcast(budgets.toMap)
    // Job 2: local running sum + broadcast offset → exact cumulative
    // total; keep while ≤ budget. Rows before the first non-null
    // weight have NULL cum in the window spelling — dropped here too.
    val kept = rdd.mapPartitionsWithIndex({ (pid, it) =>
      val off = bcOff.value
      val bud = bcBud.value
      var cur: String = null
      var running = 0L
      var seen = false
      it.filter { r =>
        val s = r.getString(sIdx)
        if (s != cur) {
          cur = s
          val (t, nn) = off.getOrElse((pid, s), (0L, 0L))
          running = t; seen = nn > 0L
        }
        if (!r.isNullAt(wIdx)) { running += r.getLong(wIdx); seen = true }
        seen && running <= bud.getOrElse(s, -1L)
      }
    }, preservesPartitioning = true)
    spark.createDataFrame(kept.map(r => Row.fromSeq(r.toSeq)), schema)
      .drop("_h", "_wl")
  }
}
