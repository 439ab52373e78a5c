package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: tokenization,
  * language ID, quality scoring, fingerprinting. All are pure
  * column expressions (no UDFs) so they stay inside whole-stage
  * codegen and scale linearly with no shuffle — at 100 TB these run
  * map-side on the parquet scan.
  */
object TextOps {

  /** Whitespace word tokens, lowercased. */
  def tokens(text: Column): Column =
    split(lower(trim(text)), "\\s+")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, 0).otherwise(size(tokens(text)))

  /** BPE-ish subword count approximation: word pieces of <=4 chars
    * plus punctuation marks — the standard chars/4 heuristic blended
    * with exact word boundaries, cheap enough for a 100 TB sweep. */
  def subwordCountApprox(text: Column): Column = {
    val words = tokens(text)
    // each word contributes ceil(len/4) pieces
    aggregate(words, lit(0L),
      (acc, w) => acc + ceil(length(w) / lit(4.0)).cast("long"))
  }

  /** Language-specific stopword hit count: how many tokens appear in
    * the given stopword list. */
  def stopwordHits(text: Column, stopwords: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(stopwords.map(lit(_)): _*)))

  /** Tiny deterministic language-ID heuristic: argmax of stopword
    * hits across per-language profiles, ties broken by profile order,
    * UNKNOWN when nothing matches. Real pipelines plug in fastText et
    * al; the operator contract (deterministic label per row, pure
    * map-side) is what matters at scale.
    */
  val languageProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "dans"),
    "es" -> Seq("el", "la", "los", "y", "es", "una", "en"))

  def languageId(text: Column): Column = {
    // Single-pass argmax: each profile's score expression appears
    // EXACTLY ONCE, inside one array, folded left keeping the first
    // maximum (profile-order tie-break; "unknown" only beaten by a
    // positive score). The obvious when-chain formulation inlined
    // every score into every branch plus a greatest() — and branches
    // only short-circuit on a match, so text matching NO profile (at
    // web scale, most of the world's languages) paid ~6x the
    // tokenize+filter work of a first-branch hit. Measured on a 50k-
    // doc corpus of out-of-profile text: 21s → this form's flat cost.
    val scored = languageProfiles.map { case (lang, words) =>
      struct(stopwordHits(text, words).as("s"), lit(lang).as("l"))
    }
    aggregate(array(scored: _*),
      struct(lit(0).as("s"), lit("unknown").as("l")),
      (acc, x) => when(x.getField("s") > acc.getField("s"), x).otherwise(acc))
      .getField("l")
  }

  /** Alphabetic-character ratio (letters / non-space chars). */
  def alphaRatio(text: Column): Column = {
    val stripped = regexp_replace(lower(text), "\\s", "")
    when(length(stripped) === 0, 0.0)
      .otherwise(
        length(regexp_replace(stripped, "[^a-z]", "")).cast("double") /
          length(stripped).cast("double"))
  }

  /** Mean token length. */
  def meanTokenLength(text: Column): Column = {
    val t = tokens(text)
    when(size(t) === 0, 0.0)
      .otherwise(aggregate(t, lit(0L), (acc, w) => acc + length(w))
        .cast("double") / size(t).cast("double"))
  }

  /** Composite document quality score in [0,1]: blends length,
    * alpha ratio, stopword ratio, and mean word length — the shape of
    * the classic heuristic quality filters for web-scale corpora
    * (length/punct/stopword ratios). Deterministic, pure map-side.
    */
  def qualityScore(text: Column): Column = {
    val nTokens = tokenCount(text).cast("double")
    val lengthScore = least(nTokens / lit(64.0), lit(1.0))
    val alpha = alphaRatio(text)
    val stopRatio = when(nTokens === 0, 0.0).otherwise(
      stopwordHits(text, languageProfiles.flatMap(_._2)).cast("double") / nTokens)
    val wordLen = meanTokenLength(text)
    val wordLenScore = when(wordLen >= 2.5 && wordLen <= 8.0, 1.0).otherwise(0.0)
    // 6-dp rounding spelled as PURE double arithmetic, not round():
    // Spark's round(DOUBLE, 6) goes through Double.toString +
    // BigDecimal HALF_UP while DuckDB rounds the binary value, and a
    // score landing on an exact .xxxxxx5 boundary makes the two
    // disagree by one ulp of the 6th decimal (18 of 50k rows at the
    // 10x replica — caught by the round-13 decade-gate rotation).
    // floor(x·10⁶ + 0.5)/10⁶ is the SAME IEEE expression on both
    // sides, so the engines cannot diverge on any input; score ∈ [0,1]
    // so the away-from-zero/half-up distinction never binds.
    floor((lit(0.3) * lengthScore + lit(0.3) * alpha +
        lit(0.2) * least(stopRatio * 4.0, lit(1.0)) +
        lit(0.2) * wordLenScore) * lit(1000000.0) + lit(0.5))
      .cast("double") / lit(1000000.0)
  }

  /** Word n-gram shingles (the unit for minhash/jaccard dedup). */
  def shingles(text: Column, n: Int): Column =
    shinglesOfTokens(tokens(text), n)

  /** Shingles over an already-tokenized array column. Prefer this
    * over [[shingles]] when the token array is a materialized
    * attribute (e.g. past an exchange): higher-order-function lambdas
    * are interpreted without common-subexpression elimination, so a
    * shared `tokens(text)` subtree re-runs its regex split once per
    * lambda element when inlined. */
  def shinglesOfTokens(t: Column, n: Int): Column =
    when(size(t) < n, array(concat_ws(" ", t)))
      .otherwise(transform(sequence(lit(0), size(t) - n),
        i => concat_ws(" ", slice(t, i + 1, lit(n)))))

  /** Explode word n-gram shingles through whole-stage codegen:
    * positions come from a Generate over `sequence` and each gram
    * from a codegen'd `slice`+`concat_ws`, instead of exploding the
    * [[shinglesOfTokens]] array (whose per-element transform lambda
    * is interpreted — measured ~2x slower at sf0.1). Semantics match
    * shinglesOfTokens exactly, including the short-text case (one
    * shingle of the whole array). The token array must already be a
    * projected attribute. Appends column `out`, one row per shingle.
    */
  def explodeShingles(df: DataFrame, toksCol: Column, n: Int,
      out: String): DataFrame =
    df.withColumn("_shingle_i",
        explode(sequence(lit(1), greatest(size(toksCol) - (n - 1), lit(1)))))
      .withColumn(out, concat_ws(" ", slice(toksCol, col("_shingle_i"), lit(n))))
      .drop("_shingle_i")

  /** Content-defined document fingerprint: the lexicographic min of
    * md5 over word 3-gram shingles (winnowing reduced to one band).
    * Two documents sharing their minimal shingle hash collide —
    * a cheap near-dup prefilter; md5 keeps it engine-portable.
    */
  def minShingleFingerprint(text: Column, n: Int = 3): Column =
    minShingleFingerprintOfTokens(tokens(text), n)

  /** [[minShingleFingerprint]] over an already-tokenized array
    * column. Runs through the native codegen'd
    * [[graft.functions.MinShingleMd5]] — one pass, no interpreted
    * per-shingle lambda, no intermediate shingle/hash arrays; equal
    * to `array_min(transform(shinglesOfTokens(t, n), md5))` bit for
    * bit (asserted in VectorExpressionsSpec). */
  def minShingleFingerprintOfTokens(t: Column, n: Int = 3): Column =
    graft.functions.MinShingleMd5.of(t, n)

  /** PII scrubbing: emails, URLs, and long digit runs replaced by
    * typed placeholders — the standard pre-training redaction pass.
    * Plain `regexp_replace` chain (replace-all), map-side, no UDF;
    * patterns are deliberately conservative (high precision) — a
    * production pass would extend the chain, not the mechanism.
    */
  def scrubPii(text: Column): Column = {
    val email = regexp_replace(text,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    val url = regexp_replace(email, "https?://[^\\s]+", "<URL>")
    regexp_replace(url, "[0-9]{7,}", "<NUM>")
  }

  /** URL host normalization — the crawl-dedup key: extract the
    * authority from a URL, lowercase it, strip the port and a leading
    * `www.`. Pure `regexp_extract`/`regexp_replace` chain (map-side,
    * codegen, engine-portable RE2-safe patterns — no backreferences,
    * no lookaround).
    */
  def urlHost(url: Column): Column = {
    val auth = lower(regexp_extract(url,
      "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    val noUser = regexp_replace(auth, "^[^@]*@", "")
    val noPort = regexp_replace(noUser, ":[0-9]+$", "")
    regexp_replace(noPort, "^www\\.", "")
  }

  /** Registered-domain approximation: the last two dot-labels of the
    * normalized host (`a.b.example.com` → `example.com`) — the
    * per-site aggregation key for crawl caps and domain statistics.
    */
  def registeredDomain(url: Column): Column =
    regexp_extract(urlHost(url), "([A-Za-z0-9-]+\\.[A-Za-z0-9-]+)$", 1)

  /** UT1-blocklist-style domain gate: a row passes unless its URL's
    * normalized host IS a blocked domain or sits UNDER one
    * (`ads.example.com` is blocked by `example.com` — suffix match on
    * label boundaries, never substring: `notexample.com` is not).
    * The blocklist compiles to a map-side OR chain of literals — no
    * join, no shuffle, prunes at the scan; the right shape while the
    * list is literal-sized (the web-filter lists are tens of
    * thousands of domains — still an in-task structure, but past a
    * few hundred switch to a broadcast semi-join on
    * [[registeredDomain]]).
    *
    * Returns the input plus `blocked_by` (NULL = clean); filtering is
    * the caller's one-liner, keeping the audit trail first-class.
    */
  def domainGate(df: DataFrame, urlCol: String,
      blocked: Seq[String]): DataFrame = {
    val host = urlHost(col(urlCol))
    val hit = blocked.map(_.toLowerCase).sorted.foldLeft(
        lit(null).cast("string")) { (acc, b) =>
      coalesce(acc,
        when(host === b || host.endsWith("." + b), lit(b)))
    }
    df.withColumn("blocked_by", hit)
  }

  /** Crawl-frontier URL dedup: ONE row per canonical URL, the LATEST
    * fetch winning — stage zero of every web pipeline (the same page
    * is fetched many times; only the newest body matters). Canonical
    * key = normalized host + path-with-query-stripped; one window
    * over the key, ordered (fetch ts DESC, id ASC) for a
    * deterministic winner. Returns winners with `n_fetches`.
    */
  def urlDedup(df: DataFrame, idCol: String, urlCol: String,
      tsCol: String): DataFrame = {
    val canon = concat_ws("/", urlHost(col(urlCol)),
      regexp_replace(
        regexp_extract(col(urlCol), "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+(/[^?#]*)?", 1),
        "/+$", ""))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_canon"))
      .orderBy(col(tsCol).desc, col(idCol))
    df.withColumn("_canon", canon)
      .withColumn("_rn", row_number().over(w))
      .withColumn("n_fetches",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("_canon"))))
      .where(col("_rn") === 1)
      .drop("_rn")
      .withColumnRenamed("_canon", "canonical_url")
  }

  /** Per-document repetition statistics — the Gopher/C4-style
    * repetitiousness filters:
    *  - `dup_token_ratio`: 1 − distinct/total tokens (1 ⇒ one token
    *    repeated throughout);
    *  - `top_bigram_frac`: share of all word bigrams taken by the
    *    most frequent one.
    * Computed by exploding bigrams and aggregating — NOT by a
    * quadratic per-row HOF scan, which would blow up on long
    * documents; both shuffles key on the doc id.
    */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // ONE exchange total: the token arrays shuffle hash-partitioned on
    // the id, after which both groupBys below are exchange-free —
    // HashPartitioning(id) satisfies ClusteredDistribution(id, b) (id
    // is a subset of the grouping keys), so the 200×-wider exploded
    // bigram rows never cross the wire. The per-doc scalar counts ride
    // the exploded rows as constants instead of a separate branch +
    // join (two more exchanges in the old shape).
    // the scalar counts are computed BELOW the exchange: a projection
    // in the same select as an explode is evaluated per EXPLODED row
    // (the Project sits above the Generate), which would re-run
    // array_distinct once per bigram — measured 6x slower than the
    // whole query. Behind the exchange they cross as plain attributes.
    val tok = Parallelism.ensureKeyed(
      df.select(col(idCol).as("id"), tokens(col(textCol)).as("_t"))
        .select(col("id"), col("_t"),
          size(col("_t")).as("_nt"),
          size(array_distinct(col("_t"))).as("_nd")),
      col("id"))
    // explode the shingle EXPRESSION, not a projected attribute:
    // InferFiltersFromGenerate only infers its size(...)>0 filter for
    // cheap (attribute) children, and that inferred filter pushes
    // below the parallelism guard's exchange where it re-evaluates
    // the whole shingle pipeline on the scan's partitioning
    tok.select(col("id"), col("_nt"), col("_nd"),
        explode(shinglesOfTokens(col("_t"), 2)).as("b"))
      .groupBy(col("id"), col("b"))
      .agg(count(lit(1)).as("c"), max(col("_nt")).as("_nt"), max(col("_nd")).as("_nd"))
      .groupBy(col("id"))
      .agg(max(col("c")).as("_top_bigram"), sum(col("c")).as("_n_bigrams"),
        max(col("_nt")).as("_n_tokens"), max(col("_nd")).as("_n_distinct"))
      .select(col("id"),
        round(lit(1.0) - col("_n_distinct").cast("double") / col("_n_tokens"), 6)
          .as("dup_token_ratio"),
        round(col("_top_bigram").cast("double") / col("_n_bigrams"), 6)
          .as("top_bigram_frac"))
  }

  /** Corpus vocabulary: the `k` most frequent tokens with their
    * counts and ranks — the tokenizer-vocabulary step of a training
    * pipeline. Explode + count is one map-side-combined shuffle on
    * the token; the global top-k is a TakeOrdered over the (already
    * aggregated, vocabulary-sized) counts, never a full sort of the
    * corpus. Deterministic tie-break: count desc, token asc. */
  def vocabulary(df: DataFrame, textCol: String, k: Int): DataFrame = {
    val counts = Parallelism.ensure(df.select(col(textCol)))
      .select(explode(tokens(col(textCol))).as("token"))
      .where(col("token") =!= "")
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
    // rank the k survivors by their position in the sort-limit's
    // single ordered partition — zero extra jobs, and no
    // unpartitioned row_number window (WindowExec's global-order path)
    StatsOps.postLimitRank(
      counts.orderBy(col("n").desc, col("token")).limit(k), "rank")
  }

  /** Exact content fingerprint over normalized text (whitespace
    * collapsed, lowercased). */
  def normalizedFingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** BPE-style merge candidates: the `k` most frequent adjacent token
    * pairs corpus-wide — the first iteration of byte-pair-encoding
    * tokenizer training, which at production scale dominates the
    * whole training loop (later iterations run on the shrinking merge
    * table, not the corpus). Pair extraction is [[shinglesOfTokens]]
    * at n=2 (map-side); one (pair) count shuffle with map-side
    * combine; the top-k is a TakeOrdered over the aggregated,
    * pair-vocabulary-sized counts. Tie-break: count desc, pair asc. */
  def bpePairCounts(df: DataFrame, textCol: String, k: Int): DataFrame = {
    val toks = Parallelism.ensure(df.select(col(textCol)))
      .select(filter(tokens(col(textCol)), w => w =!= "").as("t"))
      .where(size(col("t")) >= 2)
    // rank the k survivors by their position in the sort-limit's
    // single ordered partition — zero extra jobs, no unpartitioned
    // row_number window (a constant partition key wouldn't help
    // either: the optimizer folds it away)
    StatsOps.postLimitRank(
      toks.select(explode(shinglesOfTokens(col("t"), 2)).as("pair"))
        .groupBy(col("pair")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("pair")).limit(k), "rank")
  }

  /** Greedy BPE merge training (the Sennrich et al. 2016 procedure)
    * over the corpus word-frequency table. The CORPUS is touched
    * exactly once — one token explode into word counts; every merge
    * round after that runs on the VOCABULARY-sized symbol table
    * (count adjacent symbol pairs weighted by word frequency, take
    * the argmax, fold the winning pair into the symbol arrays), so
    * at 100 TB the iteration cost is independent of corpus size.
    * Rounds localCheckpoint to keep the plan flat and free the
    * superseded round's blocks deterministically (the
    * duplicateClusters loop's discipline). Deterministic argmax:
    * count desc, then pair lexicographic. Stops early when the best
    * pair's count drops below `minPairCount`.
    *
    * Returns the learned merge rules in application order; apply
    * them with [[bpeSegment]] (driver-side greedy encoder, used by
    * the spec to pin the algebra).
    */
  def bpeTrain(df: DataFrame, textCol: String, merges: Int,
      minPairCount: Long = 2L): Seq[(String, String)] = {
    val chars = transform(
      sequence(lit(1), length(col("w"))),
      i => col("w").substr(i, lit(1)))
    var vocab = Parallelism.ensure(df.select(col(textCol)))
      .select(explode(tokens(col(textCol))).as("w"))
      .where(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(chars.as("syms"), col("freq"))
      .localCheckpoint(false)
    val learned = scala.collection.mutable.Buffer.empty[(String, String)]
    var done = false
    while (learned.size < merges && !done) {
      val adj = zip_with(
        slice(col("syms"), lit(1), size(col("syms")) - 1),
        slice(col("syms"), lit(2), size(col("syms")) - 1),
        (a, b) => struct(a.as("a"), b.as("b")))
      val top = vocab.select(col("freq"), explode(adj).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("n"))
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty || top(0).getLong(2) < minPairCount) done = true
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        learned += ((a, b))
        // fold the merge into each word greedily left-to-right: the
        // running array's last element merges with the next symbol
        // when they form the winning pair (so "aaa" under (a,a)
        // becomes [aa, a], matching the reference encoder)
        val fold = aggregate(col("syms"),
          array().cast("array<string>"),
          (acc, x) => when(
            size(acc) > 0 && element_at(acc, -1) === lit(a) && x === lit(b),
            concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
            .otherwise(concat(acc, array(x))))
        val next = vocab.select(fold.as("syms"), col("freq"))
          .localCheckpoint(false)
        next.rdd.count() // materialize before freeing the old round
        freeLocalCheckpoint(vocab)
        vocab = next
      }
    }
    freeLocalCheckpoint(vocab)
    learned.toSeq
  }

  private def freeLocalCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Driver-side greedy BPE encoder over learned merge rules —
    * reference implementation for specs and small-scale encoding.
    * Applies each merge left-to-right in learned order, the same
    * fold [[bpeTrain]] runs distributed.
    */
  def bpeSegment(word: String, merges: Seq[(String, String)]): Seq[String] =
    merges.foldLeft(word.map(_.toString): Seq[String]) { case (syms, (a, b)) =>
      val out = scala.collection.mutable.Buffer.empty[String]
      syms.foreach { s =>
        if (out.nonEmpty && out.last == a && s == b)
          out(out.size - 1) = a + b
        else out += s
      }
      out.toSeq
    }

  /** Distributed BPE encoding: apply learned merge rules to every
    * document, map-side. Returns (idCol, subwords array).
    *
    * Encoding is genuinely imperative per word (a data-dependent
    * merge loop), so this is the §2.11 ladder's last rung —
    * `mapPartitions` — used where it is the honest fit: the merge
    * table broadcasts once per executor, a per-partition memo cache
    * collapses the Zipf-heavy word stream to one segmentation per
    * DISTINCT word (capped to bound executor memory), and the
    * operator stays embarrassingly parallel: zero shuffles, linear
    * scan, output partitioning = input partitioning. Word splitting
    * matches [[tokens]] (trim → lower → split on whitespace) so
    * subword counts compose with the token-count gates.
    */
  def bpeEncode(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)], cacheCap: Int = 1 << 20): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(merges.toArray)
    df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val m = bc.value.toSeq
        val cache = new java.util.HashMap[String, Array[String]]()
        def segment(w: String): Array[String] = {
          val hit = cache.get(w)
          if (hit != null) hit
          else {
            val seg = bpeSegment(w, m).toArray
            if (cache.size < cacheCap) cache.put(w, seg)
            seg
          }
        }
        it.map { case (id, text) =>
          val words =
            if (text == null) Array.empty[String]
            else text.trim.toLowerCase(java.util.Locale.ROOT)
              .split("\\s+").filter(_.nonEmpty)
          (id, words.flatMap(segment).toSeq)
        }
      }.toDF(idCol, "subwords")
  }

  /** Per-document out-of-vocabulary rate against the corpus top-`k`
    * vocabulary — the coverage check run before committing to a
    * tokenizer vocab. The vocabulary is k rows (broadcast); the
    * corpus-sized work is one token explode feeding a per-doc
    * conditional count, so the doc shuffle carries two longs per
    * document. Documents whose text tokenizes to nothing drop out
    * (no tokens to rate). */
  def oovRate(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    // Tokenize ONCE, shuffle raw tokens NEVER: the doc-keyed exchange
    // happens before tokenization (compact texts, not exploded
    // tokens), after which HashPartitioning(doc) already satisfies the
    // (doc, token) clustering — the count aggregation is exchange-free
    // and reduces each doc to its distinct tokens in place. The
    // checkpoint materializes that compact count table so BOTH
    // consumers (corpus vocabulary, per-doc rating) read it without
    // re-running the regex tokenize; it is bounded by distinct
    // (doc, token) — far below the raw token stream a shared shuffle
    // would carry. The vocab branch then shuffles vocabulary-sized
    // data and broadcasts k rows back at the rating join.
    val dt = Parallelism.ensureKeyed(
        df.select(col(idCol), col(textCol)), col(idCol))
      .select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .where(col("token") =!= "")
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("_c"))
      .localCheckpoint()
    val vocab = dt.groupBy(col("token")).agg(sum(col("_c")).as("_n"))
      .orderBy(col("_n").desc, col("token")).limit(k)
      .select(col("token"), lit(1).as("_in_vocab"))
    dt.join(broadcast(vocab), Seq("token"), "left_outer")
      .groupBy(col(idCol))
      .agg(sum(col("_c")).as("n_tokens"),
        sum(when(col("_in_vocab").isNull, col("_c")).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate",
        round(col("n_oov").cast("double") / col("n_tokens").cast("double"), 6))
  }

  /** Per-group top-`k` character n-gram profile over each document's
    * first `prefixChars` characters — the feature table a trained
    * language identifier is built from (prefix-bounded so cost per
    * document is O(prefixChars), not O(doc)). The prefix projection
    * is materialized by the parallelism exchange BEFORE the per-gram
    * lambda runs: higher-order-function lambdas inline shared
    * subtrees without CSE, so an un-materialized lower(substring(..))
    * would re-run once per gram. One (group, gram) count shuffle;
    * the rank window runs on gram-vocabulary-sized data. */
  def charNgramProfile(df: DataFrame, groupCol: String, textCol: String,
      n: Int = 3, k: Int = 5, prefixChars: Int = 200): DataFrame = {
    val pref = Parallelism.ensure(df.select(col(groupCol),
      lower(substring(col(textCol), 1, prefixChars)).as("_pref")))
    val p = col("_pref")
    // explode the POSITIONS, then substring in a separate projection:
    // both Generate-over-sequence and substring are whole-stage
    // codegen'd, whereas transform(sequence, i -> substr) evaluates an
    // interpreted lambda per gram (~1M evals at sf0.1, measured ~2x
    // slower). The prefix column rides the pipelined Generate; nothing
    // is materialized before the partial aggregate.
    val counts = pref.where(length(p) >= n)
      .select(col(groupCol), p,
        explode(sequence(lit(1), length(p) - (n - 1))).as("_i"))
      .select(col(groupCol), p.substr(col("_i"), lit(n)).as("gram"))
      .groupBy(col(groupCol), col("gram")).agg(count(lit(1)).as("n"))
    counts.withColumn("rank", row_number().over(
        Window.partitionBy(col(groupCol)).orderBy(col("n").desc, col("gram"))))
      .where(col("rank") <= k)
  }

  /** Per-document top-k TF-IDF terms: (id, token, tf, score, rank).
    *
    * Shape at scale: one (id, token) shuffle builds term counts, one
    * token-keyed shuffle builds document frequencies; the resulting
    * idf table is vocabulary-sized (orders of magnitude smaller than
    * the corpus) so AQE broadcasts the join back. Top-k per document
    * is a doc-keyed window with k tiny, so per-group state is
    * bounded. idf uses the smoothed form ln((1+N)/(1+df)) + 1 — every
    * score is a pure double function of exact integer counts, hence
    * engine-reproducible.
    */
  def tfidfTopTerms(
      df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    // explode the EXPRESSION, not a projected alias of it:
    // InferFiltersFromGenerate only infers size()>0 for attribute
    // children, and that inferred filter would drag the tokenize
    // below the parallelism repartition onto the raw scan's (often
    // single) partition
    val tf = Parallelism.ensure(df.select(col(idCol), col(textCol)))
      .select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .where(col("token") =!= "")
      .groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
    // N as a 1-row broadcast so the whole computation stays one
    // declarative plan (no driver-side count action)
    val nDocs = df.groupBy().agg(count(lit(1)).as("n_docs"))
    // document frequency as a token-partitioned window COUNT over the
    // tf rows (distinct per (id, token)) rather than a second
    // aggregate + join back: a join formulation makes the optimizer
    // specialize the two consumers of tf into *different* subplans
    // (count-distinct vs count) and the whole tokenize+shuffle runs
    // twice — measured 2× on the single-pass shape
    val wTok = org.apache.spark.sql.expressions.Window
      .partitionBy(col("token"))
    val wDoc = org.apache.spark.sql.expressions.Window.partitionBy(col(idCol))
      .orderBy((col("tf") * col("idf")).desc, col("token"))
    tf.withColumn("df", count(lit(1)).over(wTok))
      .crossJoin(broadcast(nDocs))
      .withColumn("idf",
        log((lit(1.0) + col("n_docs")) / (lit(1.0) + col("df"))) + 1.0)
      .withColumn("rank", row_number().over(wDoc))
      .where(col("rank") <= k)
      .select(col(idCol), col("token"), col("tf"),
        round(col("tf") * col("idf"), 6).as("score"), col("rank"))
  }

  /** BM25 document ranking for a fixed bag-of-terms query.
    *
    * Okapi BM25 with Lucene's non-negative idf
    * ln(1 + (N - df + 0.5)/(df + 0.5)). The corpus-level inputs
    * (N, avgdl, per-term df) are scalars / |query|-sized — both
    * broadcast — so the only shuffle over the corpus is the
    * (id, token) term count, and the probe side never moves. The
    * per-document sum folds contributions in token order
    * (sort_array + aggregate) so the double result is deterministic
    * under any partitioning.
    */
  def bm25(df: DataFrame, idCol: String, textCol: String,
      query: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    // Single tokenize pass: per-(id, token) counts are the only
    // corpus-sized shuffle. Document length dl is the per-doc window
    // SUM of tf, document frequency df the per-token window COUNT —
    // both derived from the same tf rows, so the two consumers share
    // one exchange (a join formulation would re-tokenize; see
    // tfidfTopTerms). Documents are those with at least one token —
    // the oracle filters length(trim(text)) > 0 identically.
    val tf = Parallelism.ensure(df.select(col(idCol), col(textCol)))
      .select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .where(col("token") =!= "")
      .groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
    val stats = tf.groupBy(col(idCol))
      .agg(sum(col("tf")).cast("double").as("_dl"))
      .groupBy().agg(count(lit(1)).cast("double").as("n_docs"),
        avg(col("_dl")).as("avgdl"))
    val wDoc = org.apache.spark.sql.expressions.Window.partitionBy(col(idCol))
    val wTok = org.apache.spark.sql.expressions.Window
      .partitionBy(col("token"))
    tf.withColumn("dl", sum(col("tf")).over(wDoc).cast("double"))
      .where(col("token").isin(query: _*))
      .withColumn("df", count(lit(1)).over(wTok))
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("w", col("idf") * (col("tf") * (k1 + 1)) /
        (col("tf") + lit(k1) *
          (lit(1.0) - b + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col(idCol))
      .agg(sum(col("w").cast(org.apache.spark.sql.types.DecimalType(28, 12)))
        .as("_wsum"))
      .select(col(idCol),
        round(col("_wsum").cast("double"), 6).as("score"))
  }

  /** Per-document mean unigram log-probability under the corpus's own
    * unigram model — the cheap stand-in for perplexity filtering: a
    * document of tokens the corpus rarely uses scores low, boilerplate
    * scores high. Output: (id, n_tokens, avg_logprob); perplexity is
    * exp(-avg_logprob), monotone in the score, so thresholding on the
    * log-domain value avoids a second engine-dependent exp().
    *
    * Same single-pass shape as [[bm25]]: one (id, token) count
    * shuffle; corpus token frequency is a token-partitioned window
    * SUM and the grand total a 1-row broadcast. The per-document mean
    * folds tf-weighted contributions in sorted token order, so the
    * double is partitioning-invariant (and engine-reproducible).
    */
  def unigramLogProb(
      df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // keyed exchange (see tokenEntropy): the (id, token) aggregation
    // is exchange-free; only the corpus-wide token window and the
    // final per-doc fold shuffle
    val tf = Parallelism.ensureKeyed(
        df.select(col(idCol), col(textCol)), col(idCol))
      .select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .where(col("token") =!= "")
      .groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
    val total = tf.groupBy().agg(sum(col("tf")).cast("double").as("total"))
    val wTok = org.apache.spark.sql.expressions.Window
      .partitionBy(col("token"))
    tf.withColumn("n", sum(col("tf")).over(wTok))
      .crossJoin(broadcast(total))
      .withColumn("w", col("tf") * log(col("n") / col("total")))
      .groupBy(col(idCol))
      .agg(sum(col("w").cast(org.apache.spark.sql.types.DecimalType(28, 12)))
          .as("_wsum"),
        sum(col("tf")).as("n_tokens"))
      .select(col(idCol), col("n_tokens"),
        round(col("_wsum").cast("double") / col("n_tokens"), 6)
          .as("avg_logprob"))
  }

  /** Per-document mean bigram log-probability under the corpus's own
    * MLE bigram model: P(w₂|w₁) = c(w₁,w₂) / c(w₁·) — the next step up
    * from [[unigramLogProb]] toward perplexity filtering (a document
    * whose word *transitions* are unusual scores low even when its
    * vocabulary is common). Every observed bigram has c ≥ 1 so the log
    * is always defined; documents with < 2 tokens drop out (no
    * bigrams to score).
    *
    * Shape at scale: bigrams are built map-side from the token array
    * (no positional self-join), then ONE (id, w₁, w₂) count shuffle;
    * the two model counts come from two window sums over the same
    * sorted run — `partitionBy(w₁, w₂)` and `partitionBy(w₁)` share
    * the w₁-prefix exchange. The per-document mean folds in sorted
    * bigram order, so the double is partitioning-invariant.
    */
  def bigramLogProb(
      df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val n1 = greatest(size(toks) - 1, lit(0))
    val bigrams = filter(
      zip_with(slice(toks, lit(1), n1), slice(toks, lit(2), n1),
        (a, b) => struct(a.as("w1"), b.as("w2"))),
      p => p.getField("w1") =!= "" && p.getField("w2") =!= "")
    val tf = Parallelism.ensureKeyed(
        df.select(col(idCol), col(textCol)), col(idCol))
      .select(col(idCol), explode(bigrams).as("bg"))
      .select(col(idCol), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .groupBy(col(idCol), col("w1"), col("w2")).agg(count(lit(1)).as("tf"))
    val wBigram = org.apache.spark.sql.expressions.Window
      .partitionBy(col("w1"), col("w2"))
    val wFirst = org.apache.spark.sql.expressions.Window
      .partitionBy(col("w1"))
    tf.withColumn("c_big", sum(col("tf")).over(wBigram))
      .withColumn("c_first", sum(col("tf")).over(wFirst))
      .withColumn("w", col("tf") * log(col("c_big") / col("c_first")))
      .groupBy(col(idCol))
      .agg(sum(col("w").cast(org.apache.spark.sql.types.DecimalType(28, 12)))
          .as("_wsum"),
        sum(col("tf")).as("n_bigrams"))
      .select(col(idCol), col("n_bigrams"),
        round(col("_wsum").cast("double") / col("n_bigrams"), 6)
          .as("avg_logprob"))
  }

  /** BPE-ish pre-tokenizer pattern — the GPT-2 shape (contraction
    * suffixes, space-prefixed letter runs, digit runs, punctuation
    * runs, whitespace) WITHOUT the trailing-space lookahead, so one
    * pattern runs identically under Java regex (Spark) and RE2
    * (DuckDB, which rejects lookahead). Alternation order is the
    * semantics: both engines take the first branch that matches.
    */
  val BpeishPattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^\\sa-z0-9]+|\\s+"

  /** Token count under [[BpeishPattern]] — the budget a BPE-family
    * tokenizer would charge, vs the whitespace count every quality
    * heuristic uses. Map-side `regexp_extract_all`; the ratio of the
    * two is the punctuation/number-density signal. */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit(BpeishPattern), lit(0)))
      .cast("long")

  /** Per-document mean log-probability under an interpolated
    * Kneser–Ney bigram model — the standard smoothing for
    * perplexity-based quality filtering (what KenLM computes for
    * CCNet-style pipelines), one order down so the whole model stays
    * SQL-mirrorable:
    *
    *   P(w₂|w₁) = max(c(w₁w₂) − D, 0)/c(w₁·)
    *            + D·N₁₊(w₁·)/c(w₁·) · N₁₊(·w₂)/N₁₊(··)
    *
    * Unlike the MLE model ([[bigramLogProb]]), mass moves from
    * observed counts to the CONTINUATION distribution — "how many
    * contexts does w₂ complete" — which is what stops
    * high-frequency-but-context-bound tokens from inflating scores.
    *
    * Shape at scale: the doc-bigram count table shuffles once per
    * model statistic it joins ((w₁w₂) types, w₁ totals, w₂
    * continuation counts — each aggregation bounded by bigram TYPE
    * cardinality, the grand type total a 1-row broadcast), then one
    * id aggregation for the per-doc fold. The model never
    * broadcasts — bigram types at corpus scale are join-sized, not
    * driver-sized. The probability is ONE fixed-association double
    * expression over integer counts, so scores are engine-identical;
    * the per-doc mean rides the DECIMAL(28,12) estimator contract.
    */
  def knBigramLogProb(df: DataFrame, idCol: String, textCol: String,
      discount: Double = 0.75): DataFrame = {
    val toks = tokens(col(textCol))
    val n1 = greatest(size(toks) - 1, lit(0))
    val bigrams = filter(
      zip_with(slice(toks, lit(1), n1), slice(toks, lit(2), n1),
        (a, b) => struct(a.as("w1"), b.as("w2"))),
      p => p.getField("w1") =!= "" && p.getField("w2") =!= "")
    val tf = Parallelism.ensureKeyed(
        df.select(col(idCol), col(textCol)), col(idCol))
      .select(col(idCol), explode(bigrams).as("bg"))
      .select(col(idCol), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .groupBy(col(idCol), col("w1"), col("w2")).agg(count(lit(1)).as("tf"))
      // four consumers (the scoring join + three model statistics)
      // would otherwise each re-run the tokenize+explode corpus scan —
      // measured 4x the corpus CPU at sf0.1; the checkpoint
      // materializes the compact count table once (lazy: the query's
      // own first pass is the materializing one)
      .localCheckpoint(false)
    // The model statistics consume this one table four ways; each
    // consumer's copy of the aggregation is made structurally
    // DISTINCT by the optimizer (join-key isnotnull inference +
    // per-branch aggregate pruning), so exchange reuse can never
    // serve them and the corpus-side scan would run four times
    // (measured: 4 identical 29k-row exchanges, zero reused, at
    // sf0.1). Checkpoint the bigram-TYPE table (bounded by type
    // cardinality, not corpus size) and derive the w1/w2 statistics
    // as partitioned WINDOWS over it — the [[bigramLogProb]] shape —
    // so each statistic is a pass over the materialized types, not a
    // re-aggregation of the corpus.
    val types = tf.groupBy(col("w1"), col("w2"))
      .agg(sum(col("tf")).as("c_big"))
      .localCheckpoint(false)
    val wByW1 = org.apache.spark.sql.expressions.Window.partitionBy(col("w1"))
    val wByW2 = org.apache.spark.sql.expressions.Window.partitionBy(col("w2"))
    val totalTypes = broadcast(
      types.groupBy().agg(count(lit(1)).as("t_types")))
    val model = types
      .withColumn("c_first", sum(col("c_big")).over(wByW1))
      .withColumn("n1p_first", count(lit(1)).over(wByW1))
      .withColumn("n1p_cont", count(lit(1)).over(wByW2))
      .crossJoin(totalTypes)
      .select(col("w1"), col("w2"),
        (greatest(col("c_big") - discount, lit(0.0)) / col("c_first") +
          lit(discount) * col("n1p_first") / col("c_first") *
            (col("n1p_cont") / col("t_types"))).as("p_kn"))
    // The scoring join is hinted MERGE: the model is join-sized (it
    // grows with bigram TYPE cardinality), and an AQE broadcast of a
    // multi-million-entry two-string-key hash table is a per-row
    // random-access probe that loses to a partitioned join long
    // before it stops FITTING — measured at 10x: the broadcast plan
    // ran 5.8-6.5s against 2.1-2.6s for the partitioned one (and 30x,
    // where AQE crossed back to sort-merge on its own, ran FASTER
    // than 10x). The hint enforces what the scale contract above
    // already promises: the model never broadcasts.
    tf.join(model.hint("merge"), Seq("w1", "w2"))
      .withColumn("w", col("tf") * log(col("p_kn")))
      .groupBy(col(idCol))
      .agg(sum(col("w").cast(org.apache.spark.sql.types.DecimalType(28, 12)))
          .as("_wsum"),
        sum(col("tf")).as("n_bigrams"))
      .select(col(idCol), col("n_bigrams"),
        round(col("_wsum").cast("double") / col("n_bigrams"), 6)
          .as("avg_logprob"))
  }

  /** Per-document token (Shannon) entropy in nats — the
    * repetitiveness signal orthogonal to [[repetitionStats]]: low
    * entropy = few distinct tokens dominate. H = −Σ (tf/n)·ln(tf/n).
    *
    * One (id, token) count shuffle; the per-document total rides a
    * doc-partitioned window over the same sorted run, and the entropy
    * folds in sorted token order (partitioning-invariant double).
    */
  def tokenEntropy(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // keyed exchange: partitioning the raw (id, text) rows on the id
    // makes the (id, token) aggregation, the per-doc window, AND the
    // final per-doc aggregation all exchange-free — the exploded token
    // rows never shuffle (three exchanges in the round-robin shape)
    val tf = Parallelism.ensureKeyed(
        df.select(col(idCol), col(textCol)), col(idCol))
      .select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .where(col("token") =!= "")
      .groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
    val wDoc = org.apache.spark.sql.expressions.Window.partitionBy(col(idCol))
    tf.withColumn("n", sum(col("tf")).over(wDoc))
      .withColumn("w", -(col("tf") / col("n")) * log(col("tf") / col("n")))
      .groupBy(col(idCol))
      .agg(sum(col("w").cast(org.apache.spark.sql.types.DecimalType(28, 12)))
          .as("_wsum"),
        sum(col("tf")).as("n_tokens"),
        count(lit(1)).as("n_distinct"))
      .select(col(idCol), col("n_tokens"), col("n_distinct"),
        round(col("_wsum").cast("double"), 6).as("entropy"))
  }

  /** KL divergence of each group's token distribution from the whole
    * corpus's — the domain-shift / mixture-balance measure:
    * KL(p_g ‖ p_c) = Σ_t p_g(t)·ln(p_g(t)/p_c(t)), always defined
    * because every group token is a corpus token (p_c > 0 wherever
    * p_g > 0).
    *
    * One (group, token) count shuffle; group totals and corpus token
    * totals are window sums (the corpus grand total broadcasts as one
    * row); the sum folds per group in sorted token order.
    */
  def klDivergence(df: DataFrame, groupCol: String, textCol: String): DataFrame = {
    val tf = Parallelism.ensure(df.select(col(groupCol), col(textCol)))
      .select(col(groupCol), explode(tokens(col(textCol))).as("token"))
      .where(col("token") =!= "")
      .groupBy(col(groupCol), col("token")).agg(count(lit(1)).as("tf"))
    val wGroup = org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
    val wToken = org.apache.spark.sql.expressions.Window.partitionBy(col("token"))
    val total = tf.groupBy().agg(sum(col("tf")).cast("double").as("n_c"))
    tf.withColumn("n_g", sum(col("tf")).over(wGroup))
      .withColumn("tf_c", sum(col("tf")).over(wToken))
      .crossJoin(broadcast(total))
      .withColumn("w", (col("tf") / col("n_g")) *
        log((col("tf") / col("n_g")) / (col("tf_c") / col("n_c"))))
      .groupBy(col(groupCol))
      .agg(sum(col("w").cast(org.apache.spark.sql.types.DecimalType(28, 12)))
          .as("_wsum"),
        sum(col("tf")).as("n_tokens"))
      .select(col(groupCol), col("n_tokens"),
        round(col("_wsum").cast("double"), 6).as("kl_divergence"))
  }

  /** Inverted index: token -> (df, comma-joined sorted posting list).
    *
    * One (id, token) distinct shuffle then a token-keyed aggregation.
    * Posting lists are capped at `maxPostings` ids (taken from the
    * sorted list, i.e. the smallest ids) — at corpus scale a stopword's
    * postings would otherwise be the whole corpus; a production index
    * would swap the collect for a bounded typed aggregator (see
    * TopKAggregator) but the cap keeps per-group state from dominating
    * executor memory either way.
    */
  def invertedIndex(df: DataFrame, idCol: String, textCol: String,
      maxPostings: Int = 1000): DataFrame =
    Parallelism.ensure(df.select(col(idCol), col(textCol)))
      .select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .where(col("token") =!= "")
      .groupBy(col("token"), col(idCol)).agg(count(lit(1)).as("_n"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("df"),
        concat_ws(",",
          slice(sort_array(collect_list(col(idCol))), 1, maxPostings))
          .as("postings"))

  /** Span-level exact dedup (the line/paragraph dedup of CCNet and
    * RefinedWeb, over fixed `spanWords`-word spans since the fixture
    * corpus has no line structure): every repeated span keeps only
    * its first occurrence corpus-wide — ordered by (doc, position) —
    * and documents are reassembled from their surviving spans.
    *
    * Returns (id, deduped_text, n_spans, n_kept). Shuffle profile:
    * explode → one shuffle on the span string for the first-occurrence
    * window, one shuffle back on the doc id for reassembly — both
    * unavoidable for a corpus-global answer, both AQE-coalesced. Span
    * strings travel the exchange instead of full documents, so skew
    * from one giant document cannot overload a reducer; a hot
    * boilerplate span concentrates only (doc_id, pos) pairs, which
    * are tiny.
    */
  def spanDedup(df: DataFrame, idCol: String, textCol: String,
      spanWords: Int = 4): DataFrame = {
    val id = col(idCol)
    // (id, span_index, span_text), spans of exactly spanWords tokens
    // (the tail span may be shorter)
    val spans = Parallelism.ensureKeyed(df.select(id, col(textCol)), id)
      .select(id, posexplode(tokens(col(textCol))).as(Seq("_i", "_w")))
      .groupBy(id, (col("_i") / spanWords).cast("long").as("_span"))
      .agg(concat_ws(" ",
        sort_array(collect_list(struct(col("_i"), col("_w"))))
          .getField("_w")).as("_text"))
    val firstSeen = Window.partitionBy(col("_text"))
      .orderBy(id.asc, col("_span").asc)
    val kept = spans
      .withColumn("_rank", row_number().over(firstSeen))
      .withColumn("_keep", col("_rank") === 1)
    kept.groupBy(id)
      .agg(
        concat_ws(" ",
          sort_array(collect_list(
            when(col("_keep"), struct(col("_span"), col("_text")))))
            .getField("_text")).as("deduped_text"),
        count(lit(1)).as("n_spans"),
        sum(col("_keep").cast("long")).as("n_kept"))
  }

  /** End-to-end corpus cleaning in ONE declarative plan — the
    * composition a training-data pipeline actually ships: language
    * allowlist, then minimum token count, then the quality-score
    * gate, then exact-duplicate removal keeping the smallest id per
    * normalized fingerprint.
    *
    * Shape at scale: every gate is a pure column predicate, so the
    * filters run map-side on the parquet scan (language equality
    * pushes into the scan itself) and only SURVIVORS reach the single
    * fingerprint-keyed exchange for the keep-min window. At 100 TB
    * the shuffle carries the cleaned subset, not the corpus, and each
    * stage's selectivity is observable per-partition in the UI. The
    * output keeps the input columns plus the computed `quality`.
    */
  def cleanCorpus(df: DataFrame, idCol: String, textCol: String,
      langCol: String, langs: Seq[String], minTokens: Int,
      minQuality: Double): DataFrame = {
    val gated = df
      .where(col(langCol).isin(langs: _*))
      .where(tokenCount(col(textCol)) >= minTokens)
      .withColumn("quality", qualityScore(col(textCol)))
      .where(col("quality") >= minQuality)
      .withColumn("_fp", normalizedFingerprint(col(textCol)))
    val w = Window.partitionBy(col("_fp")).orderBy(col(idCol))
    gated.withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1).drop("_fp", "_rn")
  }

  /** The Gopher stopword containment set (Rae et al. 2021, A1.1). */
  val gopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher-rule document gate (Rae et al., "Scaling Language
    * Models: ... Gopher", 2021, appendix A1.1): the canonical
    * heuristic filter batch — word-count band, mean-word-length
    * band, symbol-to-word ratio (# and ... as the symbol set),
    * alphabetic-word fraction, stopword containment — evaluated
    * per document with every rule's metric EXPOSED, not just the
    * verdict, so a pipeline can audit which rule fired and tune
    * thresholds against its own corpus.
    *
    * Pure map-side column arithmetic: no shuffle, no UDF; ratios
    * round to 6 dp and the keep decision compares the ROUNDED
    * values, so the gate is reproducible across engines and
    * partitionings. Zero-token documents report zero ratios and
    * fail the word-count band.
    */
  def gopherQuality(df: DataFrame, idCol: String, textCol: String,
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1, minAlphaFrac: Double = 0.8,
      minStopwords: Int = 2): DataFrame = {
    // tokenize ONCE in a producer projection: four of the five
    // metrics consume the word array, and CollapseProject keeps the
    // two projections apart when a non-cheap producer expression has
    // multiple consumers — without this the regex tokenizer runs
    // 4x per row
    val (n, meanLen, symRatio, alphaFrac, nStop) =
      gopherMetricsFrom(col(textCol), col("_w"))
    df.select(col(idCol), col(textCol), gopherWords(col(textCol)).as("_w"))
      .select(col(idCol), n.cast("long").as("n_words"),
        meanLen.as("mean_word_len"), symRatio.as("symbol_ratio"),
        alphaFrac.as("alpha_frac"), nStop.as("n_stopwords"))
      .withColumn("keep",
        when(col("n_words") >= minWords && col("n_words") <= maxWords &&
          col("mean_word_len") >= minMeanLen &&
          col("mean_word_len") <= maxMeanLen &&
          col("symbol_ratio") <= maxSymbolRatio &&
          col("alpha_frac") >= minAlphaFrac &&
          col("n_stopwords") >= minStopwords, 1).otherwise(0))
  }

  /** The keep verdict of [[gopherQuality]] as a single scalar column
    * (registered in SQL as `graft_gopher_keep(text)`), canonical
    * thresholds. */
  def gopherKeep(text: Column, minWords: Int = 50, maxWords: Int = 100000,
      minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1, minAlphaFrac: Double = 0.8,
      minStopwords: Int = 2): Column = {
    val (n, meanLen, symRatio, alphaFrac, nStop) = gopherMetrics(text)
    when(n >= minWords && n <= maxWords &&
      meanLen >= minMeanLen && meanLen <= maxMeanLen &&
      symRatio <= maxSymbolRatio && alphaFrac >= minAlphaFrac &&
      nStop >= minStopwords, 1).otherwise(0)
  }

  /** The non-empty word array the Gopher metrics are computed over. */
  private def gopherWords(text: Column): Column =
    filter(tokens(text), x => x =!= "")

  private def gopherMetrics(text: Column)
      : (Column, Column, Column, Column, Column) =
    gopherMetricsFrom(text, gopherWords(text))

  /** [[gopherMetrics]] over a pre-computed word array `w` — lets
    * DataFrame-level callers project the tokenization once instead of
    * re-evaluating it inside every metric. `gopherKeep` stays on the
    * single-expression form (it is registered as a scalar SQL
    * function, so it has no projection to share). */
  private def gopherMetricsFrom(text: Column, w: Column)
      : (Column, Column, Column, Column, Column) = {
    val n = size(w)
    val nd = n.cast("double")
    val hashes = (length(text) - length(regexp_replace(text, "#", "")))
      .cast("double")
    val ellipses = (length(text) -
      length(regexp_replace(text, "\\.\\.\\.", ""))).cast("double") / lit(3)
    // sum of token lengths via a fold — concat_ws("", w) computes the
    // same number but materializes the full concatenated document per
    // row just to take its length
    val meanLen = when(n === 0, 0.0)
      .otherwise(round(
        aggregate(w, lit(0L), (acc, x) => acc + length(x)).cast("double") / nd,
        6))
    val symRatio = when(n === 0, 0.0)
      .otherwise(round((hashes + ellipses) / nd, 6))
    val alphaFrac = when(n === 0, 0.0)
      .otherwise(round(
        size(filter(w, x => x.rlike("[a-z]"))).cast("double") / nd, 6))
    val nStop =
      size(filter(w, x => x.isin(gopherStopwords.map(lit(_)): _*)))
        .cast("long")
    (n, meanLen, symRatio, alphaFrac, nStop)
  }

  /** The APPLY step of exact-substring dedup (Lee et al. 2022): cut
    * every token range that repeats EARLIER content and reassemble
    * the text, keeping each duplicated run's first occurrence
    * corpus-wide. Where [[duplicateSpans]] audits (it marks every
    * occurrence), this transforms: a window is cut only when its
    * n-gram already occurred at a smaller (doc, position) — so
    * "x y z x y z x y z" keeps exactly one "x y z", and the first
    * copy of a boilerplate paragraph survives while every later copy
    * across the corpus is removed.
    *
    * Returns (id, clean_text, n_tokens, n_cut). Shuffle profile:
    * the same keyed-tokenize + gram exchanges as [[duplicateSpans]]
    * (rank instead of count over the gram window), an id-keyed
    * island aggregation, then ONE broadcast-free join of the
    * island lists back onto the token arrays — per-doc island lists
    * are bounded by the doc's own window count, and the cut itself
    * is an index-aware array filter, no second explode.
    */
  def cutDuplicateSpans(df: DataFrame, idCol: String, textCol: String,
      spanWords: Int = 4): DataFrame = {
    val id = col(idCol)
    val n = spanWords
    val toks = Parallelism.ensureKeyed(
      df.select(id, filter(tokens(col(textCol)), x => x =!= "").as("_toks")),
      id)
    val gramArr = when(size(col("_toks")) >= n,
        transform(sequence(lit(0), size(col("_toks")) - n),
          i => concat_ws(" ", slice(col("_toks"), i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))
    val grams = toks.select(id, posexplode(gramArr).as(Seq("pos", "gram")))
    // keep-first: a window is a repeat iff an earlier (doc, pos) has
    // the same gram — rank over the gram partition, occurrence order
    val repeats = grams
      .withColumn("_rk", row_number().over(
        Window.partitionBy(col("gram")).orderBy(id.asc, col("pos").asc)))
      .where(col("_rk") > 1)
      .select(id, col("pos"))
    val wDoc = Window.partitionBy(id).orderBy(col("pos"))
    val islands = repeats
      .withColumn("_end", col("pos") + n)
      .withColumn("_covered",
        max(col("_end")).over(wDoc.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("_new",
        when(col("_covered").isNull || col("pos") > col("_covered"), 1)
          .otherwise(0))
      .withColumn("_isl", sum(col("_new")).over(wDoc))
      .groupBy(id, col("_isl"))
      .agg(min(col("pos")).as("_s"), max(col("_end")).as("_e"))
      .groupBy(id)
      .agg(collect_list(struct(col("_s"), col("_e"))).as("_cuts"))
    toks.join(islands, Seq(idCol), "left")
      .select(id,
        coalesce(col("_cuts"),
          array().cast("array<struct<_s:int,_e:int>>")).as("_cuts"),
        col("_toks"))
      .select(id,
        concat_ws(" ", filter(col("_toks"), (w, i) =>
          !exists(col("_cuts"), c =>
            i >= c.getField("_s") && i < c.getField("_e"))))
          .as("clean_text"),
        size(col("_toks")).cast("long").as("n_tokens"),
        coalesce(aggregate(col("_cuts"), lit(0),
            (acc, c) => acc + (c.getField("_e") - c.getField("_s"))), lit(0))
          .cast("long").as("n_cut"))
  }

  /** Maximal duplicated token ranges — the exact-substring dedup
    * shape of Lee et al., "Deduplicating Training Data Makes
    * Language Models Better" (2022), re-expressed for the engine:
    * instead of a corpus suffix array, every OVERLAPPING
    * `spanWords`-gram is marked duplicated when it occurs more than
    * once corpus-wide (including twice in one document), and each
    * document's marked windows merge into maximal islands — the
    * token ranges a substring-level dedup pass would cut. Unlike
    * [[spanDedup]]'s fixed non-overlapping blocks, the islands are
    * position-exact: a 50-token boilerplate paragraph comes back as
    * ONE [start, end) range whatever its alignment.
    *
    * Returns (id, span_start, span_end, span_tokens): token-index
    * ranges, end exclusive, ordered by construction per document.
    *
    * Shuffle profile: tokenize once behind the keyed exchange, one
    * gram-keyed exchange for the corpus-global occurrence count, one
    * id-keyed exchange for the island merge (the merge's two windows
    * and the island aggregation share that one sort). The gram
    * window carries (id, pos, gram) — a hot boilerplate gram
    * concentrates only (id, pos) pairs on its reducer, same bound as
    * [[spanDedup]]; the count-only frame lets WindowExec spill its
    * buffered rows, and a production variant at 100 TB would swap
    * the window for a count-aggregate + skew-joined semi join (AQE
    * splits the hot partitions) at the cost of a second gram
    * exchange.
    *
    * Island merge is the classic gaps-and-islands reduction: a
    * window start opens a new island when it lies strictly past the
    * running covered end (`max(pos + n) over rows preceding`), so
    * overlapping AND abutting windows fuse — every token inside an
    * island is covered by some duplicated gram.
    */
  def duplicateSpans(df: DataFrame, idCol: String, textCol: String,
      spanWords: Int = 4): DataFrame = {
    val id = col(idCol)
    val n = spanWords
    // tokenize BELOW the keyed exchange: the exchange materializes
    // the token arrays, so the per-gram slice lambdas read a column,
    // not a re-run of the tokenizer (see Parallelism)
    val toks = Parallelism.ensureKeyed(
      df.select(id, filter(tokens(col(textCol)), _ =!= "").as("_toks")),
      id)
    val gramArr = when(size(col("_toks")) >= n,
        transform(sequence(lit(0), size(col("_toks")) - n),
          i => concat_ws(" ", slice(col("_toks"), i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))
    val grams = toks.select(id, posexplode(gramArr).as(Seq("pos", "gram")))
    // corpus-global occurrence count as a window over the gram rows:
    // a count-aggregate + join would make the optimizer specialize
    // the tokenize subplan into two copies (the tfidfTopTerms lesson)
    val dup = grams
      .withColumn("_cnt", count(lit(1)).over(Window.partitionBy(col("gram"))))
      .where(col("_cnt") > 1)
      .select(id, col("pos"))
    val wDoc = Window.partitionBy(id).orderBy(col("pos"))
    dup
      .withColumn("_end", col("pos") + n)
      .withColumn("_covered",
        max(col("_end")).over(wDoc.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("_new",
        when(col("_covered").isNull || col("pos") > col("_covered"), 1)
          .otherwise(0))
      .withColumn("_isl", sum(col("_new")).over(wDoc))
      .groupBy(id, col("_isl"))
      .agg(min(col("pos")).as("span_start"), max(col("_end")).as("span_end"))
      .select(id, col("span_start"), col("span_end"),
        (col("span_end") - col("span_start")).as("span_tokens"))
  }

  /** CCNet-style perplexity bucketing: score every document under a
    * per-language unigram language model trained on a REFERENCE
    * slice of the corpus (the "wiki-like" high-quality subset), then
    * split each language into `buckets` quality tiers — head (bucket
    * 1, most reference-like) through tail. This is the cross-corpus
    * step the self-scored [[unigramLogProb]] can't do: a document is
    * judged against an external model, so boilerplate that dominates
    * the raw crawl but not the reference scores LOW.
    *
    * Model: add-one-smoothed unigram MLE per language —
    * P(w | lang) = (c_ref(lang, w) + 1) / (N_lang + V_lang + 1); an
    * out-of-vocabulary token gets the same formula with c = 0. All
    * inputs to the log are exact integer ratios, so both engines
    * evaluate identical arguments; the per-document fold accumulates
    * in DECIMAL (order-independent), surfacing a round-6 mean.
    *
    * Shape at scale: the model is a (lang, token) count table built
    * from the reference slice — ONE aggregation, then reused as the
    * probe side of a token-keyed shuffle join against per-document
    * token counts (both sides hash-partition on (lang, token); no
    * broadcast assumption, the vocabulary can be huge). Per-language
    * totals (N, V) are a languages-sized aggregate, broadcast. The
    * final ntile window partitions BY LANGUAGE — never a global
    * single-partition sort; a language's scored docs are a window
    * over the per-doc aggregate, already shuffled on the doc id.
    * Tie-break on (avg_logprob desc, id) makes the tier assignment
    * total and engine-reproducible.
    */
  def perplexityBuckets(df: DataFrame, idCol: String, textCol: String,
      langCol: String, isReference: Column, buckets: Int = 3): DataFrame = {
    val id = col(idCol)
    val lang = col(langCol)
    // reference model: per-(lang, token) counts + per-lang totals
    val refTok = df.where(isReference)
      .select(lang, explode(tokens(col(textCol))).as("token"))
      .where(col("token") =!= "")
    val model = refTok.groupBy(lang, col("token"))
      .agg(count(lit(1)).as("c_ref"))
    val langStats = model.groupBy(lang)
      .agg(sum(col("c_ref")).as("n_ref"), count(lit(1)).as("v_ref"))
    // per-document token counts (id-keyed exchange; see unigramLogProb)
    val tf = Parallelism.ensureKeyed(
        df.select(id, lang, col(textCol)), id)
      .select(id, lang, explode(tokens(col(textCol))).as("token"))
      .where(col("token") =!= "")
      .groupBy(id, lang, col("token")).agg(count(lit(1)).as("tf"))
    val scored = tf
      // NOT hinted, unlike [[knBigramLogProb]]'s scoring join: this
      // model is the REFERENCE-SLICE vocabulary (a curated subset,
      // not the corpus), so it grows far slower than the scored side
      // and AQE's broadcast stays the right call well past 10x
      // (measured: forcing merge here cost 3x at 1x and 1.7x at 10x)
      .join(model, Seq(langCol, "token"), "left")
      .join(broadcast(langStats), Seq(langCol), "left")
      .withColumn("w", col("tf") *
        log((coalesce(col("c_ref"), lit(0L)) + lit(1)) /
          (coalesce(col("n_ref"), lit(0L)) + coalesce(col("v_ref"), lit(0L)) + lit(1))))
      .groupBy(id, lang)
      .agg(sum(col("w").cast(org.apache.spark.sql.types.DecimalType(28, 12)))
          .as("_wsum"),
        sum(col("tf")).as("n_tokens"))
      .select(id, lang, col("n_tokens"),
        round(col("_wsum").cast("double") / col("n_tokens"), 6)
          .as("avg_logprob"))
    val w = Window.partitionBy(lang)
      .orderBy(col("avg_logprob").desc, id)
    scored.withColumn("bucket", ntile(buckets).over(w))
  }

  /** Zipf's-law fit over the corpus's term-frequency head: the
    * least-squares slope of ln(freq) against ln(rank) for the top-k
    * terms — the canonical "is this corpus naturally distributed or
    * TEMPLATE SPAM" diagnostic (natural text ≈ −1; machine-generated
    * boilerplate flattens the head). Returns one row:
    * (n_terms, total_tokens, n_vocab, zipf_slope).
    *
    * Shape at scale: one token-count aggregation (map-side combined),
    * the corpus totals ride the same counts, and the fit itself runs
    * over `orderBy(freq desc, token).limit(k)` — a
    * TakeOrderedAndProject that contracts to ONE k-sized partition,
    * so [[StatsOps.postLimitRank]] numbers ranks with zero extra
    * jobs and no unpartitioned window. The regression moments
    * accumulate in DECIMAL over round-9 logs: order-independent and
    * engine-exact; only the final slope division is floating point,
    * surfaced at round 6.
    */
  def zipfSlope(df: DataFrame, textCol: String, k: Int): DataFrame = {
    val tfAll = df
      .select(explode(tokens(col(textCol))).as("token"))
      .where(col("token") =!= "")
      .groupBy(col("token")).agg(count(lit(1)).as("freq"))
    val totals = tfAll.groupBy()
      .agg(sum(col("freq")).as("total_tokens"), count(lit(1)).as("n_vocab"))
    val head = StatsOps.postLimitRank(
      tfAll.orderBy(col("freq").desc, col("token")).limit(k), "rank")
    // quantize the logs to integer micro-nats (the pearsonExactScaled
    // pattern): both engines round the SAME double to the SAME long,
    // all moment sums are exact integer sums (ln ≤ 28 even at 10^12
    // tokens → squares ≤ 8e14, k-term sums far inside 2^63), and the
    // final slope is one IEEE expression over identical doubles
    val xs = round(log(col("rank").cast("double")) * 1e6).cast("long")
    val ys = round(log(col("freq").cast("double")) * 1e6).cast("long")
    val fit = head
      .select(xs.as("x"), ys.as("y"))
      .groupBy()
      .agg(count(lit(1)).cast("double").as("n"),
        sum(col("x")).cast("double").as("sx"),
        sum(col("y")).cast("double").as("sy"),
        sum(col("x") * col("y")).cast("double").as("sxy"),
        sum(col("x") * col("x")).cast("double").as("sxx"))
      .select(col("n").cast("long").as("n_terms"),
        round((col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx")), 6)
          .as("zipf_slope"))
    fit.crossJoin(broadcast(totals))
      .select(col("n_terms"), col("total_tokens"), col("n_vocab"),
        col("zipf_slope"))
  }

  /** Unicode script profile — the character-class signal that sits
    * AHEAD of token-level language ID in a web-crawl pipeline:
    * before any tokenizer can run, the pipeline has to know whether
    * a byte blob is Latin prose, CJK (no spaces to tokenize on),
    * mixed-script spam, or digit noise. Reports per-document counts
    * for the five highest-volume scripts plus digits/whitespace, the
    * dominant script (deterministic fixed-order tie-break), and the
    * Latin ratio over non-space characters.
    *
    * Input is NFC-normalized first ([[graft.functions.NfcNormalize]])
    * so decomposed sequences count as their composed script character
    * rather than base+Inherited-mark — the composition step changes
    * the answer, which is exactly why it must be inside the operator.
    *
    * Pure map-side column arithmetic over codegen'd regexp counts —
    * no shuffle, no UDF, scales embarrassingly. Counting is
    * length(s) − length(regexp_replace(s, cls, "")): per-codepoint
    * classes, identical in Java regex (Spark) and RE2 (engines like
    * DuckDB spell the class \p{Latin} instead of \p{IsLatin}).
    */
  def scriptProfile(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val s = graft.functions.NfcNormalize(col(textCol))
    def cnt(cls: String): Column =
      (length(s) - length(regexp_replace(s, cls, ""))).cast("long")
    val nChars = length(s).cast("long")
    val latin = cnt("[\\p{IsLatin}]")
    val cyr = cnt("[\\p{IsCyrillic}]")
    val greek = cnt("[\\p{IsGreek}]")
    val han = cnt("[\\p{IsHan}]")
    val arabic = cnt("[\\p{IsArabic}]")
    val digits = cnt("[0-9]")
    val spaces = cnt("[ ]")
    val top = greatest(latin, cyr, greek, han, arabic)
    val dominant = when(top === 0, lit("none"))
      .when(latin === top, "latin")
      .when(cyr === top, "cyrillic")
      .when(greek === top, "greek")
      .when(han === top, "han")
      .otherwise("arabic")
    val nonSpace = nChars - spaces
    df.select(col(idCol), nChars.as("n_chars"),
      latin.as("n_latin"), cyr.as("n_cyrillic"), greek.as("n_greek"),
      han.as("n_han"), arabic.as("n_arabic"),
      digits.as("n_digit"), spaces.as("n_space"),
      when(nonSpace === 0, 0.0)
        .otherwise(round(latin.cast("double") / nonSpace.cast("double"), 6))
        .as("latin_ratio"),
      dominant.as("script"))
  }
}
