package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-curation operators: the keep/drop machinery of a training-data
  * pipeline on top of the per-doc signals (TextAnalysis) and dedup
  * (DedupOps) — per-domain caps, repetition metrics, and composite
  * C4/Gopher-style rule filters. All pure Column/window logic: partitioned
  * windows and codegen'd expressions only.
  */
object Curation {

  /** Keep at most `n` rows per group, by the given order (per-domain caps:
    * no single source may dominate the corpus). Same partitioned window as
    * keep-first dedup — delegates to Dedup.keepTopN.
    */
  def capPerGroup(df: DataFrame, groupCol: String, orderCols: Seq[String],
      n: Int): DataFrame =
    graft.ops.Dedup.keepTopN(df, Seq(groupCol), orderCols, n)

  /** Duplicate-token fraction: 1 − distinct/total tokens (0 for empty). */
  def tokenRepetitionRatio(text: Column): Column = {
    val toks = TextAnalysis.tokens(text)
    val total = size(toks)
    when(total <= 0, 0.0).otherwise(
      round(lit(1.0) - size(array_distinct(toks)).cast("double") / total, 6))
  }

  /** Duplicate-bigram fraction: 1 − distinct/total word 2-grams (0 when the
    * text has fewer than 2 tokens) — the Gopher-style repetition signal one
    * level above tokens.
    */
  def bigramRepetitionRatio(text: Column): Column = {
    val toks = TextAnalysis.tokens(text)
    val total = size(toks) - 1
    // DedupOps.shingles is already distinct; total comes from the token count
    when(total <= 0, 0.0).otherwise(
      round(lit(1.0) - size(DedupOps.shingles(text, 2)).cast("double") / total, 6))
  }

  /** PII redaction: replace email addresses and international-format phone
    * numbers with placeholder tokens — the standard scrub step before
    * training-data release. Patterns are deliberately RE2-compatible (no
    * backrefs/lookarounds) so external engines reproduce them exactly;
    * `regexp_replace` is codegen'd and replaces all occurrences.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+[0-9]{1,3}[0-9 .-]{6,14}[0-9]"

  def redactPii(text: Column,
      emailToken: String = "<EMAIL>", phoneToken: String = "<PHONE>"): Column =
    regexp_replace(regexp_replace(text, EmailRe, emailToken), PhoneRe, phoneToken)

  /** Payment-card candidates: 13–19 digits with optional single space/dash
    * separators. RE2-compatible; candidates are VALIDATED with [[luhnValid]]
    * because a digits-only regex over web text is mostly false positives —
    * the check digit is what makes a match reportable PII.
    */
  val CardRe = "(?:[0-9][ -]?){12,18}[0-9]"

  /** Luhn check over a digits-only string, as pure array arithmetic: from
    * the right, double every second digit (subtracting 9 past 9) and the
    * total must divide by 10. The per-digit terms pair `reverse(d)`'s chars
    * with their 1-based index through zip_with — inputs evaluated once, no
    * captured-subexpression re-evaluation — and fold to a sum, so an
    * external SQL engine replays the validation exactly.
    */
  def luhnValid(digits: Column): Column = {
    val terms = zip_with(split(reverse(digits), ""),
      sequence(lit(1), length(digits)), (ch, i) => {
        val v = ch.cast("int")
        when(i % 2 === 0, when(v * 2 > 9, v * 2 - 9).otherwise(v * 2))
          .otherwise(v)
      })
    aggregate(terms, lit(0), (acc, x) => acc + x) % 10 === 0
  }

  /** Number of Luhn-VALID card candidates in the text (for PII auditing —
    * flag-and-review, where the regex alone would drown review queues in
    * arbitrary digit runs).
    */
  def luhnValidCount(text: Column): Column =
    size(filter(
      transform(regexp_extract_all(text, lit(CardRe), lit(0)),
        c => luhnValid(regexp_replace(c, "[^0-9]", ""))),
      v => v))

  /** C4/Gopher-style composite quality rules, each as a boolean column:
    * enough words, sane mean word length, contains an English stopword,
    * not dominated by repetition. Returns the input plus one flag per rule
    * and a `keep` conjunction — counting/filtering composes downstream.
    */
  def c4RuleFlags(df: DataFrame, textCol: Column,
      minWords: Int = 50, meanLenLo: Double = 2.0, meanLenHi: Double = 10.0,
      maxRepetition: Double = 0.8): DataFrame = {
    val toks = TextAnalysis.tokens(textCol)
    val nWords = size(toks)
    val meanLen = (length(textCol) - (nWords - 1)).cast("double") / nWords
    val out = df
      .withColumn("r_min_words", nWords >= minWords)
      .withColumn("r_word_len", meanLen >= meanLenLo && meanLen <= meanLenHi)
      .withColumn("r_stopword",
        TextAnalysis.profileScore(toks, TextAnalysis.LangProfiles.head._2) > 0)
      .withColumn("r_repetition", tokenRepetitionRatio(textCol) <= maxRepetition)
    out.withColumn("keep",
      col("r_min_words") && col("r_word_len") && col("r_stopword") && col("r_repetition"))
  }

  /** The fuller Gopher-style rule battery (Rae et al. 2021 §A1.1 quality
    * heuristics, re-expressed as Column predicates): word-count bounds,
    * mean-word-length bounds, symbol-to-word ratio (# and … proxies for
    * scraped-markup noise), bullet- and ellipsis-line fractions, fraction
    * of words containing a letter, and a minimum distinct-stopword count.
    * Complements [[c4RuleFlags]] (which covers the C4 basics) with the
    * line-structure and symbol rules. One flag column per rule plus the
    * `keep` conjunction; everything is a whitespace/regex projection, so
    * the filter is a single codegen'd map stage — no shuffle, no UDFs.
    */
  def gopherRuleFlags(df: DataFrame, textCol: Column,
      minWords: Int = 50, maxWords: Int = 100000,
      meanLenLo: Double = 3.0, meanLenHi: Double = 10.0,
      maxSymbolRatio: Double = 0.1, maxBulletFrac: Double = 0.9,
      maxEllipsisFrac: Double = 0.3, minAlphaFrac: Double = 0.8,
      minStopwords: Int = 2): DataFrame = {
    val toks = filter(TextAnalysis.tokensWs(textCol), t => length(t) > 0)
    val nWords = size(toks)
    val nLines = size(split(textCol, "\n"))
    // mean word length without a per-token fold: non-whitespace chars / words
    val meanLen = length(regexp_replace(textCol, "\\s", "")).cast("double") / nWords
    val hashCount = length(textCol) - length(replace(textCol, lit("#"), lit("")))
    val ellipsisCount =
      (length(textCol) - length(replace(textCol, lit("..."), lit("")))) / lit(3)
    val bulletLines = regexp_count(textCol, lit("(?m)^[ \\t]*[-*\u2022]"))
    val ellipsisLines = regexp_count(textCol, lit("(?m)\\.\\.\\.$"))
    val alphaWords = size(filter(toks, t => t.rlike("[A-Za-z]")))
    val stopHits = TextAnalysis.profileScore(toks, TextAnalysis.LangProfiles.head._2)
    df
      .withColumn("g_words", nWords >= minWords && nWords <= maxWords)
      .withColumn("g_word_len",
        nWords > 0 && meanLen >= meanLenLo && meanLen <= meanLenHi)
      .withColumn("g_symbol",
        nWords > 0 && (hashCount + ellipsisCount).cast("double") / nWords <= maxSymbolRatio)
      .withColumn("g_bullet",
        bulletLines.cast("double") / nLines <= maxBulletFrac)
      .withColumn("g_ellipsis",
        ellipsisLines.cast("double") / nLines <= maxEllipsisFrac)
      .withColumn("g_alpha",
        nWords > 0 && alphaWords.cast("double") / nWords >= minAlphaFrac)
      .withColumn("g_stopword", stopHits >= minStopwords)
      .withColumn("keep",
        col("g_words") && col("g_word_len") && col("g_symbol") && col("g_bullet")
          && col("g_ellipsis") && col("g_alpha") && col("g_stopword"))
  }

  /** Benchmark DECONTAMINATION: flag training documents that share at least
    * `minHits` word `n`-gram(s) with any benchmark/eval document — the
    * standard guard against test-set leakage into training data.
    *
    * Shape: both sides explode to distinct shingles; the benchmark side's
    * shingle set is tiny relative to the corpus (eval suites are small), so
    * Spark broadcasts it and the "join" is a map-side hash probe over the
    * training corpus — no corpus shuffle at all. Returns (train id, n_hits)
    * per contaminated doc.
    */
  def decontaminationFlags(train: DataFrame, bench: DataFrame,
      idCol: String, textCol: Column, n: Int, minHits: Long = 1L): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    val trainSh = graft.ops.Spread.forAmplification(train, col(idCol))
      .select(col(idCol),
        explode(DedupOps.shingles(textCol, n)).as("__sh"))
    val benchSh = bench.select(explode(DedupOps.shingles(textCol, n)).as("__sh"))
      .distinct()
    trainSh.join(broadcast(benchSh), Seq("__sh"))
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_hits"))
      .filter(col("n_hits") >= minHits)
  }

  /** n-gram NOVELTY score: per document, the fraction of its distinct word
    * n-grams that do NOT occur anywhere in a reference corpus — the
    * "how much genuinely new text does this release add" counterpart to
    * [[decontaminationFlags]] (which flags overlap with a small eval set).
    *
    * Shape difference is deliberate: the reference here is corpus-scale,
    * so no broadcast — both sides explode to shingles and meet in a
    * shuffle-on-shingle LEFT join (skew-tolerant: one hot shingle key is
    * one join key, and the reference side is pre-distinct so a hot shingle
    * carries ONE build row); the per-doc rollup map-side combines. Docs
    * with fewer than n tokens have no shingles and drop out (no 0/0 row).
    */
  def noveltyScore(docs: DataFrame, reference: DataFrame,
      idCol: String, textCol: Column, n: Int): DataFrame = {
    val docSh = graft.ops.Spread.forAmplification(docs, col(idCol))
      .select(col(idCol),
        explode(DedupOps.shingles(textCol, n)).as("__sh"))
    val refSh = graft.ops.Spread.forAmplification(reference)
      .select(explode(DedupOps.shingles(textCol, n)).as("__sh"))
      .distinct().withColumn("__seen", lit(true))
    docSh.join(refSh, Seq("__sh"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_shingles"),
        sum(when(col("__seen").isNull, 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novelty",
        round(col("n_novel").cast("double") / col("n_shingles"), 6))
  }

  /** Gopher's character-level repetition metrics (Rae et al. 2021 §A1.1):
    * for word `n`-grams of each document, the fraction of characters
    * covered by occurrences of the MOST FREQUENT n-gram (top_frac) and by
    * ALL n-grams occurring more than once (dup_frac). Catches the crawl
    * failure token-level ratios miss: a page looping one long phrase.
    *
    * Shape: one explode of non-distinct n-grams → (doc, gram) count with
    * map-side partial aggregation → one per-doc aggregate. The per-doc
    * argmax is a min(struct(-count, gram)) — no window over hot keys, and
    * the (-count, gram) struct order makes the tie-break (smallest gram)
    * reproducible cross-engine.
    *
    * Fractions are occurrences × gram-chars / doc-chars: overlapping
    * occurrences are each counted (same as the pair counting in BPE), so a
    * pathological "a a a a" doc can exceed 1.0 — callers threshold, they
    * don't treat it as a probability.
    */
  def ngramCharStats(df: DataFrame, idCol: String, textCol: Column,
      n: Int): DataFrame = {
    val exploded = graft.ops.Spread.forAmplification(df, col(idCol))
      .select(col(idCol), length(textCol).as("__len"),
        explode(TextAnalysis.wordNgrams(textCol, n)).as("gram"))
    exploded
      .groupBy(col(idCol), col("__len"), col("gram"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col(idCol))
      .agg(
        min(struct((-col("cnt")).as("nc"), col("gram").as("g"))).as("__top"),
        sum(when(col("cnt") >= 2, col("cnt") * length(col("gram")))
          .otherwise(0L)).as("__dup_chars"),
        first(col("__len")).as("__len"))
      .select(col(idCol),
        col("__top.g").as("top_gram"),
        (-col("__top.nc")).cast("bigint").as("top_count"),
        round((-col("__top.nc") * length(col("__top.g"))).cast("double")
          / col("__len"), 6).as("top_frac"),
        round(col("__dup_chars").cast("double") / col("__len"), 6).as("dup_frac"))
  }

  /** SFT conversation QA: validate an array<struct<role,content>> column —
    * the lint pass an instruction-tuning dataset runs before training.
    * Rules: opens with user/system, roles strictly alternate, no empty
    * turn, closes with assistant. All higher-order array expressions over
    * the nested column (no explode — the conversation stays one row), so
    * the lint is a shuffle-free projection.
    */
  def conversationFlags(df: DataFrame, convCol: Column): DataFrame = {
    val roles = transform(convCol, t => t.getField("role"))
    val n = size(convCol)
    // slice length must be >= 0: an EMPTY conversation (the malformed row
    // this lint exists to flag) must score keep=false, not crash the job
    val adj = greatest(n - 1, lit(0))
    val adjacentSame = zip_with(
      slice(roles, lit(1), adj), slice(roles, lit(2), adj),
      (a, b) => a === b)
    df.withColumn("n_turns", n)
      .withColumn("v_opens",
        // when-guarded: element_at on an empty array raises under ANSI mode
        when(n > 0, element_at(roles, 1).isin("user", "system")).otherwise(false))
      .withColumn("v_alternates", !exists(adjacentSame, x => x))
      .withColumn("v_nonempty",
        forall(convCol, t => length(t.getField("content")) > 0))
      .withColumn("v_closes",
        when(n > 0, element_at(roles, -1) === "assistant").otherwise(false))
      .withColumn("keep",
        col("v_opens") && col("v_alternates") && col("v_nonempty") && col("v_closes"))
  }

  /** Corpus release diff: classify every document across two snapshot
    * versions as added / removed / changed / unchanged by comparing a
    * content fingerprint under a keyed full-outer join on the id — the
    * audit step between corpus releases. One shuffle on the id; the
    * fingerprint column expression is evaluated on each side's projection
    * (never materialized corpus-wide beyond the join payload).
    */
  def corpusDiff(v1: DataFrame, v2: DataFrame, idCol: String,
      fp: Column): DataFrame = {
    val a = v1.select(col(idCol).as("id"), fp.as("fp1"))
    val b = v2.select(col(idCol).as("id"), fp.as("fp2"))
    a.join(b, Seq("id"), "full_outer")
      .withColumn("status",
        when(col("fp1").isNull, "added")
          .when(col("fp2").isNull, "removed")
          .when(col("fp1") =!= col("fp2"), "changed")
          .otherwise("unchanged"))
      .select(col("id"), col("status"))
  }

  /** Corpus-mix sampling rates: given target shares per group (language,
    * source, quality bucket — the training-mix spec), compute each group's
    * keep probability so downsampled counts land on the target mixture,
    * capped at 1 (a group can only be downsampled; upweighting is the
    * trainer's job). rate_g = min(1, share_g · N_total / n_g).
    *
    * One groupBy + a windowless scalar total — the rate table is |groups|
    * rows. Groups absent from `targetShares` get rate 0 (dropped from the
    * mix), mirroring an explicit mixture spec.
    */
  def mixRates(df: DataFrame, groupCol: String,
      targetShares: Map[String, Double]): DataFrame =
    // document-counted mix = token-weighted mix with unit weights; one
    // rate formula to maintain
    mixRatesWeighted(df, groupCol, lit(1L), targetShares).drop("w_tokens")

  /** DETERMINISTIC exact-k sample per group: rank rows inside each group by
    * md5(seed ‖ id) and keep the k smallest. Unlike `rand()`-based sampling
    * this is a pure function of (seed, id) — re-runs, retries, AQE re-plans
    * and other engines all select the SAME rows (the reproducibility
    * property a training-data pipeline needs for auditable subsets), and
    * it's exact-k where Bernoulli sampling only hits k in expectation.
    * One partitioned window, no shuffle beyond its group keying.
    */
  def deterministicSample(df: DataFrame, groupCol: String, idCol: String,
      k: Int, seed: String = "42"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rk = row_number().over(Window.partitionBy(col(groupCol))
      .orderBy(md5(concat_ws("|", lit(seed), col(idCol).cast("string"))), col(idCol)))
    df.withColumn("__rk", rk).filter(col("__rk") <= k).drop("__rk")
  }

  /** DETERMINISTIC weighted sampling without replacement (Efraimidis-
    * Spirakis A-ES): each row gets priority u^(1/w) with u uniform from a
    * 60-bit md5 slice of (seed ‖ id); the global top-k by priority is an
    * exact weighted sample — a quality-weighted corpus subset that is a
    * pure function of (seed, id, weight), replayable across engines and
    * retries. Ranking uses the monotone log form ln(u)/w (no underflow for
    * huge weights); the returned `priority` column is the log-priority
    * rounded to 6.
    *
    * Scale shape: one scan, no shuffle but the top-k merge —
    * orderBy+limit plans as TakeOrderedAndProject (per-partition heaps,
    * driver merges k rows, never a global sort of the corpus). Weights
    * must be > 0.
    */
  def weightedSample(df: DataFrame, idCol: String, weight: Column, k: Int,
      seed: String = "42"): DataFrame = {
    // 2^60 as an exact double literal — both engines convert the 60-bit
    // int and divide by the same constant, so u is bit-identical
    val u = (conv(substring(md5(concat_ws("|", lit(seed),
      col(idCol).cast("string"))), 1, 15), 16, 10).cast("double") + 1.0) /
      lit(1.152921504606846976e18)
    df.withColumn("priority", round(log(u) / weight.cast("double"), 6))
      .withColumn("__pri", log(u) / weight.cast("double"))
      .orderBy(col("__pri").desc, col(idCol))
      .limit(k)
      .drop("__pri")
  }

  /** Exact-total stratified allocation (largest-remainder / Hamilton
    * method): split a budget of `k` rows across strata proportionally to
    * their counts, in INTEGER-ONLY arithmetic — base = ⌊n·k/total⌋ per
    * stratum, remaining seats to the largest remainders (ties toward the
    * smaller stratum name). Σ n_target = k exactly (the Hamilton
    * guarantee), which rate-based sampling (q80's mixRates) only hits in
    * expectation; callers keep k ≤ total rows — beyond that a stratum's
    * target can exceed its size and the pick saturates at the stratum.
    * Returns (strat, n_docs, n_target). The counts table is ≤#strata rows,
    * so its windows are report-sized, never data-sized.
    */
  def stratifiedAllocation(df: DataFrame, strat: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val counts = df.groupBy(strat).agg(count(lit(1)).as("n_docs"))
      .withColumn("__total", sum(col("n_docs")).over(all))
      .withColumn("__base", expr(s"(n_docs * $k) div __total"))
      .withColumn("__rem", expr(s"(n_docs * $k) % __total"))
    counts
      .withColumn("__seats", lit(k.toLong) - sum(col("__base")).over(all))
      .withColumn("__rk", row_number().over(
        Window.orderBy(col("__rem").desc, col(strat))))
      .withColumn("n_target",
        (col("__base") + when(col("__rk") <= col("__seats"), 1L).otherwise(0L))
          .cast("long"))
      .select(col(strat), col("n_docs"), col("n_target"))
  }

  /** The stratified sample itself: [[stratifiedAllocation]] targets applied
    * via the md5-ranked pick of [[deterministicSample]] — per-stratum rank
    * joined (broadcast, ≤#strata rows) against the per-stratum target.
    */
  def stratifiedSample(df: DataFrame, strat: String, idCol: String, k: Int,
      seed: String = "42"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val alloc = stratifiedAllocation(df, strat, k).drop("n_docs")
    val rk = row_number().over(Window.partitionBy(col(strat))
      .orderBy(md5(concat_ws("|", lit(seed), col(idCol).cast("string"))), col(idCol)))
    df.withColumn("__rk", rk)
      .join(broadcast(alloc), Seq(strat))
      .filter(col("__rk") <= col("n_target"))
      .drop("__rk", "n_target")
  }

  /** Token-WEIGHTED mix rates: like [[mixRates]] but the budget is counted
    * in a weight column (tokens) instead of documents — the form a training
    * mix is actually specified in ("15% of TOKENS from code"). rate_g =
    * min(1, share_g · W_total / w_g); decimal sums keep the per-group
    * weights order-independent.
    */
  def mixRatesWeighted(df: DataFrame, groupCol: String, weight: Column,
      targetShares: Map[String, Double]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val shares = typedLit(targetShares)
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(weight.cast("decimal(38,0)")).cast("bigint").as("w_tokens"))
      .withColumn("target_share",
        coalesce(element_at(shares, col(groupCol)), lit(0.0)))
      .withColumn("rate", round(
        least(lit(1.0), col("target_share")
          * sum(col("w_tokens")).over(Window.partitionBy())
          / col("w_tokens")), 6))
  }

  /** Temperature-scaled sampling shares (multilingual mixing à la mBERT /
    * XLM-R; UniMax's precursor): p_g ∝ n_g^(1/T) over per-group token
    * mass. T=1 reproduces natural shares; T→∞ approaches uniform — the
    * standard knob for up-sampling low-resource languages without a
    * hand-written target-share map ([[mixRatesWeighted]] covers the
    * explicit-target form). Output per group: token mass, natural share,
    * tempered share, and the resulting sampling boost (tempered/natural).
    *
    * Shape: token mass sums in DECIMAL (exact, order-independent) in one
    * map-side-combined groupBy; the normalizers are windows over the
    * GROUP table (≤ #groups rows — scalar-sized, never over data rows);
    * shares carry the round-6 cross-engine contract. `boost` divides the
    * UNROUNDED shares (round-6 only on the final column): dividing the
    * rounded natural_share would blow up to Infinity for any group holding
    * under ~5e-7 of total token mass (its share rounds to 0.0) — plausible
    * for a rare language in a large multilingual corpus.
    */
  def temperatureMixShares(df: DataFrame, groupCol: String, weight: Column,
      temperature: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val all = Window.partitionBy()
    val tempered = pow(col("w_tokens").cast("double"), lit(1.0 / temperature))
    val naturalRaw = col("w_tokens").cast("double") /
      sum(col("w_tokens")).over(all).cast("double")
    val temperedRaw = tempered / sum(tempered).over(all)
    df.groupBy(col(groupCol))
      .agg(sum(weight.cast("decimal(38,0)")).cast("bigint").as("w_tokens"))
      .withColumn("natural_share", round(naturalRaw, 6))
      .withColumn("tempered_share", round(temperedRaw, 6))
      .withColumn("boost", round(temperedRaw / naturalRaw, 6))
  }

  /** Apply a mixture: seeded per-group Bernoulli sampling at the `mixRates`
    * rates — one map-side filter, no shuffle (`sampleBy` semantics). Rates
    * are collected from the (tiny) rate table.
    */
  def rebalance(df: DataFrame, groupCol: String, rates: DataFrame,
      seed: Long = 42L): DataFrame = {
    val fractions = rates.select(col(groupCol), col("rate")).collect()
      .map(r => r.get(0).toString -> r.getDouble(1)).toMap
    df.stat.sampleBy(groupCol, fractions, seed)
  }

  /** Hashed n-gram features (unigrams + word bigrams) — the DSIR feature
    * space. Unigrams drop empty tokens (consistent with unigramNll);
    * bigrams are built over the raw token sequence (consistent with
    * bigramNll). Hashing happens after the explode, per feature string.
    */
  private[text] def hashedNgramFeatures(textCol: Column): Column = {
    val uni = filter(TextAnalysis.tokens(textCol), t => length(t) > 0)
    concat(uni, TextAnalysis.wordNgrams(textCol, 2))
  }

  /** DSIR importance weights (Xie et al. 2023, "Data Selection for Language
    * Models via Importance Resampling"): fit hashed-n-gram bag models on a
    * TARGET corpus (the distribution you want more of) and on the RAW pool,
    * then weight every raw document by its log importance ratio
    * Σ_b n_doc[b]·(ln p_target[b] − ln p_raw[b]) with add-α smoothing over
    * `buckets` hash buckets. High-weight docs look like the target.
    *
    * Scale shape: each side is ONE explode into a map-side-combined
    * (doc, bucket) partial count; both bucket-probability tables are ≤
    * `buckets` rows, so the log-ratio table broadcasts and the scoring join
    * is a map-side hash probe — the corpus is never shuffled beyond the
    * (doc, bucket) aggregate. The raw (doc, bucket) table is materialized
    * once because the raw marginal AND the scoring join both read it.
    *
    * Float contract: per-bucket log-ratios are pure functions of counts;
    * per-doc terms are decimal(38,12)-cast before summing, total rounded
    * to 6 — order-independent and cross-engine reproducible.
    */
  def dsirLogWeights(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: Column, buckets: Int = 4096, alpha: Double = 0.5): DataFrame = {
    def bucketed(df: DataFrame, keep: Seq[Column]): DataFrame =
      graft.ops.Spread.forAmplification(df)
        .select(keep :+ explode(hashedNgramFeatures(textCol)).as("__f"): _*)
        .withColumn("b", TextAnalysis.md5Int32(col("__f")) % buckets)
        .drop("__f")
    val rawDoc = bucketed(raw, Seq(col(idCol)))
      .groupBy(col(idCol), col("b")).agg(count(lit(1)).as("n"))
      .localCheckpoint(true)
    val rawC = rawDoc.groupBy("b").agg(sum("n").as("rc"))
    val tgtC = bucketed(target, Nil).groupBy("b").agg(count(lit(1)).as("tc"))
    // coalesce: an EMPTY side sums to null — smooth to the α prior instead
    // of nulling every log-ratio (an empty target is a misconfiguration a
    // pipeline should survive, not a crash or silent null column)
    val rTot = rawC.agg(coalesce(sum("rc"), lit(0L)).as("rtot"))
    val tTot = tgtC.agg(coalesce(sum("tc"), lit(0L)).as("ttot"))
    // every bucket that can appear in the scoring join appears in rawC, so
    // a left join (absent target buckets smoothed to α mass) is total
    val ratio = rawC.join(tgtC, Seq("b"), "left")
      .na.fill(0L, Seq("tc"))
      .crossJoin(broadcast(rTot)).crossJoin(broadcast(tTot))
      .select(col("b"),
        (log((col("tc") + alpha) / (col("ttot") + alpha * buckets)) -
          log((col("rc") + alpha) / (col("rtot") + alpha * buckets))).as("lr"))
    rawDoc.join(broadcast(ratio), Seq("b"))
      .groupBy(col(idCol))
      .agg(
        round(sum((col("n") * col("lr")).cast("decimal(38,12)"))
          .cast("double"), 6).as("logw"),
        sum(col("n")).as("n_feats"))
  }

  /** fastText-style linear quality scorer over hashed bag-of-n-gram
    * features (Joulin et al. 2016, arXiv:1607.01759) — the model-based
    * quality-filter stage of a curation pipeline (CCNet/GPT-3 style): each
    * document's word unigrams+bigrams hash into `buckets` (the same
    * [[hashedNgramFeatures]] space DSIR uses), `weightOf` maps a bucket id
    * to its trained weight, and the document scores
    * sigmoid(mean bucket weight). `weightOf` is a Column function, so a
    * trained model ships either as literal arithmetic (as in q118's
    * fixture) or as `element_at(weights, b + 1)` over a broadcast literal
    * weight array (SQL arrays are 1-indexed; buckets are 0-based) — either
    * way the scorer is ONE explode + ONE map-side-combined groupBy riding
    * whole-stage codegen; no UDF, no driver loop, nothing all-pairs.
    * A bucket `weightOf` maps to NULL (e.g. an under-sized weight array)
    * contributes weight 0 — an untrained/OOV bucket carries no signal —
    * while still counting toward n_feats, so the mean's denominator is
    * always the true feature count. Documents with no features (empty
    * text) produce no row, matching the DSIR scorer's contract.
    *
    * Cross-engine exactness: pick weights exact in binary (multiples of
    * 2⁻ᵏ) and the per-document sum is order-independent; the sigmoid is
    * rounded to 6 decimals (the float contract shared with the NLL/DSIR
    * scorers, which q118's DuckDB oracle replays).
    */
  def hashedLinearScore(df: DataFrame, idCol: String, textCol: Column,
      weightOf: Column => Column, buckets: Int = 4096,
      threshold: Double = 0.5): DataFrame =
    graft.ops.Spread.forAmplification(df, col(idCol))
      .select(col(idCol), explode(hashedNgramFeatures(textCol)).as("__f"))
      .withColumn("__b", TextAnalysis.md5Int32(col("__f")) % buckets)
      .groupBy(col(idCol))
      .agg(sum(coalesce(weightOf(col("__b")), lit(0.0))).as("__z"),
        count(lit(1)).as("n_feats"))
      .withColumn("score",
        round(lit(1.0) / (lit(1.0) + exp(-(col("__z") / col("n_feats")))), 6))
      .withColumn("keep", col("score") >= threshold)
      .drop("__z")

  /** C4 LINE-level filtering (Raffel et al. 2020 §2.2): drop lines that
    * don't end in terminal punctuation, have fewer than `minWords` words,
    * or carry boilerplate markers ("javascript", cookie/lorem notices);
    * reassemble each document from its surviving lines in order. The
    * page-cleaning step that runs BEFORE document-level quality rules.
    *
    * Input is (id, line_idx, line); output one row per document:
    * n_lines, n_kept, and the reassembled text. Shape: a pure projection
    * of per-line rule flags, then ONE groupBy(id) that rebuilds the text
    * with an order-preserving sorted collect — no window, no second pass.
    */
  def c4LineFilter(lines: DataFrame, idCol: String, idxCol: String,
      lineCol: Column, minWords: Int = 5): DataFrame = {
    val words = size(filter(split(lineCol, " "), t => length(t) > 0))
    val keep = lineCol.rlike("[.!?\"']$") && words >= minWords &&
      !lower(lineCol).contains("javascript") &&
      !lower(lineCol).contains("lorem ipsum") &&
      !lower(lineCol).contains("cookie")
    lines
      .select(col(idCol), col(idxCol).as("__idx"), lineCol.as("__line"),
        keep.as("__keep"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(when(col("__keep"), 1L).otherwise(0L)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(when(col("__keep"),
            struct(col("__idx").as("i"), col("__line").as("l"))))),
          p => p("l")), "\n").as("clean_text"))
  }

  /** Deterministic train/val/test split assignment: a pure function of
    * (seed, id) maps each row to a uniform in (0,1) and thresholds it at
    * the cumulative fractions. No shuffle, no RNG state — a document keeps
    * its split across re-runs, retries, and engines (the leakage guarantee
    * an eval pipeline needs: a doc can never migrate from test into train
    * when the corpus grows, because its uniform never changes).
    */
  def splitAssign(df: DataFrame, idCol: String,
      trainFrac: Double = 0.8, valFrac: Double = 0.1,
      seed: String = "42"): DataFrame = {
    val u = (TextAnalysis.md5Int32(concat_ws("|", lit(seed),
      col(idCol).cast("string"))) + 0.5) / 4294967296.0
    df.withColumn("split",
      when(u < trainFrac, "train")
        .when(u < trainFrac + valFrac, "val")
        .otherwise("test"))
  }

  /** Importance RESAMPLING via deterministic Gumbel-max top-k (the second
    * half of DSIR): treating each document's log-weight as a logit, adding
    * independent Gumbel noise and keeping the k largest keys draws a
    * without-replacement sample from softmax(logw). The uniform comes from
    * md5(seed‖id) — a pure function of (seed, id), so retries, AQE
    * re-plans, and external engines select the SAME k documents (unlike
    * `rand()`; same property as [[deterministicSample]], but weighted).
    * One projection + a distributed top-k (TakeOrdered) — no shuffle of
    * the weight table.
    */
  /** Token-budget WATERFILLING across sources: allocate a global budget B
    * proportionally to per-source weights, capped at each source's
    * available mass, with capped sources' unused share redistributed to
    * the rest — alloc_s = min(a_s, λ·w_s) with the water level λ chosen so
    * Σ alloc = min(B, Σa). The mixing planner's step between "target
    * shares" ([[temperatureMixShares]]) and "sample it" ([[rebalance]]):
    * shares say what you want, waterfilling says what you can actually
    * take when some sources are too small.
    *
    * Exact, closed-form, no iteration: sorted ascending by the saturation
    * ratio r_s = a_s/w_s, a PREFIX saturates (small sources cap out first).
    * Source i saturates iff the level-if-1..i-saturate
    * t_i = (B − Σaᵢ)/(W − Σwᵢ) still sits at-or-above its own ratio; λ is
    * then the level over the unsaturated remainder. All window math runs
    * over the ≤#sources report frame (prefix sums ordered by (r, source)
    * — deterministic under ties). Output: (source, available, weight,
    * saturated, allocation rounded 6), ordered by source; Σ allocation =
    * min(B, Σa) exactly up to rounding (property-tested).
    */
  def budgetWaterfill(perSource: DataFrame, sourceCol: String,
      available: Column, weight: Column, budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = perSource.select(col(sourceCol).as("source"),
        available.cast("double").as("a"), weight.cast("double").as("w"))
      .filter(col("a").isNotNull && col("w").isNotNull && col("w") > 0)
    val all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val byR = Window.orderBy(col("r"), col("source"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val b = lit(budget.toDouble)
    val scored = base
      .withColumn("r", col("a") / col("w"))
      .withColumn("__ca", sum(col("a")).over(byR))   // inclusive prefix Σa
      .withColumn("__cw", sum(col("w")).over(byR))
      .withColumn("__ta", sum(col("a")).over(all))   // totals
      .withColumn("__tw", sum(col("w")).over(all))
      .withColumn("saturated",
        // last row guards the 0/0 level with the direct budget test
        when(col("__tw") > col("__cw"),
          (b - col("__ca")) / (col("__tw") - col("__cw")) >= col("r"))
          .otherwise(b >= col("__ca")))
    val satA = max(when(col("saturated"), col("__ca"))).over(all)
    val satW = max(when(col("saturated"), col("__cw"))).over(all)
    val level = (b - coalesce(satA, lit(0.0))) /
      (col("__tw") - coalesce(satW, lit(0.0)))
    scored
      .withColumn("allocation",
        round(when(col("saturated"), col("a")).otherwise(level * col("w")), 6))
      .select(col("source"), col("a").as("available"), col("w").as("weight"),
        col("saturated"), col("allocation"))
      .orderBy("source")
  }

  /** CCNet-style line-level boilerplate removal (Wenzek et al. 2020 §4.1:
    * lines duplicated across many documents of a domain — nav bars, cookie
    * banners, license footers — are stripped wherever they appear). Distinct
    * from [[graft.text.DedupOps.paragraphDedup]]'s keep-FIRST semantics:
    * a line whose per-group document frequency passes the threshold is
    * removed from EVERY document, first copy included, because boilerplate
    * is noise in all of them, not content that one document owns.
    *
    * A line is boilerplate in its group (domain/source) when
    * `df >= minDf` AND `df > maxDfFrac * nDocs(group)` — the absolute floor
    * keeps 2-doc micro-domains from stripping each other, the fraction
    * scales with domain size. Documents rebuild from their surviving lines
    * in original order; a doc whose every line is boilerplate survives as
    * an empty string (dropping it would silently change corpus counts).
    *
    * Scale shape: one posexplode (no shuffle); df is distinct-on
    * (group, line, doc) — keyed by all three, so a viral line's copies
    * spread across reducers — then a map-side-combined count per
    * (group, line); per-group doc totals are a ≤#groups broadcast; the
    * boilerplate SET (distinct flagged lines, small by construction — only
    * lines above the df threshold) broadcasts into the line-level probe, so
    * the hot line never keys a shuffle; reconstruction groups by doc
    * (bounded by document size). No global window anywhere.
    *
    * Null contract: a NULL text has no lines (posexplode drops the row), so
    * the doc is absent from the output — the same contract as
    * paragraphDedup; callers that must preserve null docs re-join on the id.
    */
  def boilerplateStrip(df: DataFrame, idCol: String, groupCol: String,
      textCol: Column, minDf: Int = 2, maxDfFrac: Double = 0.5,
      sep: String = "\n"): DataFrame = {
    require(minDf >= 2, s"minDf < 2 would flag every line, got $minDf")
    val lines = graft.ops.Spread.forAmplification(df, col(idCol))
      .select(col(idCol).as("__doc"), col(groupCol).as("__grp"),
        posexplode(split(textCol, java.util.regex.Pattern.quote(sep)))
          .as(Seq("__pos", "__line")))
    val lineDf = lines.select("__grp", "__line", "__doc").distinct()
      .groupBy("__grp", "__line").agg(count(lit(1)).as("__df"))
    val groupN = df.groupBy(col(groupCol).as("__grp"))
      .agg(countDistinct(col(idCol)).as("__nd"))
    val boiler = lineDf.join(broadcast(groupN), Seq("__grp"))
      .filter(col("__df") >= minDf && col("__df") > col("__nd") * maxDfFrac)
      .select(col("__grp"), col("__line"), lit(true).as("__b"))
    lines.join(broadcast(boiler), Seq("__grp", "__line"), "left")
      .groupBy(col("__doc"), col("__grp"))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(when(col("__b"), 1L).otherwise(0L)).as("n_removed"),
        array_join(transform(
          sort_array(collect_list(
            when(!coalesce(col("__b"), lit(false)),
              struct(col("__pos"), col("__line"))))),
          s => s("__line")), sep).as("text"))
      .select(col("__doc").as(idCol), col("__grp").as(groupCol),
        col("text"), col("n_lines"), col("n_removed"))
  }

  def gumbelTopK(weights: DataFrame, idCol: String, logwCol: String,
      k: Int, seed: String = "42"): DataFrame = {
    // u in (0,1): (h + 0.5) / 2^32 can reach neither 0 nor 1, so the double
    // log below is always finite
    val u = (TextAnalysis.md5Int32(concat_ws("|", lit(seed),
      col(idCol).cast("string"))) + 0.5) / 4294967296.0
    weights
      .withColumn("key", round(col(logwCol) - log(-log(u)), 6))
      .orderBy(col("key").desc, col(idCol))
      .limit(k)
  }
}
