package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Compaction, EventAnalytics, RankEval, Stats}

/** Round-7 inferential-statistics + planning operators: group-wise OLS,
  * chi-squared independence, Welch's t, MAD robust outliers, Benford
  * audit, EWMA smoothing, Markov transitions, compaction bin planning,
  * and ranking eval (nDCG/MRR). Every query is exact-oracled: data-sized
  * sums are DECIMAL on both engines, derived doubles replay the identical
  * operation order, moments round to 6.
  */
object StatsQueries extends QueryGroup {

  /** Per-returnflag OLS of extendedprice on quantity (Stats.regrByGroup):
    * slope/intercept/r² from the five exact decimal sums, one map-side
    * combined groupBy. */
  val q155Regression = QueryDef(
    "q155_regression",
    (s, d) => Stats.regrByGroup(Tables.lineitem(s, d), Seq("l_returnflag"),
        col("l_quantity"), col("l_extendedprice"))
      .orderBy("l_returnflag"),
    Some("""WITH a AS (SELECT l_returnflag,
          CAST(COUNT(*) FILTER (l_quantity IS NOT NULL
            AND l_extendedprice IS NOT NULL) AS BIGINT) AS n,
          CAST(SUM(CAST(l_quantity AS DECIMAL(28,8)))
            FILTER (l_extendedprice IS NOT NULL) AS DOUBLE) AS sx,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,8)))
            FILTER (l_quantity IS NOT NULL) AS DOUBLE) AS sy,
          CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(38,8)))
            AS DOUBLE) AS sxy,
          CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,8)))
            FILTER (l_extendedprice IS NOT NULL) AS DOUBLE) AS sxx,
          CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,8)))
            FILTER (l_quantity IS NOT NULL) AS DOUBLE) AS syy
        FROM lineitem GROUP BY l_returnflag),
      b AS (SELECT l_returnflag, n, sx, sy, sxy, sxx, syy,
          CAST(n AS DOUBLE) * sxy - sx * sy AS cov_n,
          CAST(n AS DOUBLE) * sxx - sx * sx AS varx_n,
          CAST(n AS DOUBLE) * syy - sy * sy AS vary_n FROM a)
      SELECT l_returnflag, n,
        CASE WHEN varx_n > 0 THEN ROUND(cov_n / varx_n, 6) END AS slope,
        CASE WHEN varx_n > 0
          THEN ROUND((sy - (cov_n / varx_n) * sx) / CAST(n AS DOUBLE), 6)
          END AS intercept,
        CASE WHEN varx_n > 0 AND vary_n > 0
          THEN ROUND(cov_n * cov_n / (varx_n * vary_n), 6) END AS r2
      FROM b ORDER BY l_returnflag NULLS FIRST"""))

  /** Chi-squared independence of order priority × order status
    * (Stats.chiSquareIndependence): contingency in one data pass, expected
    * counts from the densified marginal grid. */
  val q156ChiSquare = QueryDef(
    "q156_chi_square",
    (s, d) => Stats.chiSquareIndependence(Tables.orders(s, d),
      col("o_orderpriority"), col("o_orderstatus")),
    Some("""WITH obs AS (SELECT o_orderpriority AS a, o_orderstatus AS b,
          CAST(COUNT(*) AS BIGINT) AS o FROM orders
        WHERE o_orderpriority IS NOT NULL AND o_orderstatus IS NOT NULL
        GROUP BY 1, 2),
      ma AS (SELECT a, SUM(o) AS na FROM obs GROUP BY a),
      mb AS (SELECT b, SUM(o) AS nb FROM obs GROUP BY b),
      dense AS (SELECT ma.a, mb.b, ma.na, mb.nb, COALESCE(obs.o, 0) AS o
        FROM ma CROSS JOIN mb LEFT JOIN obs ON ma.a = obs.a AND mb.b = obs.b),
      tot AS (SELECT SUM(o) AS n FROM dense),
      oe AS (SELECT CAST(o AS DOUBLE) AS od,
          CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / CAST(n AS DOUBLE) AS e
        FROM dense, tot),
      terms AS (SELECT ROUND((od - e) * (od - e) / e, 8) AS term FROM oe)
      SELECT
        ROUND(CAST(SUM(CAST(term AS DECIMAL(28,8))) AS DOUBLE), 6) AS chi2,
        CAST((SELECT (COUNT(*) - 1) FROM ma)
          * (SELECT (COUNT(*) - 1) FROM mb) AS BIGINT) AS dof,
        (SELECT CAST(n AS BIGINT) FROM tot) AS n
      FROM terms"""))

  /** Welch's t between high-discount and low-discount line items on
    * quantity (Stats.welchTTest): one conditional-decimal-sum aggregation. */
  val q157WelchT = QueryDef(
    "q157_welch_t",
    (s, d) => Stats.welchTTest(Tables.lineitem(s, d),
      col("l_discount") >= 0.05, col("l_quantity")),
    Some("""WITH a AS (SELECT
          CAST(COUNT(CASE WHEN l_discount >= 0.05 THEN 1 END) AS BIGINT) AS n_a,
          CAST(COUNT(CASE WHEN NOT (l_discount >= 0.05) THEN 1 END) AS BIGINT) AS n_b,
          CAST(SUM(CASE WHEN l_discount >= 0.05
            THEN CAST(l_quantity AS DECIMAL(28,8)) END) AS DOUBLE) AS sa,
          CAST(SUM(CASE WHEN NOT (l_discount >= 0.05)
            THEN CAST(l_quantity AS DECIMAL(28,8)) END) AS DOUBLE) AS sb,
          CAST(SUM(CASE WHEN l_discount >= 0.05
            THEN CAST(l_quantity * l_quantity AS DECIMAL(38,8)) END)
            AS DOUBLE) AS sa2,
          CAST(SUM(CASE WHEN NOT (l_discount >= 0.05)
            THEN CAST(l_quantity * l_quantity AS DECIMAL(38,8)) END)
            AS DOUBLE) AS sb2
        FROM lineitem
        WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL),
      b AS (SELECT n_a, n_b, sa, sb, sa2, sb2,
          CAST(n_a AS DOUBLE) AS na, CAST(n_b AS DOUBLE) AS nb FROM a),
      c AS (SELECT n_a, n_b, na, nb, sa / na AS mean_a, sb / nb AS mean_b,
          (sa2 - sa * sa / na) / (na - 1) AS var_a,
          (sb2 - sb * sb / nb) / (nb - 1) AS var_b FROM b),
      e AS (SELECT n_a, n_b, mean_a, mean_b, var_a, var_b,
          var_a / na + var_b / nb AS se2,
          var_a * var_a / (na * na * (na - 1))
            + var_b * var_b / (nb * nb * (nb - 1)) AS dd,
          na, nb FROM c)
      SELECT n_a, n_b, ROUND(mean_a, 6) AS mean_a, ROUND(mean_b, 6) AS mean_b,
        CASE WHEN n_a >= 2 AND n_b >= 2 AND se2 > 0
          THEN ROUND((mean_a - mean_b) / SQRT(se2), 6) END AS t_stat,
        CASE WHEN n_a >= 2 AND n_b >= 2 AND se2 > 0
          THEN ROUND(se2 * se2 / dd, 6) END AS dof
      FROM e"""))

  /** MAD robust outliers of event values within event type
    * (Stats.madOutliers): rows > 3 MADs from their group median, exact
    * interpolated medians on both engines. */
  val q158MadOutliers = QueryDef(
    "q158_mad_outliers",
    (s, d) => Stats.madOutliers(Tables.events(s, d), "event_type",
        col("value"), k = 3.0)
      .select("event_id", "event_type", "value", "mad_score")
      .orderBy("event_type", "event_id"),
    Some("""WITH med AS (SELECT event_type,
          quantile_cont(value, 0.5) AS m FROM events
        GROUP BY event_type),
      dev AS (SELECT e.*, med.m FROM events e JOIN med USING (event_type)),
      mad AS (SELECT event_type,
          quantile_cont(ABS(value - m), 0.5) AS mad FROM dev
        GROUP BY event_type)
      SELECT event_id, event_type, value,
        ROUND(ABS(value - m) / mad, 6) AS mad_score
      FROM dev JOIN mad USING (event_type)
      WHERE mad > 0 AND ABS(value - m) > mad * 3
      ORDER BY event_type, event_id"""))

  /** Benford first-digit audit of order totals (Stats.benford): digit from
    * the exact DECIMAL string rendering, expected shares log10(1+1/d),
    * chi-squared deviation total. */
  val q159Benford = QueryDef(
    "q159_benford",
    (s, d) => Stats.benford(Tables.orders(s, d), col("o_totalprice")),
    Some("""WITH h AS (SELECT regexp_extract(
            CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR), '[1-9]', 0)
            AS digit,
          CAST(COUNT(*) AS BIGINT) AS n
        FROM orders WHERE o_totalprice IS NOT NULL AND o_totalprice > 0
        GROUP BY 1 HAVING digit <> ''),
      t AS (SELECT digit, n,
          CAST(n AS DOUBLE) / CAST(SUM(n) OVER () AS DOUBLE) AS p,
          LN(1.0 + 1.0 / CAST(digit AS DOUBLE)) / LN(10.0) AS q,
          CAST(SUM(n) OVER () AS DOUBLE) AS ntot FROM h)
      SELECT digit, n, ROUND(p, 6) AS p_obs, ROUND(q, 6) AS p_benford,
        ROUND(CAST(SUM(CAST(ROUND((p - q) * (p - q) / q * ntot, 8)
          AS DECIMAL(28,8))) OVER () AS DOUBLE), 6) AS chi2_total
      FROM t ORDER BY digit"""))

  /** Per-user EWMA of event values over the trailing 10 events
    * (EventAnalytics.ewma): windowed list fold, α = 0.3 — the oracle
    * replays the identical left fold via list_reduce. */
  val q160Ewma = QueryDef(
    "q160_ewma",
    (s, d) => EventAnalytics.ewma(
        Tables.events(s, d).filter(col("value").isNotNull),
        "user_id", "ts", "value", tieCol = "event_id")
      .select("event_id", "user_id", "ewma")
      .orderBy("user_id", "event_id"),
    Some("""WITH t AS (SELECT event_id, user_id,
          list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS l
        FROM events WHERE value IS NOT NULL)
      SELECT event_id, user_id,
        ROUND(list_reduce(l, (acc, x) -> x * 0.3 + acc * 0.7), 6) AS ewma
      FROM t ORDER BY user_id, event_id"""))

  /** Markov transition matrix of event types
    * (EventAnalytics.markovTransitions): adjacent-pair counts within each
    * user's (ts, event_id)-ordered sequence, conditional P(next|prev). */
  val q161Markov = QueryDef(
    "q161_markov",
    (s, d) => EventAnalytics.markovTransitions(Tables.events(s, d),
      "user_id", "ts", "event_type", tieCol = "event_id"),
    Some("""WITH seq AS (SELECT user_id, event_type,
          LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
            AS prev_type
        FROM events),
      pairs AS (SELECT prev_type, event_type AS next_type,
          CAST(COUNT(*) AS BIGINT) AS n
        FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2)
      SELECT prev_type, next_type, n,
        ROUND(CAST(n AS DOUBLE)
          / CAST(SUM(n) OVER (PARTITION BY prev_type) AS DOUBLE), 6) AS p
      FROM pairs ORDER BY prev_type, next_type"""))

  /** Compaction bin planning over documents by source
    * (Compaction.planBins + binManifest): next-fit running-sum packing of
    * doc payloads into 100 KB bins, exact decimal prefix sums. */
  val q162Compaction = QueryDef(
    "q162_compaction",
    (s, d) => Compaction.binManifest(
      Compaction.planBins(Tables.documents(s, d), Seq("source"),
        col("n_chars"), col("doc_id"), targetSize = 100000L),
      Seq("source"), col("n_chars")),
    Some("""WITH c AS (SELECT source, doc_id, n_chars,
          COALESCE(SUM(CAST(n_chars AS DECIMAL(28,0))) OVER (
            PARTITION BY source ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
        FROM documents),
      b AS (SELECT source, CAST(FLOOR(before / 100000) AS BIGINT) AS bin,
          n_chars FROM c)
      SELECT source, bin, CAST(COUNT(*) AS BIGINT) AS n_items,
        CAST(SUM(CAST(n_chars AS DECIMAL(28,0))) AS BIGINT) AS total_size
      FROM b GROUP BY source, bin ORDER BY source NULLS FIRST, bin"""))

  /** Ranking eval (RankEval.ndcgAtK): per source, rank docs by length and
    * score English docs as relevant — nDCG@10 + MRR@10 with decimal-term
    * DCG sums. A stand-in qrels/run pair exercising the exact metric
    * shape the retrieval queries (q48/q86/q110) are tuned against. */
  val q163Ndcg = QueryDef(
    "q163_ndcg",
    (s, d) => RankEval.ndcgAtK(Tables.documents(s, d), "source",
        scoreCol = col("n_chars"), relCol = when(col("lang") === "en", 1.0).otherwise(0.0),
        tieCol = col("doc_id"), k = 10)
      .orderBy("source"),
    Some("""WITH ranked AS (SELECT source, doc_id,
          CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS rel,
          ROW_NUMBER() OVER (PARTITION BY source
            ORDER BY n_chars DESC, doc_id ASC) AS rank
        FROM documents),
      topk AS (SELECT * FROM ranked WHERE rank <= 10),
      scored AS (SELECT source, rel, rank,
          CAST(rel / (LN(CAST(rank AS DOUBLE) + 1.0) / LN(2.0))
            AS DECIMAL(28,10)) AS gain,
          CAST(rel / (LN(CAST(ROW_NUMBER() OVER (PARTITION BY source
              ORDER BY rel DESC, doc_id ASC) AS DOUBLE) + 1.0) / LN(2.0))
            AS DECIMAL(28,10)) AS ideal
        FROM topk),
      agg AS (SELECT source,
          CAST(SUM(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_rel,
          CAST(SUM(gain) AS DOUBLE) AS dcg,
          CAST(SUM(ideal) AS DOUBLE) AS idcg,
          MIN(CASE WHEN rel > 0 THEN rank END) AS first_rel
        FROM scored GROUP BY source)
      SELECT source, n_rel,
        CASE WHEN idcg > 0 THEN ROUND(dcg / idcg, 6) ELSE 0.0 END AS ndcg,
        COALESCE(ROUND(1.0 / CAST(first_rel AS DOUBLE), 6), 0.0) AS mrr
      FROM agg ORDER BY source NULLS FIRST"""))

  /** Textbook-ideal nDCG@10 (RankEval.ndcgAtKGlobalIdeal): same stand-in
    * qrels/run pair as q163, but the ideal ranks ALL relevant docs in the
    * group — a retriever that fails to surface relevant items is penalized,
    * and n_rel counts every relevant doc. The q163/q164 pair documents the
    * local-vs-global ideal choice as data. */
  val q164NdcgGlobal = QueryDef(
    "q164_ndcg_global",
    (s, d) => RankEval.ndcgAtKGlobalIdeal(Tables.documents(s, d), "source",
        scoreCol = col("n_chars"), relCol = when(col("lang") === "en", 1.0).otherwise(0.0),
        tieCol = col("doc_id"), k = 10)
      .orderBy("source"),
    Some("""WITH ranked AS (SELECT source, doc_id,
          CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS rel,
          ROW_NUMBER() OVER (PARTITION BY source
            ORDER BY n_chars DESC, doc_id ASC) AS rank,
          ROW_NUMBER() OVER (PARTITION BY source
            ORDER BY (CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END) DESC,
              doc_id ASC) AS irank
        FROM documents),
      scored AS (SELECT source, rel, rank,
          CAST(CASE WHEN rank <= 10
            THEN rel / (LN(CAST(rank AS DOUBLE) + 1.0) / LN(2.0))
            ELSE 0.0 END AS DECIMAL(28,10)) AS gain,
          CAST(CASE WHEN irank <= 10
            THEN rel / (LN(CAST(irank AS DOUBLE) + 1.0) / LN(2.0))
            ELSE 0.0 END AS DECIMAL(28,10)) AS ideal
        FROM ranked),
      agg AS (SELECT source,
          CAST(SUM(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_rel,
          CAST(SUM(gain) AS DOUBLE) AS dcg,
          CAST(SUM(ideal) AS DOUBLE) AS idcg,
          MIN(CASE WHEN rel > 0 AND rank <= 10 THEN rank END) AS first_rel
        FROM scored GROUP BY source)
      SELECT source, n_rel,
        CASE WHEN idcg > 0 THEN ROUND(dcg / idcg, 6) ELSE 0.0 END AS ndcg,
        COALESCE(ROUND(1.0 / CAST(first_rel AS DOUBLE), 6), 0.0) AS mrr
      FROM agg ORDER BY source NULLS FIRST"""))

  /** Cohen's kappa (Stats.cohenKappa) between the corpus lang label and a
    * deterministic noisy re-labeler (70% copies lang, 30% answers the
    * source name) — the annotation-QA agreement check; the synthetic
    * second rater keeps the oracle exact. */
  val q166CohenKappa = QueryDef(
    "q166_cohen_kappa",
    (s, d) => Stats.cohenKappa(Tables.documents(s, d),
      col("lang"),
      when(col("doc_id") % 10 < 7, col("lang")).otherwise(col("source"))),
    Some("""WITH t AS (SELECT lang AS a,
          CASE WHEN doc_id % 10 < 7 THEN lang ELSE source END AS b
        FROM documents WHERE lang IS NOT NULL),
      obs AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS o FROM t GROUP BY a, b),
      ma AS (SELECT a AS c, SUM(o) AS na FROM obs GROUP BY a),
      mb AS (SELECT b AS c, SUM(o) AS nb FROM obs GROUP BY b),
      marg AS (SELECT CAST(SUM(COALESCE(na, 0)) AS BIGINT) AS n,
          SUM(CAST(COALESCE(na, 0) * COALESCE(nb, 0) AS DECIMAL(38,0))) AS pe_num
        FROM ma FULL JOIN mb USING (c)),
      agree AS (SELECT CAST(COALESCE(SUM(o), 0) AS BIGINT) AS n_agree
        FROM obs WHERE a = b)
      SELECT n,
        ROUND(CAST(n_agree AS DOUBLE) / n, 6) AS po,
        ROUND(CAST(pe_num AS DOUBLE) / (CAST(n AS DOUBLE) * n), 6) AS pe,
        CASE WHEN CAST(pe_num AS DOUBLE) / (CAST(n AS DOUBLE) * n) < 1.0
          THEN ROUND((CAST(n_agree AS DOUBLE) / n
              - CAST(pe_num AS DOUBLE) / (CAST(n AS DOUBLE) * n))
            / (1.0 - CAST(pe_num AS DOUBLE) / (CAST(n AS DOUBLE) * n)), 6)
          END AS kappa
      FROM marg, agree"""))

  /** Gini concentration of events per user (Stats.giniConcentration) — the
    * "is activity 90% one entity?" audit; one keyed groupBy over data, the
    * rank window runs over the ≤#users report table. */
  val q167GiniUsers = QueryDef(
    "q167_gini_users",
    (s, d) => Stats.giniConcentration(Tables.events(s, d), col("user_id")),
    Some("""WITH sizes AS (SELECT CAST(user_id AS VARCHAR) AS g,
          CAST(COUNT(*) AS BIGINT) AS x
        FROM events WHERE user_id IS NOT NULL GROUP BY 1),
      r AS (SELECT x, ROW_NUMBER() OVER (ORDER BY x ASC, g ASC) AS i,
          COUNT(*) OVER () AS n FROM sizes)
      SELECT CAST(MAX(n) AS BIGINT) AS n_groups,
        CAST(SUM(x) AS BIGINT) AS total,
        ROUND(CAST(SUM(CAST((2 * i - n - 1) * x AS DECIMAL(38,0))) AS DOUBLE)
          / (CAST(MAX(n) AS DOUBLE) * CAST(SUM(x) AS DOUBLE)), 6) AS gini
      FROM r"""))

  /** Calibration curve + Brier score (Stats.calibrationCurve) of an exact
    * rational score ((n_chars % 1000)/1000 — float-exact on both engines)
    * against the is-English label: per-decile mean score vs observed rate. */
  val q168Calibration = QueryDef(
    "q168_calibration",
    (s, d) => Stats.calibrationCurve(Tables.documents(s, d),
      (col("n_chars") % 1000).cast("double") / 1000.0,
      col("lang") === "en"),
    Some("""WITH t AS (SELECT
          LEAST(CAST(FLOOR(((n_chars % 1000) / 1000.0) * 10) AS BIGINT), 9)
            AS bucket,
          CAST((n_chars % 1000) / 1000.0 AS DECIMAL(28,10)) AS s,
          CAST(CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS DECIMAL(28,10))
            AS y,
          CAST(((n_chars % 1000) / 1000.0
              - CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END)
            * ((n_chars % 1000) / 1000.0
              - CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END)
            AS DECIMAL(38,10)) AS se
        FROM documents WHERE n_chars IS NOT NULL AND lang IS NOT NULL),
      h AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n, SUM(s) AS ss,
          SUM(y) AS sy, SUM(se) AS sse FROM t GROUP BY bucket)
      SELECT bucket, n,
        ROUND(CAST(ss AS DOUBLE) / n, 6) AS mean_score,
        ROUND(CAST(sy AS DOUBLE) / n, 6) AS pos_rate,
        ROUND(CAST(SUM(sse) OVER () AS DOUBLE)
          / CAST(SUM(n) OVER () AS DOUBLE), 6) AS brier_total
      FROM h ORDER BY bucket"""))

  /** ROC AUC of event value as a purchase predictor (Stats.aucRankSum):
    * Mann–Whitney rank-sum with average-rank tie handling, global ranks
    * via range-partitioned prefix sums — never a global sort or a
    * single-partition window. The oracle replays the identical integer
    * 2·avgRank form (RANK() + tie count). */
  val q169Auc = QueryDef(
    "q169_auc",
    (s, d) => Stats.aucRankSum(Tables.events(s, d),
      col("value"), col("event_type") === "purchase"),
    Some("""WITH t AS (SELECT value AS v,
          CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS p
        FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL),
      r AS (SELECT p, RANK() OVER (ORDER BY v) AS rk,
          COUNT(*) OVER (PARTITION BY v) AS m FROM t),
      s AS (SELECT CAST(SUM(p) AS BIGINT) AS n_pos,
          CAST(SUM(1 - p) AS BIGINT) AS n_neg,
          SUM(CASE WHEN p = 1
            THEN CAST(2 * rk + m - 1 AS DECIMAL(38,0)) END) AS s2
        FROM r)
      SELECT n_pos, n_neg,
        ROUND(CAST(s2 - CAST(n_pos AS DECIMAL(38,0)) * (n_pos + 1)
            AS DOUBLE) / (2.0 * n_pos * n_neg), 6) AS auc
      FROM s"""))

  /** Zipf slope per source: OLS of ln(freq) on ln(rank) over each source's
    * top-200 terms — the power-law health check on a corpus (natural text
    * slopes near −1; templated/boilerplate sources flatten or cliff). A
    * composition query: term frequencies collapse in one explode+groupBy,
    * ranks are a keyed window over the vocab-sized frequency table (never
    * data rows), the fit is Stats.regrByGroup on 6-rounded logs (rounding
    * BEFORE the decimal-exact sums keeps the double→decimal boundary
    * cross-engine-safe for transcendental inputs). */
  val q170ZipfSlope = QueryDef(
    "q170_zipf_slope",
    (s, d) => {
      val tf = graft.ops.Spread.forAmplification(Tables.documents(s, d))
        .select(col("source"),
          explode(graft.text.TextAnalysis.tokens(col("text"))).as("t"))
        .filter(length(col("t")) > 0)
        .groupBy("source", "t").agg(count(lit(1)).as("c"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy(col("c").desc, col("t").asc)
      val ranked = tf.withColumn("r", row_number().over(w))
        .filter(col("r") <= 200)
      Stats.regrByGroup(
          ranked.select(col("source"),
            round(log(col("r").cast("double")), 6).as("ln_rank"),
            round(log(col("c").cast("double")), 6).as("ln_freq")),
          Seq("source"), col("ln_rank"), col("ln_freq"))
        .orderBy("source")
    },
    Some("""WITH tk AS (SELECT source, unnest(string_split(text, ' ')) AS t
          FROM documents),
      tf AS (SELECT source, t, CAST(COUNT(*) AS BIGINT) AS c FROM tk
        WHERE len(t) > 0 GROUP BY source, t),
      rk AS (SELECT source, c, ROW_NUMBER() OVER (PARTITION BY source
          ORDER BY c DESC, t ASC) AS r FROM tf),
      xy AS (SELECT source, ROUND(LN(CAST(r AS DOUBLE)), 6) AS x,
          ROUND(LN(CAST(c AS DOUBLE)), 6) AS y FROM rk WHERE r <= 200),
      a AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(CAST(x AS DECIMAL(28,8))) AS DOUBLE) AS sx,
          CAST(SUM(CAST(y AS DECIMAL(28,8))) AS DOUBLE) AS sy,
          CAST(SUM(CAST(x * y AS DECIMAL(38,8))) AS DOUBLE) AS sxy,
          CAST(SUM(CAST(x * x AS DECIMAL(38,8))) AS DOUBLE) AS sxx,
          CAST(SUM(CAST(y * y AS DECIMAL(38,8))) AS DOUBLE) AS syy
        FROM xy GROUP BY source),
      b AS (SELECT source, n, sx, sy, sxy, sxx, syy,
          CAST(n AS DOUBLE) * sxy - sx * sy AS cov_n,
          CAST(n AS DOUBLE) * sxx - sx * sx AS varx_n,
          CAST(n AS DOUBLE) * syy - sy * sy AS vary_n FROM a)
      SELECT source, n,
        CASE WHEN varx_n > 0 THEN ROUND(cov_n / varx_n, 6) END AS slope,
        CASE WHEN varx_n > 0
          THEN ROUND((sy - (cov_n / varx_n) * sx) / CAST(n AS DOUBLE), 6)
          END AS intercept,
        CASE WHEN varx_n > 0 AND vary_n > 0
          THEN ROUND(cov_n * cov_n / (varx_n * vary_n), 6) END AS r2
      FROM b ORDER BY source"""))

  /** Mutual information + entropies + NMI between order priority and status
    * (Stats.mutualInformation): the "how much information" companion to
    * q156's chi-squared on the same pair — one contingency pass, per-cell
    * terms rounded to 8 and DECIMAL-summed. */
  val q174MutualInfo = QueryDef(
    "q174_mutual_info",
    (s, d) => Stats.mutualInformation(Tables.orders(s, d),
      col("o_orderpriority"), col("o_orderstatus")),
    Some("""WITH obs AS (SELECT o_orderpriority AS a, o_orderstatus AS b,
          CAST(COUNT(*) AS BIGINT) AS o FROM orders
        WHERE o_orderpriority IS NOT NULL AND o_orderstatus IS NOT NULL
        GROUP BY 1, 2),
      ma AS (SELECT a, SUM(o) AS na FROM obs GROUP BY a),
      mb AS (SELECT b, SUM(o) AS nb FROM obs GROUP BY b),
      tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM obs),
      mi AS (SELECT ROUND(CAST(SUM(CAST(ROUND(
            (CAST(o AS DOUBLE) / n) * LN((CAST(o AS DOUBLE) * n)
              / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))), 8)
            AS DECIMAL(28,8))) AS DOUBLE), 6) AS mi
        FROM obs JOIN ma USING (a) JOIN mb USING (b), tot),
      ha AS (SELECT ROUND(CAST(SUM(CAST(ROUND(
            -(CAST(na AS DOUBLE) / n) * LN(CAST(na AS DOUBLE) / n), 8)
            AS DECIMAL(28,8))) AS DOUBLE), 6) AS h_a FROM ma, tot),
      hb AS (SELECT ROUND(CAST(SUM(CAST(ROUND(
            -(CAST(nb AS DOUBLE) / n) * LN(CAST(nb AS DOUBLE) / n), 8)
            AS DECIMAL(28,8))) AS DOUBLE), 6) AS h_b FROM mb, tot)
      SELECT n, mi, h_a, h_b,
        CASE WHEN h_a > 0 AND h_b > 0
          THEN ROUND(mi / SQRT(h_a * h_b), 6) END AS nmi
      FROM tot, mi, ha, hb"""))

  /** Per-returnflag 5-95 trimmed mean of extended price (Stats.trimmedMean):
    * robust location from the group's own exact percentile bounds, mean
    * from DECIMAL sums; the two group aggregations and the join back all
    * align on the same shuffle key. */
  val q177TrimmedMean = QueryDef(
    "q177_trimmed_mean",
    (s, d) => Stats.trimmedMean(Tables.lineitem(s, d), "l_returnflag",
        col("l_extendedprice"))
      .orderBy("l_returnflag"),
    Some("""WITH b AS (SELECT l_returnflag,
          quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.05) AS lo,
          quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.95) AS hi
        FROM lineitem GROUP BY l_returnflag)
      SELECT l.l_returnflag AS l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_kept,
        ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,8))) AS DOUBLE)
          / COUNT(*), 6) AS trimmed_mean
      FROM lineitem l JOIN b ON l.l_returnflag = b.l_returnflag
      WHERE CAST(l_extendedprice AS DOUBLE) >= lo
        AND CAST(l_extendedprice AS DOUBLE) <= hi
      GROUP BY 1 ORDER BY 1"""))

  /** Quantile-normalize the odd-half doc lengths against the even-half
    * reference distribution (Stats.quantileNormalize): deciles learned
    * from the reference in one bounded collect, mapping is a pure literal
    * projection — no join, no shuffle on the data side. */
  val q179QuantileNorm = QueryDef(
    "q179_quantile_normalize",
    (s, d) => {
      val docs = Tables.documents(s, d)
      Stats.quantileNormalize(
          docs.filter(col("doc_id") % 2 === 1).select("doc_id", "n_chars"),
          col("n_chars"),
          docs.filter(col("doc_id") % 2 === 0), col("n_chars"))
        .orderBy("doc_id")
    },
    Some("""WITH ref AS (SELECT CAST(n_chars AS DOUBLE) AS v FROM documents
          WHERE doc_id % 2 = 0 AND n_chars IS NOT NULL),
      cs AS (SELECT quantile_cont(v,
          [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS cuts FROM ref),
      ms AS (SELECT quantile_cont(v,
          [0.05, 0.15, 0.25, 0.35, 0.45, 0.55, 0.65, 0.75, 0.85, 0.95]) AS mids
        FROM ref)
      SELECT doc_id, n_chars,
        CASE WHEN n_chars IS NOT NULL THEN ROUND(mids[
          len(list_filter(cuts, c -> CAST(n_chars AS DOUBLE) >= c)) + 1], 6)
          END AS normalized
      FROM documents, cs, ms WHERE doc_id % 2 = 1 ORDER BY doc_id"""))

  /** Bootstrap CI of the mean doc length (Stats.bootstrapMeanCI):
    * 40 deterministic Poisson resamples from md5(seed|b|doc_id), SE and
    * exact-percentile CI from the resample means — the distributed
    * bootstrap, replayed identically by the oracle. */
  val q180BootstrapCI = QueryDef(
    "q180_bootstrap_ci",
    (s, d) => Stats.bootstrapMeanCI(Tables.documents(s, d), "doc_id",
      col("n_chars")),
    Some("""WITH st AS (SELECT t.b AS b, CAST(n_chars AS DOUBLE) AS x,
          (CAST(('0x' || substr(md5('42' || '|' || CAST(t.b AS VARCHAR)
              || '|' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) + 1.0)
            / 1152921504606846976.0 AS u
        FROM documents, range(40) t(b) WHERE n_chars IS NOT NULL),
      ww AS (SELECT b, x, CASE
          WHEN u < 0.36787944117144233 THEN 0
          WHEN u < 0.7357588823428847 THEN 1
          WHEN u < 0.9196986029286058 THEN 2
          WHEN u < 0.9810118431238462 THEN 3
          ELSE 4 END AS w FROM st),
      means AS (SELECT b,
          CAST(SUM(CAST(w * x AS DECIMAL(38,8))) AS DOUBLE) / SUM(w) AS m
        FROM ww GROUP BY b HAVING SUM(w) > 0),
      stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS bn,
          CAST(SUM(CAST(m AS DECIMAL(28,10))) AS DOUBLE) AS sm,
          CAST(SUM(CAST(m * m AS DECIMAL(38,10))) AS DOUBLE) AS sm2,
          ROUND(quantile_cont(m, 0.05), 6) AS ci_lo,
          ROUND(quantile_cont(m, 0.95), 6) AS ci_hi
        FROM means),
      fl AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
          ROUND(CAST(SUM(CAST(n_chars AS DECIMAL(28,8))) AS DOUBLE)
            / COUNT(*), 6) AS mean
        FROM documents WHERE n_chars IS NOT NULL)
      SELECT n, mean,
        CASE WHEN bn >= 2 THEN ROUND(SQRT(
          (sm2 - sm * sm / CAST(bn AS DOUBLE)) / (CAST(bn AS DOUBLE) - 1)), 6)
          END AS se,
        ci_lo, ci_hi
      FROM fl, stats"""))

  /** Information-gain sweep (Stats.infoGainSweep): MI of doc-length buckets
    * AND source against the language label in ONE stacked pass — the
    * feature-selection audit, per-feature windows over bounded cell
    * tables. */
  val q181InfoGainSweep = QueryDef(
    "q181_info_gain_sweep",
    (s, d) => Stats.infoGainSweep(Tables.documents(s, d), col("lang"),
      Seq(
        "len" -> least((col("n_chars") / 100).cast("bigint"), lit(5L)),
        "source" -> col("source"))),
    Some("""WITH st AS (SELECT f.feature AS feature, f.bucket AS bucket,
          lang AS label
        FROM (SELECT lang, unnest(ARRAY[
            struct_pack(feature := 'len',
              bucket := CAST(LEAST(n_chars // 100, 5) AS VARCHAR)),
            struct_pack(feature := 'source', bucket := source)]) AS f
          FROM documents WHERE lang IS NOT NULL) q
        WHERE f.bucket IS NOT NULL),
      cells AS (SELECT feature, bucket, label, CAST(COUNT(*) AS BIGINT) AS o
        FROM st GROUP BY 1, 2, 3),
      mb AS (SELECT feature, bucket, SUM(o) AS nb FROM cells GROUP BY 1, 2),
      ml AS (SELECT feature, label, SUM(o) AS nl FROM cells GROUP BY 1, 2),
      nf AS (SELECT feature, SUM(o) AS n FROM cells GROUP BY 1),
      hl AS (SELECT ml.feature AS feature,
          ROUND(CAST(SUM(CAST(ROUND(
            -(CAST(nl AS DOUBLE) / n) * LN(CAST(nl AS DOUBLE) / n), 8)
            AS DECIMAL(28,8))) AS DOUBLE), 6) AS h_label,
          CAST(MAX(n) AS BIGINT) AS n
        FROM ml JOIN nf ON ml.feature = nf.feature GROUP BY ml.feature),
      mi AS (SELECT c.feature AS feature,
          ROUND(CAST(SUM(CAST(ROUND(
            (CAST(o AS DOUBLE) / n) * LN((CAST(o AS DOUBLE) * n)
              / (CAST(nb AS DOUBLE) * CAST(nl AS DOUBLE))), 8)
            AS DECIMAL(28,8))) AS DOUBLE), 6) AS mi
        FROM cells c JOIN mb USING (feature, bucket)
          JOIN ml USING (feature, label) JOIN nf USING (feature)
        GROUP BY c.feature)
      SELECT feature, n, mi, h_label,
        CASE WHEN h_label > 0 THEN ROUND(mi / h_label, 6) END AS ig_ratio
      FROM hl JOIN mi USING (feature) ORDER BY feature"""))

  /** One-way ANOVA of line-item quantity across return flags
    * (Stats.anovaOneWay): F statistic + eta² from the per-group exact
    * decimal sums — the k-group generalization of q157's Welch t. */
  val q183Anova = QueryDef(
    "q183_anova",
    (s, d) => Stats.anovaOneWay(Tables.lineitem(s, d),
      col("l_returnflag"), col("l_quantity")),
    Some("""WITH per AS (SELECT l_returnflag,
          CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(CAST(l_quantity AS DECIMAL(28,8))) AS DOUBLE) AS s,
          CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,8)))
            AS DOUBLE) AS s2
        FROM lineitem
        WHERE l_returnflag IS NOT NULL AND l_quantity IS NOT NULL
        GROUP BY 1),
      roll AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
          CAST(SUM(n) AS BIGINT) AS n,
          CAST(SUM(CAST(s AS DECIMAL(38,8))) AS DOUBLE) AS ts,
          CAST(SUM(CAST(s2 AS DECIMAL(38,8))) AS DOUBLE) AS ts2,
          CAST(SUM(CAST(ROUND(s * s / CAST(n AS DOUBLE), 8)
            AS DECIMAL(38,8))) AS DOUBLE) AS a
        FROM per),
      d AS (SELECT k, n, CAST(n AS DOUBLE) AS nd, CAST(k AS DOUBLE) AS kd,
          a - ts * ts / CAST(n AS DOUBLE) AS ssb,
          ts2 - a AS ssw,
          ts2 - ts * ts / CAST(n AS DOUBLE) AS sst FROM roll)
      SELECT k, n, ROUND(ssb, 6) AS ss_between, ROUND(ssw, 6) AS ss_within,
        CASE WHEN k >= 2 AND n > k AND ssw > 0
          THEN ROUND((ssb / (kd - 1)) / (ssw / (nd - kd)), 6) END AS f_stat,
        CASE WHEN sst > 0 THEN ROUND(ssb / sst, 6) END AS eta2
      FROM d"""))

  /** Cramér's V association matrix over order priority × status × a
    * 50k price band (Stats.cramersVSweep): all three pairs in one data
    * pass — the categorical-redundancy audit companion to q181. */
  val q184CramersV = QueryDef(
    "q184_cramers_v",
    (s, d) => Stats.cramersVSweep(Tables.orders(s, d), Seq(
      ("band", floor(col("o_totalprice") / 50000).cast("string")),
      ("priority", col("o_orderpriority")),
      ("status", col("o_orderstatus")))),
    Some("""WITH raw AS (SELECT o_orderpriority AS prio, o_orderstatus AS st,
          CAST(CAST(FLOOR(o_totalprice / 50000) AS BIGINT) AS VARCHAR) AS band
        FROM orders),
      stacked AS (
        SELECT 'band' AS ca, 'priority' AS cb, band AS a, prio AS b FROM raw
        UNION ALL SELECT 'band', 'status', band, st FROM raw
        UNION ALL SELECT 'priority', 'status', prio, st FROM raw),
      obs AS (SELECT ca, cb, a, b, CAST(COUNT(*) AS BIGINT) AS o
        FROM stacked WHERE a IS NOT NULL AND b IS NOT NULL
        GROUP BY 1, 2, 3, 4),
      ma AS (SELECT ca, cb, a, SUM(o) AS na FROM obs GROUP BY 1, 2, 3),
      mb AS (SELECT ca, cb, b, SUM(o) AS nb FROM obs GROUP BY 1, 2, 3),
      dense AS (SELECT ma.ca, ma.cb, ma.a, mb.b, ma.na, mb.nb,
          COALESCE(obs.o, 0) AS o
        FROM ma JOIN mb ON ma.ca = mb.ca AND ma.cb = mb.cb
        LEFT JOIN obs ON obs.ca = ma.ca AND obs.cb = ma.cb
          AND obs.a = ma.a AND obs.b = mb.b),
      wt AS (SELECT ca, cb, o,
          CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)
            / CAST(SUM(o) OVER (PARTITION BY ca, cb) AS DOUBLE) AS e
        FROM dense),
      terms AS (SELECT ca, cb, o,
          ROUND((CAST(o AS DOUBLE) - e) * (CAST(o AS DOUBLE) - e) / e, 8)
            AS term FROM wt),
      agg AS (SELECT ca, cb, CAST(SUM(o) AS BIGINT) AS n,
          ROUND(CAST(SUM(CAST(term AS DECIMAL(28,8))) AS DOUBLE), 6) AS chi2
        FROM terms GROUP BY 1, 2),
      ka AS (SELECT ca, cb, CAST(COUNT(*) AS BIGINT) AS ka
        FROM ma GROUP BY 1, 2),
      kb AS (SELECT ca, cb, CAST(COUNT(*) AS BIGINT) AS kb
        FROM mb GROUP BY 1, 2)
      SELECT agg.ca AS col_a, agg.cb AS col_b, n, chi2,
        CAST((ka - 1) * (kb - 1) AS BIGINT) AS dof,
        CASE WHEN LEAST(ka, kb) - 1 >= 1 AND n > 0
          THEN ROUND(SQRT(chi2 / (CAST(n AS DOUBLE)
            * CAST(LEAST(ka, kb) - 1 AS DOUBLE))), 6) END AS cramers_v
      FROM agg JOIN ka USING (ca, cb) JOIN kb USING (ca, cb)
      ORDER BY col_a, col_b"""))

  /** Lag-1..7 autocorrelation of the daily event-volume curve
    * (Stats.acfByLag): the weekly-seasonality probe — one data pass
    * collapses events to ≤#days rows, all window math report-sized. */
  val q185Acf = QueryDef(
    "q185_acf",
    (s, d) => Stats.acfByLag(
      Tables.events(s, d).groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).cast("double").as("cnt")),
      col("day"), col("cnt"), maxLag = 7),
    Some("""WITH daily AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
          CAST(COUNT(*) AS DOUBLE) AS cnt FROM events
        WHERE ts IS NOT NULL GROUP BY 1),
      m AS (SELECT day, cnt,
          CAST(SUM(CAST(cnt AS DECIMAL(28,8))) OVER () AS DOUBLE)
            / CAST(COUNT(*) OVER () AS DOUBLE) AS mean FROM daily),
      dev AS (SELECT day, cnt - mean AS dev FROM m),
      den AS (SELECT day, dev,
          CAST(SUM(CAST(ROUND(dev * dev, 8) AS DECIMAL(28,8))) OVER ()
            AS DOUBLE) AS denom FROM dev),
      leads AS (SELECT dev, denom,
          LEAD(dev, 1) OVER (ORDER BY day) AS l1,
          LEAD(dev, 2) OVER (ORDER BY day) AS l2,
          LEAD(dev, 3) OVER (ORDER BY day) AS l3,
          LEAD(dev, 4) OVER (ORDER BY day) AS l4,
          LEAD(dev, 5) OVER (ORDER BY day) AS l5,
          LEAD(dev, 6) OVER (ORDER BY day) AS l6,
          LEAD(dev, 7) OVER (ORDER BY day) AS l7 FROM den),
      lagged AS (
        SELECT 1 AS lag, dev, denom, l1 AS next_dev FROM leads
        UNION ALL SELECT 2, dev, denom, l2 FROM leads
        UNION ALL SELECT 3, dev, denom, l3 FROM leads
        UNION ALL SELECT 4, dev, denom, l4 FROM leads
        UNION ALL SELECT 5, dev, denom, l5 FROM leads
        UNION ALL SELECT 6, dev, denom, l6 FROM leads
        UNION ALL SELECT 7, dev, denom, l7 FROM leads)
      SELECT CAST(lag AS INTEGER) AS lag, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        CASE WHEN MAX(denom) > 0 THEN
          ROUND(CAST(SUM(CAST(ROUND(dev * next_dev, 8) AS DECIMAL(28,8)))
            AS DOUBLE) / MAX(denom), 6) END AS acf
      FROM lagged WHERE next_dev IS NOT NULL GROUP BY lag ORDER BY lag"""))

  /** Kaplan–Meier churn curve over user lifetimes
    * (EventAnalytics.userLifetimes → Stats.kaplanMeier): users whose last
    * event predates the stream edge by >1 day are observed churns, the
    * rest right-censored; survival is the exp-of-decimal-ln-sum product. */
  val q187KaplanMeier = QueryDef(
    "q187_kaplan_meier",
    (s, d) => Stats.kaplanMeier(
      EventAnalytics.userLifetimes(Tables.events(s, d), "user_id", "ts",
        horizonDays = 1),
      col("duration_days"), col("observed")),
    Some("""WITH lt AS (SELECT user_id,
          (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 86400000000 AS t,
          CASE WHEN epoch_us(MAX(ts)) <
            (SELECT epoch_us(MAX(ts)) FROM events) - 1 * 86400000000
            THEN 1 ELSE 0 END AS d
        FROM events WHERE ts IS NOT NULL GROUP BY user_id),
      g AS (SELECT t, CAST(SUM(d) AS BIGINT) AS n_events,
          CAST(SUM(1 - d) AS BIGINT) AS n_censored FROM lt GROUP BY t),
      r AS (SELECT t, n_events, n_censored,
          (SELECT SUM(n_events + n_censored) FROM g)
            - COALESCE(SUM(n_events + n_censored) OVER (ORDER BY t
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS n_risk
        FROM g),
      sv AS (SELECT t, n_events, n_censored, n_risk,
          ROUND(LN(GREATEST(1.0 - CAST(n_events AS DOUBLE)
            / CAST(n_risk AS DOUBLE), 1e-12)), 8) AS term
        FROM r),
      cum AS (SELECT t, n_events, n_censored, n_risk,
          CAST(SUM(CAST(term AS DECIMAL(28,8))) OVER (ORDER BY t)
            AS DOUBLE) AS lnsum FROM sv)
      SELECT CAST(t AS BIGINT) AS t, CAST(n_risk AS BIGINT) AS n_risk,
        n_events, n_censored, ROUND(EXP(lnsum), 6) AS survival
      FROM cum WHERE n_events > 0 ORDER BY t"""))

  /** Spearman rank correlation of quantity vs extended price
    * (Stats.spearman): Pearson on integer 2·average-ranks built with the
    * range-partitioned prefix-sum rank tables — exact under ties, no
    * global sort. The monotone companion to q09's Pearson matrix. */
  val q190Spearman = QueryDef(
    "q190_spearman",
    (s, d) => Stats.spearman(Tables.lineitem(s, d),
      col("l_quantity"), col("l_extendedprice")),
    Some("""WITH d AS (SELECT CAST(l_quantity AS DOUBLE) AS x,
          CAST(l_extendedprice AS DOUBLE) AS y FROM lineitem
        WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
      hx AS (SELECT x AS v, CAST(COUNT(*) AS BIGINT) AS cnt FROM d GROUP BY 1),
      cx AS (SELECT v, 2 * (SUM(cnt) OVER (ORDER BY v) - cnt) + cnt + 1
          AS r2 FROM hx),
      hy AS (SELECT y AS v, CAST(COUNT(*) AS BIGINT) AS cnt FROM d GROUP BY 1),
      cy AS (SELECT v, 2 * (SUM(cnt) OVER (ORDER BY v) - cnt) + cnt + 1
          AS r2 FROM hy),
      j AS (SELECT cx.r2 AS rx, cy.r2 AS ry FROM d
        JOIN cx ON d.x = cx.v JOIN cy ON d.y = cy.v),
      s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(CAST(rx AS DECIMAL(19,0))) AS DOUBLE) AS sx,
          CAST(SUM(CAST(ry AS DECIMAL(19,0))) AS DOUBLE) AS sy,
          CAST(SUM(CAST(rx AS DECIMAL(19,0)) * CAST(ry AS DECIMAL(19,0)))
            AS DOUBLE) AS sxy,
          CAST(SUM(CAST(rx AS DECIMAL(19,0)) * CAST(rx AS DECIMAL(19,0)))
            AS DOUBLE) AS sxx,
          CAST(SUM(CAST(ry AS DECIMAL(19,0)) * CAST(ry AS DECIMAL(19,0)))
            AS DOUBLE) AS syy
        FROM j)
      SELECT n, CASE WHEN (CAST(n AS DOUBLE) * sxx - sx * sx) > 0
          AND (CAST(n AS DOUBLE) * syy - sy * sy) > 0
        THEN ROUND((CAST(n AS DOUBLE) * sxy - sx * sy)
          / SQRT((CAST(n AS DOUBLE) * sxx - sx * sx)
               * (CAST(n AS DOUBLE) * syy - sy * sy)), 6) END AS rho
      FROM s"""))

  /** Quantity-weighted median price per return flag
    * (Stats.weightedMedian): the smallest price whose cumulative quantity
    * reaches half the flag's total — exact decimal threshold test, ties
    * collapsed map-side, windows keyed by group. */
  val q195WeightedMedian = QueryDef(
    "q195_weighted_median",
    (s, d) => Stats.weightedMedian(Tables.lineitem(s, d), "l_returnflag",
      col("l_extendedprice"), col("l_quantity")),
    Some("""WITH b AS (SELECT l_returnflag,
          CAST(l_extendedprice AS DOUBLE) AS v,
          CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DECIMAL(28,6)) AS w
        FROM lineitem
        WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
          AND l_quantity > 0
        GROUP BY 1, 2),
      c AS (SELECT l_returnflag, v, w,
          SUM(w) OVER (PARTITION BY l_returnflag ORDER BY v) AS cum,
          SUM(w) OVER (PARTITION BY l_returnflag) AS tot,
          COUNT(*) OVER (PARTITION BY l_returnflag) AS nv FROM b)
      SELECT l_returnflag, CAST(MAX(nv) AS BIGINT) AS n_values,
        CAST(MAX(tot) AS DOUBLE) AS total_weight,
        MIN(v) AS weighted_median
      FROM c WHERE cum * 2 >= tot
      GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Two-regressor OLS of extended price on quantity + discount
    * (Stats.ols2): Cramér on the centered normal equations from nine
    * exact decimal sums — q155's simple regression with a held-fixed
    * confounder. */
  val q199Ols2 = QueryDef(
    "q199_ols2",
    (s, d) => Stats.ols2(Tables.lineitem(s, d),
      col("l_extendedprice"), col("l_quantity"), col("l_discount")),
    Some("""WITH a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(CAST(l_quantity AS DECIMAL(38,8))) AS DOUBLE) AS s1,
          CAST(SUM(CAST(l_discount AS DECIMAL(38,8))) AS DOUBLE) AS s2,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,8))) AS DOUBLE) AS sy,
          CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,8)))
            AS DOUBLE) AS s11,
          CAST(SUM(CAST(l_discount * l_discount AS DECIMAL(38,8)))
            AS DOUBLE) AS s22,
          CAST(SUM(CAST(l_quantity * l_discount AS DECIMAL(38,8)))
            AS DOUBLE) AS s12,
          CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(38,8)))
            AS DOUBLE) AS s1y,
          CAST(SUM(CAST(l_discount * l_extendedprice AS DECIMAL(38,8)))
            AS DOUBLE) AS s2y,
          CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,8)))
            AS DOUBLE) AS syy
        FROM lineitem WHERE l_extendedprice IS NOT NULL
          AND l_quantity IS NOT NULL AND l_discount IS NOT NULL),
      c AS (SELECT n, CAST(n AS DOUBLE) AS nd, s1, s2, sy,
          s11 - s1 * s1 / CAST(n AS DOUBLE) AS c11,
          s22 - s2 * s2 / CAST(n AS DOUBLE) AS c22,
          s12 - s1 * s2 / CAST(n AS DOUBLE) AS c12,
          s1y - s1 * sy / CAST(n AS DOUBLE) AS c1y,
          s2y - s2 * sy / CAST(n AS DOUBLE) AS c2y,
          syy - sy * sy / CAST(n AS DOUBLE) AS cyy FROM a),
      e AS (SELECT n, nd, s1, s2, sy, c11, c22, c12, c1y, c2y, cyy,
          c11 * c22 - c12 * c12 AS det FROM c),
      f AS (SELECT n, nd, s1, s2, sy, c1y, c2y, cyy, det,
          (c22 * c1y - c12 * c2y) / det AS b1,
          (c11 * c2y - c12 * c1y) / det AS b2 FROM e)
      SELECT n,
        CASE WHEN n >= 3 AND det > 0
          THEN ROUND((sy - b1 * s1 - b2 * s2) / nd, 6) END AS b0,
        CASE WHEN n >= 3 AND det > 0 THEN ROUND(b1, 6) END AS b1,
        CASE WHEN n >= 3 AND det > 0 THEN ROUND(b2, 6) END AS b2,
        CASE WHEN n >= 3 AND det > 0 AND cyy > 0
          THEN ROUND((b1 * c1y + b2 * c2y) / cyy, 6) END AS r2
      FROM f"""))

  /** Lorenz concentration deciles of per-user event mass
    * (Stats.lorenzDeciles): the curve behind q167's Gini — cumulative
    * mass share after the smallest d/10 of users. */
  val q200Lorenz = QueryDef(
    "q200_lorenz",
    (s, d) => Stats.lorenzDeciles(Tables.events(s, d), col("user_id")),
    Some("""WITH sizes AS (SELECT user_id AS g, CAST(COUNT(*) AS BIGINT) AS sz
        FROM events WHERE user_id IS NOT NULL GROUP BY 1),
      r AS (SELECT g, sz,
          ROW_NUMBER() OVER (ORDER BY sz, g) AS rn,
          COUNT(*) OVER () AS gtot,
          SUM(sz) OVER () AS mtot,
          SUM(sz) OVER (ORDER BY sz, g
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM sizes)
      SELECT CAST(CEIL(rn * 10 / CAST(gtot AS DOUBLE)) AS INTEGER) AS decile,
        CAST(COUNT(*) AS BIGINT) AS n_groups,
        ROUND(CAST(MAX(rn) AS DOUBLE) / CAST(MAX(gtot) AS DOUBLE), 6)
          AS pop_share,
        ROUND(CAST(MAX(cum) AS DOUBLE) / CAST(MAX(mtot) AS DOUBLE), 6)
          AS mass_share
      FROM r GROUP BY 1 ORDER BY decile"""))

  /** Effective sample size of char-weighted docs per source
    * (Stats.effectiveSampleSize): Kish ESS + design effect — how much
    * signal the weighted mixture REALLY carries per slice. */
  val q201Ess = QueryDef(
    "q201_ess",
    (s, d) => Stats.effectiveSampleSize(Tables.documents(s, d),
        col("source"), col("n_chars"))
      .withColumnRenamed("g", "source"),
    Some("""WITH a AS (SELECT source AS g, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(CAST(n_chars AS DECIMAL(38,8))) AS DOUBLE) AS sw,
          CAST(SUM(CAST(CAST(n_chars AS DOUBLE) * CAST(n_chars AS DOUBLE)
            AS DECIMAL(38,8))) AS DOUBLE) AS sw2
        FROM documents
        WHERE source IS NOT NULL AND n_chars IS NOT NULL AND n_chars > 0
        GROUP BY 1)
      SELECT g AS source, n, ROUND(sw * sw / sw2, 6) AS ess,
        ROUND(CAST(n AS DOUBLE) * sw2 / (sw * sw), 6) AS deff
      FROM a ORDER BY g"""))

  /** A/B two-proportion z-test (Stats.twoProportionZTest): even vs odd
    * users on did-they-purchase — pooled-SE z with integer-exact counts,
    * the experiment readout beside q157's Welch t on means. */
  val q208AbTest = QueryDef(
    "q208_ab_test",
    (s, d) => Stats.twoProportionZTest(
      Tables.events(s, d).groupBy("user_id")
        .agg(max(when(col("event_type") === "purchase", 1).otherwise(0))
          .as("__conv"))
        .select((col("user_id") % 2 === 0).as("side"),
          (col("__conv") === 1).as("conv")),
      col("side"), col("conv")),
    Some("""WITH per AS (SELECT user_id, user_id % 2 = 0 AS side,
          MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) = 1
            AS conv
        FROM events GROUP BY 1),
      a AS (SELECT
          CAST(COUNT(CASE WHEN side THEN 1 END) AS BIGINT) AS n_a,
          CAST(COUNT(CASE WHEN NOT side THEN 1 END) AS BIGINT) AS n_b,
          CAST(COUNT(CASE WHEN side AND conv THEN 1 END) AS BIGINT) AS conv_a,
          CAST(COUNT(CASE WHEN (NOT side) AND conv THEN 1 END) AS BIGINT)
            AS conv_b
        FROM per),
      b AS (SELECT n_a, n_b, conv_a, conv_b,
          CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS pa,
          CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS pb,
          CAST(conv_a + conv_b AS DOUBLE)
            / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) AS pp
        FROM a)
      SELECT n_a, n_b, conv_a, conv_b,
        CASE WHEN n_a > 0 THEN ROUND(pa, 6) END AS p_a,
        CASE WHEN n_b > 0 THEN ROUND(pb, 6) END AS p_b,
        CASE WHEN n_a > 0 AND n_b > 0 AND pp > 0 AND pp < 1
          THEN ROUND((pa - pb) / SQRT(pp * (1.0 - pp)
            * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))), 6)
          END AS z
      FROM b"""))

  /** Week-over-week revenue deltas (TimeSeries.pctChange over the weekly
    * order totals): the dashboard percent-change row, lag over the
    * ≤#weeks report frame. */
  val q209Wow = QueryDef(
    "q209_wow",
    (s, d) => graft.ops.TimeSeries.pctChange(
        Tables.orders(s, d)
          .groupBy(expr("CAST(datediff(o_orderdate, DATE'1970-01-01') DIV 7 AS BIGINT)")
            .as("week"))
          .agg(sum(col("o_totalprice").cast("decimal(28,2)")).cast("double")
            .as("y")),
        col("week"), col("y"))
      .withColumnRenamed("t", "week"),
    Some("""WITH w AS (SELECT
          (CAST(o_orderdate AS DATE) - DATE '1970-01-01') // 7 AS week,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS y
        FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1)
      SELECT week, y, LAG(y) OVER (ORDER BY week) AS prev,
        CASE WHEN LAG(y) OVER (ORDER BY week) IS NOT NULL
            AND LAG(y) OVER (ORDER BY week) <> 0
          THEN ROUND((y - LAG(y) OVER (ORDER BY week))
            / LAG(y) OVER (ORDER BY week), 6) END AS pct_change
      FROM w ORDER BY week"""))

  /** ABC/Pareto classification of parts by revenue (Stats.abcClasses):
    * rank + cumulative revenue share with the 80/95 class cuts compared
    * on the ROUNDED share — engine-stable boundaries. */
  val q210Abc = QueryDef(
    "q210_abc",
    (s, d) => Stats.abcClasses(
        Tables.lineitem(s, d).groupBy(col("l_partkey").as("part"))
          .agg(sum(col("l_extendedprice").cast("decimal(28,2)")).as("rev")),
        col("part"), col("rev"))
      .withColumnRenamed("item", "part"),
    Some("""WITH per AS (SELECT l_partkey AS part,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2)))
            AS DECIMAL(28,6)) AS v
        FROM lineitem WHERE l_partkey IS NOT NULL GROUP BY 1),
      r AS (SELECT part, v,
          ROW_NUMBER() OVER (ORDER BY v DESC, part) AS rank,
          SUM(v) OVER (ORDER BY v DESC, part
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
          SUM(v) OVER () AS tot FROM per)
      SELECT part, CAST(rank AS BIGINT) AS rank,
        ROUND(CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS cum_share,
        CASE WHEN ROUND(CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE), 6) <= 0.8
            THEN 'A'
          WHEN ROUND(CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE), 6) <= 0.95
            THEN 'B' ELSE 'C' END AS abc_class
      FROM r ORDER BY rank"""))

  /** Brown–Forsythe equal-spread test across event types
    * (Stats.brownForsythe): ANOVA on |value − group median| — the robust
    * pre-check that decides whether q183's pooled-variance reading or
    * q157's Welch path is trustworthy. Exact per-group medians (pass 1),
    * then one map-side-combined ANOVA over the broadcast-centered
    * deviations (pass 2). */
  val q219BrownForsythe = QueryDef(
    "q219_brown_forsythe",
    (s, d) => Stats.brownForsythe(Tables.events(s, d),
      col("event_type"), col("value")),
    Some("""WITH base AS (SELECT event_type AS g, CAST(value AS DOUBLE) AS v
          FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL),
      med AS (SELECT g, quantile_cont(v, 0.5) AS med FROM base GROUP BY g),
      dev AS (SELECT b.g, ROUND(ABS(b.v - m.med), 8) AS z
        FROM base b JOIN med m USING (g)),
      per AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(CAST(z AS DECIMAL(28,8))) AS DOUBLE) AS s,
          CAST(SUM(CAST(z * z AS DECIMAL(38,8))) AS DOUBLE) AS s2
        FROM dev GROUP BY 1),
      roll AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
          CAST(SUM(n) AS BIGINT) AS n,
          CAST(SUM(CAST(s AS DECIMAL(38,8))) AS DOUBLE) AS ts,
          CAST(SUM(CAST(s2 AS DECIMAL(38,8))) AS DOUBLE) AS ts2,
          CAST(SUM(CAST(ROUND(s * s / CAST(n AS DOUBLE), 8)
            AS DECIMAL(38,8))) AS DOUBLE) AS a
        FROM per),
      dd AS (SELECT k, n, CAST(n AS DOUBLE) AS nd, CAST(k AS DOUBLE) AS kd,
          a - ts * ts / CAST(n AS DOUBLE) AS ssb,
          ts2 - a AS ssw,
          ts2 - ts * ts / CAST(n AS DOUBLE) AS sst FROM roll)
      SELECT k, n, ROUND(ssb, 6) AS ss_between, ROUND(ssw, 6) AS ss_within,
        CASE WHEN k >= 2 AND n > k AND ssw > 0
          THEN ROUND((ssb / (kd - 1)) / (ssw / (nd - kd)), 6) END AS f_stat,
        CASE WHEN sst > 0 THEN ROUND(ssb / sst, 6) END AS eta2
      FROM dd"""))

  /** Segment drift sweep with FDR control: per (event_type, user-id
    * quartile-segment) a two-proportion z-test of early-half vs late-half
    * conversion (value > 50), the z mapped to a two-sided normal p by the
    * shared A&S erf closed form, then Benjamini–Hochberg adjusted across
    * the 20-hypothesis family (Stats.twoProportionZByGroup +
    * Stats.normalTwoSidedP + Stats.bhAdjust). The multiple-comparisons
    * discipline a daily segment sweep needs — at 20 segments and α=.05,
    * one raw-p "hit" is expected under the null. One data pass; every
    * window runs over the 20-row family frame. */
  val q217BhFdr = QueryDef(
    "q217_bh_fdr",
    (s, d) => {
      val ev = Tables.events(s, d)
      val mid = ev.agg(
        expr("(min(unix_micros(ts)) + max(unix_micros(ts))) DIV 2")
          .as("__mid"))
      val tagged = ev.crossJoin(broadcast(mid))
        .withColumn("seg", col("user_id") % 4)
      val fam = Stats.twoProportionZByGroup(tagged, Seq("event_type", "seg"),
        expr("unix_micros(ts)") < col("__mid"), col("value") > 50.0)
      Stats.bhAdjust(fam.withColumn("__p", Stats.normalTwoSidedP(col("z"))),
        Seq("event_type", "seg"), col("__p"), alpha = 0.05)
    },
    Some("""WITH m AS (SELECT (MIN(epoch_us(ts)) + MAX(epoch_us(ts))) // 2
          AS mid FROM events),
      t AS (SELECT event_type, user_id % 4 AS seg,
          epoch_us(ts) < (SELECT mid FROM m) AS side,
          value > 50.0 AS conv FROM events
        WHERE ts IS NOT NULL AND value IS NOT NULL),
      g AS (SELECT event_type, seg,
          COUNT(*) FILTER (side) AS n_a,
          COUNT(*) FILTER (NOT side) AS n_b,
          COUNT(*) FILTER (side AND conv) AS conv_a,
          COUNT(*) FILTER (NOT side AND conv) AS conv_b
        FROM t GROUP BY 1, 2),
      z AS (SELECT event_type, seg,
          CASE WHEN n_a > 0 AND n_b > 0 AND (conv_a + conv_b) > 0
              AND (conv_a + conv_b) < (n_a + n_b)
            THEN (CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)
              / SQRT((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                * (1.0 / n_a + 1.0 / n_b)) END AS z
        FROM g),
      p AS (SELECT event_type, seg,
          ((((1.061405429 * tt - 1.453152027) * tt + 1.421413741) * tt
            - 0.284496736) * tt + 0.254829592) * tt * EXP(-x * x) AS p
        FROM (SELECT event_type, seg, x, 1.0 / (1.0 + 0.3275911 * x) AS tt
          FROM (SELECT event_type, seg, ABS(z) / SQRT(2.0) AS x FROM z
            WHERE z IS NOT NULL))),
      r AS (SELECT event_type, seg, p,
          ROW_NUMBER() OVER (ORDER BY p, event_type, seg) AS rank,
          COUNT(*) OVER () AS fm FROM p),
      a AS (SELECT event_type, seg, p, rank,
          MIN(p * fm / rank) OVER (ORDER BY rank DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS adj
        FROM r)
      SELECT event_type, CAST(seg AS BIGINT) AS seg, ROUND(p, 6) AS p_raw,
        CAST(rank AS BIGINT) AS rank,
        ROUND(LEAST(adj, 1.0), 6) AS p_bh,
        ROUND(LEAST(adj, 1.0), 6) <= 0.05 AS reject
      FROM a ORDER BY rank"""))

  /** WoE/IV scorecard binning of order value vs the finished-order label
    * (Stats.woeIv): exact-decile cuts (edges broadcast back — no ntile
    * funnel), per-bin weight of evidence and the information-value total.
    * The credit-scorecard "does this feature separate the label" card. */
  val q225WoeIv = QueryDef(
    "q225_woe_iv",
    (s, d) => Stats.woeIv(Tables.orders(s, d),
      col("o_totalprice"), col("o_orderstatus") === "F"),
    Some("""WITH base AS (SELECT CAST(o_totalprice AS DOUBLE) AS v,
          o_orderstatus = 'F' AS y
        FROM orders
        WHERE o_totalprice IS NOT NULL AND o_orderstatus IS NOT NULL),
      ed AS (SELECT ROUND(unnest(quantile_cont(v,
          [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9])), 6) AS e
        FROM base),
      binned AS (SELECT v, y,
          (SELECT CAST(COUNT(*) AS BIGINT) FROM ed WHERE v > e) AS bin
        FROM base),
      per AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(COUNT(*) FILTER (y) AS BIGINT) AS n_bad,
          CAST(COUNT(*) FILTER (NOT y) AS BIGINT) AS n_good
        FROM binned GROUP BY bin),
      t AS (SELECT bin, n, n_bad, n_good,
          CAST(SUM(n_bad) OVER () AS BIGINT) AS tb,
          CAST(SUM(n_good) OVER () AS BIGINT) AS tg FROM per),
      w AS (SELECT bin, n, n_bad, n_good,
          CAST(n_bad AS DOUBLE) / CAST(tb AS DOUBLE) AS bs,
          CAST(n_good AS DOUBLE) / CAST(tg AS DOUBLE) AS gs,
          CASE WHEN n_bad > 0 AND n_good > 0 THEN
            ROUND(LN((CAST(n_bad AS DOUBLE) / CAST(tb AS DOUBLE))
              / (CAST(n_good AS DOUBLE) / CAST(tg AS DOUBLE))), 6)
          END AS woe FROM t),
      iv AS (SELECT bin, n, n_bad, n_good,
          ROUND(bs, 6) AS bad_share, ROUND(gs, 6) AS good_share, woe,
          CASE WHEN woe IS NOT NULL
            THEN ROUND((bs - gs) * woe, 6) END AS iv_term FROM w)
      SELECT bin, n, n_bad, n_good, bad_share, good_share, woe, iv_term,
        ROUND(CAST(SUM(CAST(iv_term AS DECIMAL(28,6))) OVER ()
          AS DOUBLE), 6) AS iv_total
      FROM iv ORDER BY bin"""))

  /** Partial correlation of quantity and extended price controlling for
    * discount (Stats.partialCorrelation): the confounder-removed
    * association check beside q09's raw correlation matrix. One
    * map-side-combined pass collects all ten decimal moments. */
  val q230PartialCorr = QueryDef(
    "q230_partial_corr",
    (s, d) => Stats.partialCorrelation(Tables.lineitem(s, d),
      col("l_quantity"), col("l_extendedprice"), col("l_discount")),
    Some("""WITH b AS (SELECT CAST(l_quantity AS DOUBLE) AS x,
          CAST(l_extendedprice AS DOUBLE) AS y,
          CAST(l_discount AS DOUBLE) AS z
        FROM lineitem WHERE l_quantity IS NOT NULL
          AND l_extendedprice IS NOT NULL AND l_discount IS NOT NULL),
      m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(CAST(x AS DECIMAL(38,8))) AS DOUBLE) AS sx,
          CAST(SUM(CAST(y AS DECIMAL(38,8))) AS DOUBLE) AS sy,
          CAST(SUM(CAST(z AS DECIMAL(38,8))) AS DOUBLE) AS sz,
          CAST(SUM(CAST(x * x AS DECIMAL(38,8))) AS DOUBLE) AS sxx,
          CAST(SUM(CAST(y * y AS DECIMAL(38,8))) AS DOUBLE) AS syy,
          CAST(SUM(CAST(z * z AS DECIMAL(38,8))) AS DOUBLE) AS szz,
          CAST(SUM(CAST(x * y AS DECIMAL(38,8))) AS DOUBLE) AS sxy,
          CAST(SUM(CAST(x * z AS DECIMAL(38,8))) AS DOUBLE) AS sxz,
          CAST(SUM(CAST(y * z AS DECIMAL(38,8))) AS DOUBLE) AS syz
        FROM b),
      r AS (SELECT n, CAST(n AS DOUBLE) AS nd, sx, sy, sz,
          CAST(n AS DOUBLE) * sxx - sx * sx AS vx,
          CAST(n AS DOUBLE) * syy - sy * sy AS vy,
          CAST(n AS DOUBLE) * szz - sz * sz AS vz,
          sxy, sxz, syz FROM m),
      c AS (SELECT n, vx, vy, vz,
          (nd * sxy - sx * sy) / SQRT(vx * vy) AS rxy,
          (nd * sxz - sx * sz) / SQRT(vx * vz) AS rxz,
          (nd * syz - sy * sz) / SQRT(vy * vz) AS ryz
        FROM r)
      SELECT n,
        CASE WHEN vx > 0 AND vy > 0 AND vz > 0 THEN ROUND(rxy, 6) END
          AS r_xy,
        CASE WHEN vx > 0 AND vy > 0 AND vz > 0 THEN ROUND(rxz, 6) END
          AS r_xz,
        CASE WHEN vx > 0 AND vy > 0 AND vz > 0 THEN ROUND(ryz, 6) END
          AS r_yz,
        CASE WHEN vx > 0 AND vy > 0 AND vz > 0
            AND SQRT((1.0 - rxz * rxz) * (1.0 - ryz * ryz)) > 0
          THEN ROUND((rxy - rxz * ryz)
            / SQRT((1.0 - rxz * rxz) * (1.0 - ryz * ryz)), 6)
        END AS partial_r
      FROM c"""))

  /** Deterministic Poisson-bootstrap CI of the A/B uplift in event value
    * (Stats.bootstrapUpliftCI, even vs odd user ids): the ±what beside
    * q208's is-it-nonzero. Same md5-multiplicity replay contract as
    * q180. */
  val q232BootstrapUplift = QueryDef(
    "q232_bootstrap_uplift",
    (s, d) => Stats.bootstrapUpliftCI(Tables.events(s, d), "event_id",
      col("user_id") % 2 === 0, col("value")),
    Some("""WITH st AS (SELECT t.b AS b, user_id % 2 = 0 AS side,
          CAST(value AS DOUBLE) AS x,
          (CAST(('0x' || substr(md5('42' || '|' || CAST(t.b AS VARCHAR)
              || '|' || CAST(event_id AS VARCHAR)), 1, 15)) AS BIGINT)
            + 1.0) / 1152921504606846976.0 AS u
        FROM events, range(40) t(b)
        WHERE value IS NOT NULL AND user_id IS NOT NULL),
      ww AS (SELECT b, side, x, CASE
          WHEN u < 0.36787944117144233 THEN 0
          WHEN u < 0.7357588823428847 THEN 1
          WHEN u < 0.9196986029286058 THEN 2
          WHEN u < 0.9810118431238462 THEN 3
          ELSE 4 END AS w FROM st),
      ups AS (SELECT b,
          CAST(SUM(CAST(CASE WHEN side THEN w * x END AS DECIMAL(38,8)))
            AS DOUBLE) / CAST(SUM(CASE WHEN side THEN w END) AS DOUBLE)
          - CAST(SUM(CAST(CASE WHEN NOT side THEN w * x END
              AS DECIMAL(38,8))) AS DOUBLE)
            / CAST(SUM(CASE WHEN NOT side THEN w END) AS DOUBLE) AS u
        FROM ww GROUP BY b
        HAVING SUM(CASE WHEN side THEN w END) > 0
          AND SUM(CASE WHEN NOT side THEN w END) > 0),
      stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS bn,
          CAST(SUM(CAST(u AS DECIMAL(28,10))) AS DOUBLE) AS su,
          CAST(SUM(CAST(u * u AS DECIMAL(38,10))) AS DOUBLE) AS su2,
          ROUND(quantile_cont(u, 0.05), 6) AS ci_lo,
          ROUND(quantile_cont(u, 0.95), 6) AS ci_hi
        FROM ups),
      fl AS (SELECT
          CAST(COUNT(*) FILTER (user_id % 2 = 0) AS BIGINT) AS n_a,
          CAST(COUNT(*) FILTER (user_id % 2 != 0) AS BIGINT) AS n_b,
          CAST(SUM(CAST(value AS DECIMAL(28,8)))
              FILTER (user_id % 2 = 0) AS DOUBLE)
            / CAST(COUNT(*) FILTER (user_id % 2 = 0) AS DOUBLE) AS ma,
          CAST(SUM(CAST(value AS DECIMAL(28,8)))
              FILTER (user_id % 2 != 0) AS DOUBLE)
            / CAST(COUNT(*) FILTER (user_id % 2 != 0) AS DOUBLE) AS mb
        FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL)
      SELECT n_a, n_b, ROUND(ma, 6) AS mean_a, ROUND(mb, 6) AS mean_b,
        ROUND(ma - mb, 6) AS uplift,
        CASE WHEN bn >= 2 THEN ROUND(SQRT(
          (su2 - su * su / CAST(bn AS DOUBLE)) / (CAST(bn AS DOUBLE) - 1)),
          6) END AS se,
        ci_lo, ci_hi
      FROM fl, stats"""))

  /** Wald SPRT early-stopping walk over daily conversion (value > 50) —
    * H1: p = 0.52 vs H0: p = 0.48, α = β = 0.05 (Stats.sprt): cumulative
    * integer counts, engine-computed log constants, per-day decision. */
  val q233Sprt = QueryDef(
    "q233_sprt",
    (s, d) => Stats.sprt(
      Tables.events(s, d)
        .groupBy(expr("unix_micros(ts) DIV 86400000000").as("day"))
        .agg(count(when(col("value") > 50.0, 1)).as("x"),
          count(lit(1)).as("n")),
      col("day"), col("x"), col("n"), p0 = 0.48, p1 = 0.52),
    Some("""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS t,
          CAST(COUNT(*) FILTER (value > 50.0) AS BIGINT) AS x,
          CAST(COUNT(*) AS BIGINT) AS n
        FROM events WHERE ts IS NOT NULL GROUP BY 1),
      c AS (SELECT t,
          CAST(SUM(x) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
            AND CURRENT ROW) AS BIGINT) AS x_cum,
          CAST(SUM(n) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
            AND CURRENT ROW) AS BIGINT) AS n_cum FROM daily),
      l AS (SELECT t, n_cum, x_cum,
          ROUND(CAST(x_cum AS DOUBLE) * LN(0.52 / 0.48)
            + CAST(n_cum - x_cum AS DOUBLE)
              * LN((1.0 - 0.52) / (1.0 - 0.48)), 6) AS llr FROM c)
      SELECT t, n_cum, x_cum, llr,
        CASE WHEN llr >= ROUND(LN((1.0 - 0.05) / 0.05), 6) THEN 'accept_h1'
          WHEN llr <= ROUND(LN(0.05 / (1.0 - 0.05)), 6) THEN 'accept_h0'
          ELSE 'continue' END AS decision
      FROM l ORDER BY t"""))

  /** Precision/recall/hit/AP@10 on the q163 stand-in qrels
    * (RankEval.precisionRecallAtK): the set-based retrieval eval beside
    * the graded nDCG pair — trec_eval AP convention. */
  val q234PrecisionRecall = QueryDef(
    "q234_precision_recall",
    (s, d) => RankEval.precisionRecallAtK(Tables.documents(s, d), "source",
      scoreCol = col("n_chars"),
      relCol = when(col("lang") === "en", 1.0).otherwise(0.0),
      tieCol = col("doc_id"), k = 10),
    Some("""WITH ranked AS (SELECT source, doc_id,
          CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS rel,
          ROW_NUMBER() OVER (PARTITION BY source
            ORDER BY n_chars DESC, doc_id ASC) AS rank
        FROM documents),
      tot AS (SELECT source, CAST(SUM(rel) AS BIGINT) AS n_rel_total
        FROM ranked GROUP BY source),
      topk AS (SELECT source, rel, rank,
          SUM(rel) OVER (PARTITION BY source ORDER BY rank
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM ranked WHERE rank <= 10),
      agg AS (SELECT source, CAST(SUM(rel) AS BIGINT) AS n_rel_at_k,
          CAST(SUM(CASE WHEN rel = 1 THEN
            CAST(CAST(cum AS DOUBLE) / CAST(rank AS DOUBLE)
              AS DECIMAL(28,10)) END) AS DOUBLE) AS apsum
        FROM topk GROUP BY source)
      SELECT a.source, n_rel_total, n_rel_at_k,
        ROUND(CAST(n_rel_at_k AS DOUBLE) / 10.0, 6) AS precision_at_k,
        CASE WHEN n_rel_total > 0
          THEN ROUND(CAST(n_rel_at_k AS DOUBLE)
            / CAST(n_rel_total AS DOUBLE), 6) ELSE 0.0 END AS recall_at_k,
        n_rel_at_k > 0 AS hit_at_k,
        CASE WHEN LEAST(n_rel_total, 10) > 0
          THEN COALESCE(
            ROUND(apsum / CAST(LEAST(n_rel_total, 10) AS DOUBLE), 6), 0.0)
          ELSE 0.0 END AS ap_at_k
      FROM agg a JOIN tot USING (source) ORDER BY a.source"""))

  /** Cumulative gains / lift chart of the q163 stand-in scorer: exact
    * decile cuts of the score (edge row broadcast — no ntile global
    * sort), bands ranked from the top, cumulative capture rate and lift
    * per band — "the top 20% of scores captures X% of positives", the
    * model-targeting readout beside q168's calibration. Windows run over
    * the ≤10-row band frame. */
  val q240GainsChart = QueryDef(
    "q240_gains_chart",
    (s, d) => {
      val docs = Tables.documents(s, d)
        .filter(col("n_chars").isNotNull && col("lang").isNotNull)
        .select(col("n_chars").cast("double").as("v"),
          (col("lang") === "en").as("y"))
      val qs = (1 until 10).map(_.toDouble / 10)
      val edges = docs.agg(
        transform(percentile(col("v"), typedlit(qs)), e => round(e, 6))
          .as("__edges"))
      val per = docs.crossJoin(broadcast(edges))
        .withColumn("bin",
          size(filter(col("__edges"), e => col("v") > e)).cast("bigint"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n"), count(when(col("y"), 1)).as("n_pos"))
        .withColumn("band", lit(10L) - col("bin"))
      val all = Window.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      val cum = Window.orderBy("band")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      def nzd(c: Column) = when(c =!= 0.0, c)
      val tn = sum(col("n")).over(all).cast("double")
      val tp = sum(col("n_pos")).over(all).cast("double")
      per
        .withColumn("cum_n", sum(col("n")).over(cum))
        .withColumn("cum_pos", sum(col("n_pos")).over(cum))
        .withColumn("gain",
          round(col("cum_pos").cast("double") / nzd(tp), 6))
        .withColumn("lift", round(
          (col("cum_pos").cast("double") / nzd(col("cum_n").cast("double")))
            / nzd(tp / nzd(tn)), 6))
        .select("band", "n", "n_pos", "cum_n", "cum_pos", "gain", "lift")
        .orderBy("band")
    },
    Some("""WITH base AS (SELECT CAST(n_chars AS DOUBLE) AS v,
          lang = 'en' AS y FROM documents
        WHERE n_chars IS NOT NULL AND lang IS NOT NULL),
      ed AS (SELECT ROUND(unnest(quantile_cont(v,
          [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9])), 6) AS e
        FROM base),
      binned AS (SELECT v, y,
          (SELECT CAST(COUNT(*) AS BIGINT) FROM ed WHERE v > e) AS bin
        FROM base),
      per AS (SELECT 10 - bin AS band, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(COUNT(*) FILTER (y) AS BIGINT) AS n_pos
        FROM binned GROUP BY bin),
      c AS (SELECT band, n, n_pos,
          CAST(SUM(n) OVER (ORDER BY band ROWS BETWEEN UNBOUNDED
            PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_n,
          CAST(SUM(n_pos) OVER (ORDER BY band ROWS BETWEEN UNBOUNDED
            PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_pos,
          CAST(SUM(n) OVER () AS BIGINT) AS tn,
          CAST(SUM(n_pos) OVER () AS BIGINT) AS tp
        FROM per)
      SELECT band, n, n_pos, cum_n, cum_pos,
        ROUND(CAST(cum_pos AS DOUBLE) / CAST(tp AS DOUBLE), 6) AS gain,
        ROUND((CAST(cum_pos AS DOUBLE) / CAST(cum_n AS DOUBLE))
          / (CAST(tp AS DOUBLE) / CAST(tn AS DOUBLE)), 6) AS lift
      FROM c ORDER BY band"""))

  /** Chi-square follow-up: the densified priority × status contingency
    * grid with expected counts and Pearson standardized residuals
    * (o − e)/√e — WHICH cells drove q156-style significance (|r| > 2 is
    * the usual call-out). One data pass to the observed cells; the dense
    * grid is marginal × marginal on report-sized frames; integer counts,
    * round-6 ratio math. */
  val q252CellResiduals = QueryDef(
    "q252_cell_residuals",
    (s, d) => {
      def nzd(c: Column) = when(c =!= 0.0, c)
      val base = Tables.orders(s, d)
        .filter(col("o_orderpriority").isNotNull &&
          col("o_orderstatus").isNotNull)
      val obs = base.groupBy(col("o_orderpriority").as("prio"),
        col("o_orderstatus").as("status")).agg(count(lit(1)).as("o"))
      val ma = base.groupBy(col("o_orderpriority").as("prio"))
        .agg(count(lit(1)).as("na"))
      val mb = base.groupBy(col("o_orderstatus").as("status"))
        .agg(count(lit(1)).as("nb"))
      val n = base.agg(count(lit(1)).as("__n"))
      broadcast(ma).crossJoin(broadcast(mb))
        .crossJoin(broadcast(n))
        .join(obs, Seq("prio", "status"), "left")
        .withColumn("o", coalesce(col("o"), lit(0L)))
        .withColumn("e", round(col("na").cast("double")
          * col("nb").cast("double") / col("__n").cast("double"), 6))
        .withColumn("residual", when(col("e") > 0,
          round((col("o").cast("double") - col("e")) / nzd(sqrt(col("e"))),
            6)))
        .select("prio", "status", "o", "e", "residual")
        .orderBy("prio", "status")
    },
    Some("""WITH base AS (SELECT o_orderpriority AS prio,
          o_orderstatus AS status FROM orders
        WHERE o_orderpriority IS NOT NULL AND o_orderstatus IS NOT NULL),
      obs AS (SELECT prio, status, CAST(COUNT(*) AS BIGINT) AS o
        FROM base GROUP BY 1, 2),
      ma AS (SELECT prio, CAST(COUNT(*) AS BIGINT) AS na FROM base
        GROUP BY prio),
      mb AS (SELECT status, CAST(COUNT(*) AS BIGINT) AS nb FROM base
        GROUP BY status),
      nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM base),
      grid AS (SELECT prio, status, na, nb FROM ma, mb)
      SELECT g.prio, g.status, COALESCE(o, 0) AS o,
        ROUND(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)
          / CAST((SELECT n FROM nn) AS DOUBLE), 6) AS e,
        CASE WHEN ROUND(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)
            / CAST((SELECT n FROM nn) AS DOUBLE), 6) > 0
          THEN ROUND((CAST(COALESCE(o, 0) AS DOUBLE)
            - ROUND(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)
              / CAST((SELECT n FROM nn) AS DOUBLE), 6))
            / SQRT(ROUND(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)
              / CAST((SELECT n FROM nn) AS DOUBLE), 6)), 6) END AS residual
      FROM grid g LEFT JOIN obs ON g.prio = obs.prio
        AND g.status = obs.status
      ORDER BY g.prio, g.status"""))

  /** Cohen's d + Hedges' g per event type between the stream's early and
    * late halves (Stats.cohensDByGroup): the effect-SIZE readout beside
    * q208's significance z — did value actually shift, and by how many
    * pooled SDs. One keyed decimal-moment aggregation. */
  val q255CohensD = QueryDef(
    "q255_cohens_d",
    (s, d) => {
      val ev = Tables.events(s, d)
      val mid = ev.agg(
        expr("(min(unix_micros(ts)) + max(unix_micros(ts))) DIV 2")
          .as("__mid"))
      Stats.cohensDByGroup(
        ev.filter(col("ts").isNotNull).crossJoin(broadcast(mid)),
        "event_type", expr("unix_micros(ts)") < col("__mid"), col("value"))
    },
    Some("""WITH m AS (SELECT (MIN(epoch_us(ts)) + MAX(epoch_us(ts))) // 2
          AS mid FROM events),
      t AS (SELECT event_type AS gg,
          epoch_us(ts) < (SELECT mid FROM m) AS side,
          CAST(value AS DOUBLE) AS v
        FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
          AND value IS NOT NULL),
      a AS (SELECT gg,
          CAST(COUNT(*) FILTER (side) AS BIGINT) AS n_a,
          CAST(COUNT(*) FILTER (NOT side) AS BIGINT) AS n_b,
          CAST(SUM(CAST(v AS DECIMAL(38,8))) FILTER (side) AS DOUBLE) AS sa,
          CAST(SUM(CAST(v * v AS DECIMAL(38,8))) FILTER (side) AS DOUBLE)
            AS sa2,
          CAST(SUM(CAST(v AS DECIMAL(38,8))) FILTER (NOT side) AS DOUBLE)
            AS sb,
          CAST(SUM(CAST(v * v AS DECIMAL(38,8))) FILTER (NOT side)
            AS DOUBLE) AS sb2
        FROM t GROUP BY 1),
      e AS (SELECT gg, n_a, n_b, CAST(n_a AS DOUBLE) AS na,
          CAST(n_b AS DOUBLE) AS nb, sa / n_a AS ma, sb / n_b AS mb,
          (sa2 - sa * sa / n_a) / (n_a - 1) AS va,
          (sb2 - sb * sb / n_b) / (n_b - 1) AS vb
        FROM a),
      f AS (SELECT gg, n_a, n_b, na, nb, ma, mb,
          SQRT(GREATEST(((na - 1) * va + (nb - 1) * vb) / (na + nb - 2),
            0.0)) AS pooled
        FROM e)
      SELECT gg AS event_type, n_a, n_b,
        CASE WHEN n_a > 0 THEN ROUND(ma, 6) END AS mean_a,
        CASE WHEN n_b > 0 THEN ROUND(mb, 6) END AS mean_b,
        CASE WHEN n_a >= 2 AND n_b >= 2 THEN ROUND(pooled, 6) END
          AS pooled_sd,
        CASE WHEN n_a >= 2 AND n_b >= 2 AND pooled > 0
          THEN ROUND((ma - mb) / pooled, 6) END AS d,
        CASE WHEN n_a >= 2 AND n_b >= 2 AND pooled > 0
          THEN ROUND((ma - mb) / pooled
            * (1.0 - 3.0 / (4.0 * (na + nb) - 9.0)), 6) END AS g
      FROM f ORDER BY event_type"""))

  /** Mix-shift decomposition of mean value between the stream's halves by
    * event type (Stats.mixShiftDecomposition): Δ = mix effect (traffic
    * moved between segments) + rate effect (segments changed) — the
    * post-launch "did the number move or did the mix move?" identity. */
  val q257MixShift = QueryDef(
    "q257_mix_shift",
    (s, d) => {
      val ev = Tables.events(s, d)
      val mid = ev.agg(
        expr("(min(unix_micros(ts)) + max(unix_micros(ts))) DIV 2")
          .as("__mid"))
      Stats.mixShiftDecomposition(
        ev.filter(col("ts").isNotNull).crossJoin(broadcast(mid)),
        "event_type", expr("unix_micros(ts)") < col("__mid"), col("value"))
    },
    Some("""WITH m AS (SELECT (MIN(epoch_us(ts)) + MAX(epoch_us(ts))) // 2
          AS mid FROM events),
      t AS (SELECT event_type AS gg,
          epoch_us(ts) < (SELECT mid FROM m) AS side,
          CAST(value AS DOUBLE) AS v
        FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
          AND value IS NOT NULL),
      per AS (SELECT gg,
          CAST(COUNT(*) FILTER (side) AS BIGINT) AS n_a,
          CAST(COUNT(*) FILTER (NOT side) AS BIGINT) AS n_b,
          CAST(SUM(CAST(v AS DECIMAL(38,8))) FILTER (side) AS DOUBLE) AS sa,
          CAST(SUM(CAST(v AS DECIMAL(38,8))) FILTER (NOT side) AS DOUBLE)
            AS sb
        FROM t GROUP BY 1),
      tot AS (SELECT CAST(SUM(n_a) AS DOUBLE) AS ta,
          CAST(SUM(n_b) AS DOUBLE) AS tb FROM per),
      e AS (SELECT gg, n_a, n_b,
          CAST(n_a AS DOUBLE) / ta AS wa, CAST(n_b AS DOUBLE) / tb AS wb,
          sa / CAST(n_a AS DOUBLE) AS ma, sb / CAST(n_b AS DOUBLE) AS mb
        FROM per, tot)
      SELECT gg AS event_type, n_a, n_b,
        ROUND(wa, 6) AS w_a, ROUND(wb, 6) AS w_b,
        CASE WHEN n_a > 0 THEN ROUND(ma, 6) END AS mean_a,
        CASE WHEN n_b > 0 THEN ROUND(mb, 6) END AS mean_b,
        CASE WHEN n_a > 0 THEN ROUND((wb - wa) * ma, 6) END AS mix_effect,
        CASE WHEN n_a > 0 AND n_b > 0
          THEN ROUND(wb * (mb - ma), 6) END AS rate_effect
      FROM e ORDER BY event_type"""))

  /** CUPED variance reduction on the A/B halves (Stats.cupedAdjustedMeans):
    * value adjusted by the user-bucket covariate, θ from pooled moments —
    * per arm the raw vs adjusted mean/variance and the CI-shrink
    * percentage the experiment readout quotes. */
  val q258Cuped = QueryDef(
    "q258_cuped",
    (s, d) => {
      val ev = Tables.events(s, d)
      val mid = ev.agg(
        expr("(min(unix_micros(ts)) + max(unix_micros(ts))) DIV 2")
          .as("__mid"))
      Stats.cupedAdjustedMeans(
        ev.filter(col("ts").isNotNull).crossJoin(broadcast(mid)),
        expr("unix_micros(ts)") < col("__mid"), col("value"),
        expr("user_id % 100"))
    },
    Some("""WITH m AS (SELECT (MIN(epoch_us(ts)) + MAX(epoch_us(ts))) // 2
          AS mid FROM events),
      t AS (SELECT epoch_us(ts) < (SELECT mid FROM m) AS side,
          CAST(value AS DOUBLE) AS y, CAST(user_id % 100 AS DOUBLE) AS x
        FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
          AND user_id IS NOT NULL),
      p AS (SELECT CAST(COUNT(*) AS BIGINT) AS pn,
          CAST(SUM(CAST(x AS DECIMAL(38,8))) AS DOUBLE) AS px,
          CAST(SUM(CAST(x * x AS DECIMAL(38,8))) AS DOUBLE) AS pxx,
          CAST(SUM(CAST(y AS DECIMAL(38,8))) AS DOUBLE) AS py,
          CAST(SUM(CAST(x * y AS DECIMAL(38,8))) AS DOUBLE) AS pxy
        FROM t),
      s AS (SELECT side, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(CAST(y AS DECIMAL(38,8))) AS DOUBLE) AS sy,
          CAST(SUM(CAST(y * y AS DECIMAL(38,8))) AS DOUBLE) AS syy,
          CAST(SUM(CAST(x AS DECIMAL(38,8))) AS DOUBLE) AS sx,
          CAST(SUM(CAST(x * x AS DECIMAL(38,8))) AS DOUBLE) AS sxx,
          CAST(SUM(CAST(x * y AS DECIMAL(38,8))) AS DOUBLE) AS sxy
        FROM t GROUP BY 1),
      e AS (SELECT side, n, CAST(n AS DOUBLE) AS nd,
          sy / CAST(n AS DOUBLE) AS my, sx / CAST(n AS DOUBLE) AS mx,
          syy / CAST(n AS DOUBLE)
            - (sy / CAST(n AS DOUBLE)) * (sy / CAST(n AS DOUBLE)) AS vy,
          sxx / CAST(n AS DOUBLE)
            - (sx / CAST(n AS DOUBLE)) * (sx / CAST(n AS DOUBLE)) AS vxs,
          sxy / CAST(n AS DOUBLE)
            - (sx / CAST(n AS DOUBLE)) * (sy / CAST(n AS DOUBLE)) AS cs,
          pxx / CAST(pn AS DOUBLE)
            - (px / CAST(pn AS DOUBLE)) * (px / CAST(pn AS DOUBLE)) AS vx,
          pxy / CAST(pn AS DOUBLE)
            - (px / CAST(pn AS DOUBLE)) * (py / CAST(pn AS DOUBLE)) AS cxy,
          px / CAST(pn AS DOUBLE) AS xbar
        FROM s, p),
      f AS (SELECT side, n, my, mx, vy, vxs, cs, vx, xbar,
          cxy / vx AS th FROM e)
      SELECT side, n, ROUND(my, 6) AS mean_raw,
        CASE WHEN vx > 0 THEN ROUND(my - th * (mx - xbar), 6) END
          AS mean_adj,
        CASE WHEN vx > 0 THEN ROUND(th, 6) END AS theta,
        ROUND(vy, 6) AS var_raw,
        CASE WHEN vx > 0
          THEN ROUND(vy + th * th * vxs - 2.0 * th * cs, 6) END AS var_adj,
        CASE WHEN vx > 0 AND vy > 0
          THEN ROUND((vy - (vy + th * th * vxs - 2.0 * th * cs)) / vy
            * 100.0, 6) END AS var_reduction_pct
      FROM f ORDER BY side DESC"""))

  override val defs: Seq[QueryDef] = Seq(
    q155Regression, q156ChiSquare, q157WelchT, q158MadOutliers, q159Benford,
    q160Ewma, q161Markov, q162Compaction, q163Ndcg, q164NdcgGlobal,
    q166CohenKappa, q167GiniUsers, q168Calibration, q169Auc, q170ZipfSlope,
    q174MutualInfo, q177TrimmedMean, q179QuantileNorm, q180BootstrapCI,
    q181InfoGainSweep, q183Anova, q184CramersV, q185Acf, q187KaplanMeier,
    q190Spearman, q195WeightedMedian, q199Ols2, q200Lorenz, q201Ess,
    q208AbTest, q209Wow, q210Abc, q217BhFdr, q219BrownForsythe, q225WoeIv,
    q230PartialCorr, q232BootstrapUplift, q233Sprt, q234PrecisionRecall,
    q240GainsChart, q252CellResiduals, q255CohensD, q257MixShift,
    q258Cuped)
}
