package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Aggregates, Filters, MissingData}
import graft.enrich.Province

/** Aggregation / filter / scalar-function queries covering SURVEY §2.2, §2.4
  * (A1-A13, P1-P9, F15). Each query is small-output and deterministic so the
  * driver's DuckDB hash-compare is stable.
  */
object CoreQueries extends QueryGroup {

  import Aggregates.{decAvg, decSum}

  /** A3-flavored pricing summary (groupBy + exact decimal sums). */
  val q01PricingSummary = QueryDef(
    "q01_pricing_summary",
    (s, d) => {
      val li = Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(
          decSum(col("l_quantity")).as("sum_qty"),
          decSum(col("l_extendedprice")).as("sum_base_price"),
          sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(28,6)"))
            .cast("double").as("sum_disc_price"),
          decAvg(col("l_quantity")).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    Some("""SELECT l_returnflag, l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS sum_base_price,
      CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS sum_disc_price,
      CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
      COUNT(*) AS count_order
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""))

  /** A1: per-column null fraction, single pass (nulls synthesized via NULLIF
    * since the test tables are fully populated). */
  val q02NullFractions = QueryDef(
    "q02_null_fractions",
    (s, d) => {
      val li = Tables.lineitem(s, d)
        .withColumn("rf_n", expr("nullif(l_returnflag, 'N')"))
        .withColumn("ls_o", expr("nullif(l_linestatus, 'O')"))
      MissingData.nullFractions(li, Seq("rf_n", "ls_o"))
    },
    Some("""SELECT
      AVG(CASE WHEN NULLIF(l_returnflag, 'N') IS NULL THEN 1.0 ELSE 0.0 END) AS rf_n,
      AVG(CASE WHEN NULLIF(l_linestatus, 'O') IS NULL THEN 1.0 ELSE 0.0 END) AS ls_o
      FROM lineitem"""))

  /** A3/A4: value_counts with normalized percentage. */
  val q03ValueCountsPct = QueryDef(
    "q03_value_counts_pct",
    (s, d) => Aggregates.valueCounts(Tables.orders(s, d), "o_orderpriority"),
    Some("""SELECT o_orderpriority, COUNT(*) AS cnt,
      CAST(COUNT(*) AS DOUBLE) / CAST(SUM(COUNT(*)) OVER () AS DOUBLE) AS pct
      FROM orders GROUP BY o_orderpriority ORDER BY cnt DESC, o_orderpriority"""))

  /** A5: mode with the pandas smallest-value tie-break. */
  val q04ModeQty = QueryDef(
    "q04_mode_qty",
    (s, d) => Aggregates.modeSmallest(Tables.lineitem(s, d), "l_quantity"),
    Some("""SELECT l_quantity FROM (
      SELECT l_quantity, COUNT(*) AS c FROM lineitem WHERE l_quantity IS NOT NULL
      GROUP BY l_quantity ORDER BY c DESC, l_quantity ASC LIMIT 1)"""))

  /** A6/A7: exact percentiles (linear interpolation = DuckDB quantile_cont).
    * ONE array-argument percentile aggregate (r15): five scalar percentile
    * calls each built their own full value→count ObjectHashAggregate buffer
    * over every row — 5× the buffer inserts and 5× the per-partition merge
    * for one pass's worth of information. The array form keeps a single
    * buffer and interpolates all five points from it; Spark's Percentile
    * evaluates each probability with the identical math, so the output is
    * bit-identical (oracle unchanged). */
  val q05Quantiles = QueryDef(
    "q05_quantiles_price",
    (s, d) => Tables.orders(s, d)
      .agg(percentile(col("o_totalprice"),
        array(lit(0.01), lit(0.25), lit(0.50), lit(0.75), lit(0.99))).as("__q"))
      .select(
        round(element_at(col("__q"), 1), 6).as("p01"),
        round(element_at(col("__q"), 2), 6).as("p25"),
        round(element_at(col("__q"), 3), 6).as("p50"),
        round(element_at(col("__q"), 4), 6).as("p75"),
        round(element_at(col("__q"), 5), 6).as("p99")),
    Some("""SELECT
      ROUND(quantile_cont(o_totalprice, 0.01), 6) AS p01,
      ROUND(quantile_cont(o_totalprice, 0.25), 6) AS p25,
      ROUND(quantile_cont(o_totalprice, 0.50), 6) AS p50,
      ROUND(quantile_cont(o_totalprice, 0.75), 6) AS p75,
      ROUND(quantile_cont(o_totalprice, 0.99), 6) AS p99
      FROM orders"""))

  /** A10: IQR outlier count (two-pass: quantile bounds → filter count). */
  val q06IqrOutliers = QueryDef(
    "q06_iqr_outlier_count",
    (s, d) => {
      val o = Tables.orders(s, d)
      val (lb, ub) = Aggregates.iqrBounds(o, "o_totalprice")
      o.filter(col("o_totalprice") < lb || col("o_totalprice") > ub)
        .agg(count(lit(1)).as("cnt"))
    },
    Some("""WITH b AS (SELECT quantile_cont(o_totalprice, 0.25) AS q1,
                              quantile_cont(o_totalprice, 0.75) AS q3 FROM orders)
      SELECT COUNT(*) AS cnt FROM orders, b
      WHERE o_totalprice < q1 - 1.5 * (q3 - q1) OR o_totalprice > q3 + 1.5 * (q3 - q1)"""))

  /** A11: exact distinct counts (gates schema decisions — never approx). */
  val q07DistinctCounts = QueryDef(
    "q07_distinct_counts",
    (s, d) => Tables.lineitem(s, d).agg(
      countDistinct(col("l_partkey")).as("n_parts"),
      countDistinct(col("l_suppkey")).as("n_supps"),
      countDistinct(concat_ws("#", col("l_returnflag"), col("l_linestatus"))).as("n_flag_status")),
    // concat_ws (both engines) SKIPS nulls rather than nulling the result,
    // so an all-null (flag, status) pair counts as the '' combo in both —
    // a `||` oracle would silently drop null pairs from the distinct count
    Some("""SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
      CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
      CAST(COUNT(DISTINCT concat_ws('#', l_returnflag, l_linestatus)) AS BIGINT) AS n_flag_status
      FROM lineitem"""))

  /** A12: target (mean) encoding learn step — groupBy(cat).avg(target). */
  val q08TargetEncoding = QueryDef(
    "q08_target_encoding",
    (s, d) => Tables.customer(s, d)
      .groupBy("c_mktsegment")
      .agg(decAvg(col("c_acctbal")).as("enc"), count(lit(1)).as("n"))
      .orderBy("c_mktsegment"),
    Some("""SELECT c_mktsegment,
      CAST(SUM(CAST(c_acctbal AS DECIMAL(28,2))) AS DOUBLE) / COUNT(c_acctbal) AS enc,
      COUNT(*) AS n
      FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment NULLS FIRST"""))

  /** A13: Pearson correlation (rounded — moment stats are order-sensitive). */
  val q09Corr = QueryDef(
    "q09_corr",
    (s, d) => Tables.lineitem(s, d).agg(
      round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qty_price"),
      round(corr(col("l_discount"), col("l_tax")), 6).as("corr_disc_tax")),
    Some("""SELECT ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
      ROUND(corr(l_discount, l_tax), 6) AS corr_disc_tax FROM lineitem"""))

  /** P1: substring predicate filter + count by group. */
  val q11SubstringFilter = QueryDef(
    "q11_substring_filter",
    (s, d) => Tables.part(s, d)
      .filter(col("p_name").contains("bolt") &&
        (col("p_type").contains("SMALL") || col("p_type").contains("ECONOMY")))
      .groupBy("p_brand").agg(count(lit(1)).as("cnt"))
      .orderBy("p_brand"),
    Some("""SELECT p_brand, COUNT(*) AS cnt FROM part
      WHERE p_name LIKE '%bolt%' AND (p_type LIKE '%SMALL%' OR p_type LIKE '%ECONOMY%')
      GROUP BY p_brand ORDER BY p_brand"""))

  /** P3: the pandas `!= True` null-KEEPING filter (null-safe <=>). */
  val q12NullSafeFilter = QueryDef(
    "q12_nullsafe_filter",
    (s, d) => Tables.lineitem(s, d)
      .withColumn("flag",
        when(col("l_discount") > 0.06, lit(null).cast("boolean"))
          .otherwise(col("l_quantity") > 25))
      .filter(Filters.notTrueKeepingNulls(col("flag")))
      .groupBy("l_returnflag").agg(count(lit(1)).as("cnt"))
      .orderBy("l_returnflag"),
    Some("""SELECT l_returnflag, COUNT(*) AS cnt FROM lineitem
      WHERE (CASE WHEN l_discount > 0.06 THEN NULL ELSE l_quantity > 25 END) IS DISTINCT FROM TRUE
      GROUP BY l_returnflag ORDER BY l_returnflag NULLS FIRST"""))

  /** F15: ordered half-open range map (postal → province), over synthesized
    * postal codes so every range is hit. */
  val q15ProvinceRanges = QueryDef(
    "q15_province_ranges",
    (s, d) => Tables.orders(s, d)
      .withColumn("postal", (lit(1000) + col("o_orderkey") % 9000).cast("int"))
      .withColumn("province", Province.fromPostalCode(col("postal")))
      .groupBy("province").agg(count(lit(1)).as("cnt"))
      .orderBy("province"),
    Some {
      val cases = Province.Ranges
        .map { case (lo, hi, n) => s"WHEN postal >= $lo AND postal < $hi THEN '$n'" }
        .mkString(" ")
      s"""SELECT (CASE $cases ELSE NULL END) AS province, COUNT(*) AS cnt
      FROM (SELECT CAST(1000 + o_orderkey % 9000 AS INT) AS postal FROM orders)
      GROUP BY province ORDER BY province"""
    })

  /** Deequ-style quality gate over lineitem: a 7-check suite (completeness,
    * uniqueness, bounds, pattern, membership) evaluated in ONE aggregate
    * pass — the pre-write audit a production pipeline gates on. The report
    * is ordinary relational output, so the oracle recomputes every metric
    * and pass flag. Includes intentional failures (l_orderkey is NOT
    * unique in lineitem; tax max exceeds the tight bound) so `pass` is
    * exercised in both polarities. */
  val q130QualityGate = QueryDef(
    "q130_quality_gate",
    (s, d) => {
      import graft.ops.Checks
      Checks.run(Tables.lineitem(s, d), Seq(
        Checks.isComplete("l_orderkey"),
        Checks.isComplete("l_shipdate", atLeast = 0.999),
        Checks.isUnique("l_orderkey"),
        Checks.minAtLeast("l_quantity", 1.0),
        Checks.maxAtMost("l_tax", 0.05),
        Checks.matchesPattern("l_returnflag", "^[ANR]$", atLeast = 0.999),
        Checks.isContainedIn("l_linestatus", Seq("F", "O"))))
        .orderBy("check", "column")
    },
    Some("""WITH m AS (SELECT
        ROUND(CAST(COUNT(l_orderkey) AS DOUBLE) / COUNT(*), 6) AS m0,
        ROUND(CAST(COUNT(l_shipdate) AS DOUBLE) / COUNT(*), 6) AS m1,
        ROUND(CAST(COUNT(DISTINCT l_orderkey) AS DOUBLE) / COUNT(l_orderkey), 6) AS m2,
        ROUND(CAST(MIN(l_quantity) AS DOUBLE), 6) AS m3,
        ROUND(CAST(MAX(l_tax) AS DOUBLE), 6) AS m4,
        ROUND(CAST(SUM(CASE WHEN regexp_matches(l_returnflag, '^[ANR]$')
            THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(l_returnflag), 6) AS m5,
        ROUND(CAST(SUM(CASE WHEN l_linestatus IN ('F','O')
            THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(l_linestatus), 6) AS m6
      FROM lineitem)
      SELECT "check", "column", metric, threshold, pass FROM (
        SELECT 'completeness' AS "check", 'l_orderkey' AS "column",
          m0 AS metric, CAST(1.0 AS DOUBLE) AS threshold, m0 >= 1.0 AS pass FROM m
        UNION ALL SELECT 'completeness', 'l_shipdate', m1, CAST(0.999 AS DOUBLE), m1 >= 0.999 FROM m
        UNION ALL SELECT 'uniqueness', 'l_orderkey', m2, CAST(1.0 AS DOUBLE), m2 >= 1.0 FROM m
        UNION ALL SELECT 'min_at_least', 'l_quantity', m3, CAST(1.0 AS DOUBLE), m3 >= 1.0 FROM m
        UNION ALL SELECT 'max_at_most', 'l_tax', m4, CAST(0.05 AS DOUBLE), m4 <= 0.05 FROM m
        UNION ALL SELECT 'pattern_rate', 'l_returnflag', m5, CAST(0.999 AS DOUBLE), m5 >= 0.999 FROM m
        UNION ALL SELECT 'membership_rate', 'l_linestatus', m6, CAST(1.0 AS DOUBLE), m6 >= 1.0 FROM m)
      ORDER BY "check", "column""""))

  /** Join-key skew diagnostic over lineitem's suppkey: per-key counts
    * reduce to the scalar shape stats (max/p99/mean cardinality, skew
    * factor, hottest key) that pick between plain shuffle, broadcast, AQE
    * skew handling, or an explicit salt. One keyed aggregate + one scalar
    * aggregate — no window, no sort. */
  val q131SkewReport = QueryDef(
    "q131_skew_report",
    (s, d) => graft.ops.Checks.skewReport(Tables.lineitem(s, d), "l_suppkey"),
    Some("""WITH c AS (SELECT CAST(l_suppkey AS VARCHAR) AS k,
          CAST(COUNT(*) AS BIGINT) AS n FROM lineitem GROUP BY 1)
      SELECT CAST(SUM(n) AS BIGINT) AS n_rows,
        CAST(COUNT(*) AS BIGINT) AS n_keys,
        CAST(MAX(n) AS BIGINT) AS max_key_rows,
        ROUND(quantile_cont(CAST(n AS DOUBLE), 0.99), 6) AS p99_key_rows,
        ROUND(AVG(CAST(n AS DOUBLE)), 6) AS mean_key_rows,
        ROUND(CAST(MAX(n) AS DOUBLE)
          / (CAST(SUM(n) AS DOUBLE) / COUNT(*)), 6) AS skew_factor,
        (SELECT k FROM c ORDER BY n DESC, k DESC LIMIT 1) AS hottest_key
      FROM c"""))

  /** Exact heavy hitters with bounded state (ops/HeavyHitters.scala): a
    * mergeable Misra-Gries sketch (≤k counters per task, no key-space
    * shuffle) yields a candidate superset; one exact pass over only the
    * candidates keeps keys with count > n/k. The synthetic key funnels
    * half of lineitem into 2 hot keys and scatters the rest across ~|orders|/2
    * near-unique cold keys — the cardinality profile where groupBy-count
    * stops scaling and a sketch is the right plan. Oracle = the plain
    * GROUP BY/HAVING the two-pass result is provably equal to. */
  val q133HeavyHitters = QueryDef(
    "q133_heavy_hitters",
    (s, d) => {
      import graft.ops.HeavyHitters
      val key = when(pmod(col("l_orderkey"), lit(4)) < 2,
        concat(lit("hot"), pmod(col("l_orderkey"), lit(2))))
        .otherwise(concat(lit("cold"), col("l_orderkey")))
      HeavyHitters.heavyHitters(Tables.lineitem(s, d), key, k = 10)
    },
    Some("""WITH keyed AS (SELECT CASE WHEN l_orderkey % 4 < 2
          THEN 'hot' || CAST(l_orderkey % 2 AS VARCHAR)
          ELSE 'cold' || CAST(l_orderkey AS VARCHAR) END AS key
        FROM lineitem),
      tot AS (SELECT COUNT(*) AS n FROM keyed)
      SELECT key, COUNT(*) AS cnt,
        ROUND(COUNT(*) / (SELECT CAST(n AS DOUBLE) FROM tot), 6) AS share
      FROM keyed GROUP BY key
      HAVING COUNT(*) > (SELECT CAST(n AS DOUBLE) FROM tot) / 10.0
      ORDER BY cnt DESC, key"""))

  /** Out-of-fold target encoding (encode.OofTargetEncoder): the CV-safe
    * variant of q08 — each (category, fold) cell is encoded from the OTHER
    * folds' target sums, so no row's target leaks into its own feature.
    * One keyed aggregate to the (category, fold) grain + a window over
    * that tiny table; the corpus never shuffles. */
  val q136OofEncoding = QueryDef(
    "q136_oof_encoding",
    (s, d) => {
      import graft.encode.OofTargetEncoder
      OofTargetEncoder.fit(Tables.customer(s, d),
          "c_mktsegment", "c_acctbal", pmod(col("c_custkey"), lit(5)))
        .orderBy("category", "fold")
    },
    Some("""WITH byfold AS (
        SELECT c_mktsegment AS category, c_custkey % 5 AS fold,
          SUM(CAST(c_acctbal AS DECIMAL(28,6))) AS f_sum,
          COUNT(c_acctbal) AS f_cnt
        FROM customer WHERE c_mktsegment IS NOT NULL GROUP BY 1, 2)
      SELECT category, fold,
        CASE WHEN SUM(f_cnt) OVER w > f_cnt THEN
          ROUND(CAST(SUM(f_sum) OVER w - f_sum AS DOUBLE)
            / (SUM(f_cnt) OVER w - f_cnt), 6)
        END AS enc
      FROM byfold WINDOW w AS (PARTITION BY category)
      ORDER BY category, fold"""))

  /** k-anonymity release audit (Checks.kAnonymityAudit): customers under
    * the QI tuple (mktsegment, nationkey, acctbal-century) — the governance
    * gate asking "how many rows are in groups smaller than k, and what
    * suppression rate would a k-anonymous release pay". The acctbal bucket
    * makes the QI space wide enough that small groups actually occur. */
  val q267KAnonymity = QueryDef(
    "q267_k_anonymity",
    (s, d) => graft.ops.Checks.kAnonymityAudit(Tables.customer(s, d),
      Seq(col("c_mktsegment"), col("c_nationkey"),
        floor(col("c_acctbal") / 100).cast("long")), k = 5),
    Some("""WITH g AS (SELECT c_mktsegment, c_nationkey,
          CAST(FLOOR(c_acctbal / 100) AS BIGINT) AS bal,
          CAST(COUNT(*) AS BIGINT) AS n
        FROM customer GROUP BY 1, 2, 3)
      SELECT CAST(SUM(n) AS BIGINT) AS n_rows,
        CAST(COUNT(*) AS BIGINT) AS n_groups,
        CAST(SUM(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_violating_groups,
        CAST(SUM(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT)
          AS rows_at_risk,
        CAST(MIN(n) AS BIGINT) AS min_group_size,
        ROUND(CAST(SUM(CASE WHEN n < 5 THEN n ELSE 0 END) AS DOUBLE)
          / CAST(SUM(n) AS DOUBLE), 6) AS suppressed_frac,
        CAST(5 AS INT) AS k
      FROM g"""))

  /** l-diversity release audit (Checks.lDiversityAudit), the q267
    * companion: same QI tuple minus the balance bucket, which instead
    * becomes the SENSITIVE attribute — a (segment, nation) group whose
    * members all share one balance century is disclosive no matter how
    * big it is. l=3. */
  val q275LDiversity = QueryDef(
    "q275_l_diversity",
    (s, d) => graft.ops.Checks.lDiversityAudit(Tables.customer(s, d),
      Seq(col("c_mktsegment"), col("c_nationkey")),
      floor(col("c_acctbal") / 100).cast("long"), l = 3),
    Some("""WITH g AS (SELECT c_mktsegment, c_nationkey,
          CAST(COUNT(*) AS BIGINT) AS n,
          CAST(COUNT(DISTINCT CAST(FLOOR(c_acctbal / 100) AS BIGINT))
            AS BIGINT) AS d
        FROM customer GROUP BY 1, 2)
      SELECT CAST(SUM(n) AS BIGINT) AS n_rows,
        CAST(COUNT(*) AS BIGINT) AS n_groups,
        CAST(SUM(CASE WHEN d < 3 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_violating_groups,
        CAST(SUM(CASE WHEN d < 3 THEN n ELSE 0 END) AS BIGINT)
          AS rows_at_risk,
        CAST(MIN(d) AS BIGINT) AS min_diversity,
        CAST(3 AS INT) AS l
      FROM g"""))

  /** Seeded differentially-private count release (Checks.dpNoisyCounts):
    * per-orderpriority counts + Laplace(1/ε) noise drawn from md5(seed|key)
    * — reproducible across engines, so even the NOISE is exactly oracled.
    * ε=0.5 makes the perturbation visibly nonzero at any SF. */
  val q268DpCounts = QueryDef(
    "q268_dp_counts",
    (s, d) => graft.ops.Checks.dpNoisyCounts(Tables.orders(s, d),
        Seq("o_orderpriority"), eps = 0.5)
      .orderBy("o_orderpriority"),
    Some("""WITH c AS (SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
        FROM orders GROUP BY 1),
      u AS (SELECT o_orderpriority, n,
          -- concat_ws, not ||: a NULL group key must hash as '42' on both
          -- engines (|| would null the whole key)
          (CAST(('0x' || substr(md5(concat_ws('|', '42',
              CAST(o_orderpriority AS VARCHAR))), 1, 8))
            AS BIGINT) + 0.5) / 4294967296.0 - 0.5 AS cu
        FROM c)
      SELECT o_orderpriority, n,
        ROUND(n + (-1.0 / 0.5) * SIGN(cu) * LN(1.0 - 2.0 * ABS(cu)), 6)
          AS noisy_n,
        CAST(0.5 AS DOUBLE) AS eps
      FROM u ORDER BY o_orderpriority NULLS FIRST"""))

  override val defs: Seq[QueryDef] = Seq(
    q01PricingSummary, q02NullFractions, q03ValueCountsPct, q04ModeQty,
    q05Quantiles, q06IqrOutliers, q07DistinctCounts, q08TargetEncoding,
    q09Corr, q11SubstringFilter, q12NullSafeFilter, q15ProvinceRanges,
    q130QualityGate, q131SkewReport, q133HeavyHitters, q136OofEncoding,
    q267KAnonymity, q268DpCounts, q275LDiversity)
}
