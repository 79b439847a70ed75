package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality gates (the Deequ pattern): a check suite
  * evaluates in ONE aggregate pass over the table — every metric is an
  * algebraic aggregate, so the whole suite costs a single scan with
  * map-side combine no matter how many checks it carries — and emits one
  * report row per check: (check, column, metric, threshold, pass).
  *
  * A pipeline gates a write on `run(df, suite).filter(!col("pass"))` being
  * empty; the report itself is the audit artifact. Metrics carry the
  * round-6 cross-engine contract so the report is oracle-comparable like
  * any other query.
  */
object Checks {

  /** One declarative check. `metric` must be an aggregate Column; `geq`
    * selects the pass direction: metric >= threshold (true) or
    * metric <= threshold (false).
    */
  final case class Check(name: String, column: String, metric: Column,
      threshold: Double, geq: Boolean = true)

  /** Fraction of non-null values in a column (completeness). */
  def completeness(c: String): Column =
    round(count(col(c)).cast("double") / count(lit(1)), 6)

  /** Fraction of distinct values among non-null rows (1.0 = unique key). */
  def uniqueness(c: String): Column =
    round(count_distinct(col(c)).cast("double") / count(col(c)), 6)

  /** Fraction of non-null values matching an RE2-compatible pattern. */
  def patternRate(c: String, re: String): Column =
    round(sum(when(col(c).rlike(re), 1L).otherwise(0L)).cast("double")
      / count(col(c)), 6)

  /** Fraction of non-null values inside an allowed set. */
  def membershipRate(c: String, allowed: Seq[String]): Column =
    round(sum(when(col(c).isin(allowed: _*), 1L).otherwise(0L)).cast("double")
      / count(col(c)), 6)

  /** Standard check constructors. */
  def isComplete(c: String, atLeast: Double = 1.0): Check =
    Check("completeness", c, completeness(c), atLeast)
  def isUnique(c: String): Check =
    Check("uniqueness", c, uniqueness(c), 1.0)
  def minAtLeast(c: String, bound: Double): Check =
    Check("min_at_least", c, round(min(col(c)).cast("double"), 6), bound)
  def maxAtMost(c: String, bound: Double): Check =
    Check("max_at_most", c, round(max(col(c)).cast("double"), 6), bound, geq = false)
  def matchesPattern(c: String, re: String, atLeast: Double): Check =
    Check("pattern_rate", c, patternRate(c, re), atLeast)
  def isContainedIn(c: String, allowed: Seq[String], atLeast: Double = 1.0): Check =
    Check("membership_rate", c, membershipRate(c, allowed), atLeast)

  /** Run a check suite in one pass. Output: one row per check, in suite
    * order — (check, column, metric, threshold, pass).
    *
    * Shape: all metrics evaluate inside ONE `agg` (a single scan +
    * map-side-combined aggregate regardless of suite size); the per-check
    * report rows then unpivot from the 1-row frame with an array-of-structs
    * explode — the driver never sees data rows.
    */
  def run(df: DataFrame, suite: Seq[Check]): DataFrame = {
    require(suite.nonEmpty, "empty check suite")
    val metricCols = suite.zipWithIndex.map { case (c, i) => c.metric.as(s"__m$i") }
    val one = df.agg(metricCols.head, metricCols.tail: _*)
    val structs = suite.zipWithIndex.map { case (c, i) =>
      val m = col(s"__m$i").cast("double")
      val pass = if (c.geq) m >= lit(c.threshold) else m <= lit(c.threshold)
      struct(lit(c.name).as("check"), lit(c.column).as("column"),
        round(m, 6).as("metric"), lit(c.threshold).as("threshold"),
        pass.as("pass"))
    }
    one.select(explode(array(structs: _*)).as("r"))
      .select(col("r.check"), col("r.column"), col("r.metric"),
        col("r.threshold"), col("r.pass"))
  }

  /** Key-distribution skew report for a prospective join/aggregate key:
    * per-key counts reduce to scalar shape stats — total rows, distinct
    * keys, max/p99/mean key cardinality, the skew factor max/mean, and the
    * hottest key — the numbers that decide between a plain shuffle,
    * broadcast, AQE skew handling, or an explicit salt.
    *
    * Shape: one map-side-combined groupBy(key) then one scalar aggregate
    * over the (much smaller) per-key counts; the hot key rides along via a
    * max(struct) — no window, no sort, no second scan of the data.
    */
  def skewReport(df: DataFrame, key: String): DataFrame = {
    val counts = df.groupBy(col(key).cast("string").as("__k"))
      .agg(count(lit(1)).as("__n"))
    counts.agg(
      sum(col("__n")).cast("bigint").as("n_rows"),
      count(lit(1)).as("n_keys"),
      max(col("__n")).cast("bigint").as("max_key_rows"),
      round(percentile(col("__n").cast("double"), lit(0.99)), 6).as("p99_key_rows"),
      round(avg(col("__n").cast("double")), 6).as("mean_key_rows"),
      round(max(col("__n")).cast("double")
        / (sum(col("__n")).cast("double") / count(lit(1))), 6).as("skew_factor"),
      max(struct(col("__n").as("n"), col("__k").as("k")))
        .getField("k").as("hottest_key"))
  }

  /** k-anonymity audit over a quasi-identifier (QI) tuple (Sweeney 2002):
    * a row is re-identifiable when its QI combination is shared by fewer
    * than k rows, so the release gate is "no QI group smaller than k".
    * One summary row: group counts, how many groups/rows violate, the
    * smallest group, and the suppression fraction a k-anonymous release
    * would pay (violating rows / total) — the number a data-governance
    * review asks for first.
    *
    * Scale shape: one map-side-combined groupBy on the QI tuple (the QI
    * space is the operator's working set — bounded by distinct QI combos,
    * not rows), then one scalar aggregate over the group-size table. No
    * window, no join, no second data scan. NULL QI values form their own
    * group (SQL groupBy semantics): NULL is a visible attribute state in a
    * release and must be size-audited like any other.
    */
  def kAnonymityAudit(df: DataFrame, qi: Seq[Column], k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val groups = df.groupBy(qi: _*).agg(count(lit(1)).as("__n"))
    groups.agg(
      sum(col("__n")).cast("bigint").as("n_rows"),
      count(lit(1)).as("n_groups"),
      sum(when(col("__n") < k, 1L).otherwise(0L)).cast("bigint")
        .as("n_violating_groups"),
      sum(when(col("__n") < k, col("__n")).otherwise(0L)).cast("bigint")
        .as("rows_at_risk"),
      min(col("__n")).cast("bigint").as("min_group_size"),
      round(sum(when(col("__n") < k, col("__n")).otherwise(0L)).cast("double")
        / sum(col("__n")).cast("double"), 6).as("suppressed_frac"))
      .withColumn("k", lit(k))
  }

  /** l-diversity audit (Machanavajjhala et al. 2007), the companion gate
    * to [[kAnonymityAudit]]: k-anonymity bounds group SIZE, but a large
    * group whose sensitive attribute is constant still leaks — so the
    * release gate is "every QI group carries ≥ l DISTINCT sensitive
    * values". One summary row mirroring the k-audit's shape. NULL
    * sensitive values are NOT counted as a distinct value (SQL
    * COUNT(DISTINCT) semantics — an absent attribute discloses nothing);
    * NULL QI values form their own group, as in the k-audit.
    *
    * Scale shape: one map-side-combined groupBy on (QI, distinct
    * sensitive) — Spark plans countDistinct as a two-phase expand —
    * then one scalar reduce over the ≤#groups table.
    */
  def lDiversityAudit(df: DataFrame, qi: Seq[Column], sensitive: Column,
      l: Int): DataFrame = {
    require(l >= 2, s"l must be >= 2, got $l")
    val groups = df.groupBy(qi: _*)
      .agg(count(lit(1)).as("__n"), countDistinct(sensitive).as("__d"))
    groups.agg(
      sum(col("__n")).cast("bigint").as("n_rows"),
      count(lit(1)).as("n_groups"),
      sum(when(col("__d") < l, 1L).otherwise(0L)).cast("bigint")
        .as("n_violating_groups"),
      sum(when(col("__d") < l, col("__n")).otherwise(0L)).cast("bigint")
        .as("rows_at_risk"),
      min(col("__d")).cast("bigint").as("min_diversity"))
      .withColumn("l", lit(l))
  }

  /** Differentially-private count release: per-group counts + Laplace(Δ/ε)
    * noise (Dwork et al. 2006; sensitivity Δ=1 for counting queries), with
    * the noise drawn DETERMINISTICALLY from a seeded md5 of the group key —
    * the release is reproducible across runs, engines and re-partitions,
    * which is what lets the DuckDB oracle replay it bit-for-bit (the same
    * reason every sampler here ranks on md5, not rand()). u comes from a
    * 32-bit md5 slice shifted into (0,1) so the inverse-CDF log is always
    * finite; noise = -(1/ε)·sign(u-½)·ln(1-2|u-½|).
    *
    * Privacy note: a keyed-hash draw is standard practice for reproducible
    * DP releases (the seed must stay secret alongside the raw data — a
    * public seed lets anyone subtract the noise). ε accounting across
    * repeated releases is the caller's budget to manage.
    *
    * Scale shape: one map-side-combined groupBy; the noise projection runs
    * over the ≤#groups result table, never data rows.
    */
  def dpNoisyCounts(df: DataFrame, groupCols: Seq[String], eps: Double,
      seed: String = "42"): DataFrame = {
    require(eps > 0, s"eps must be positive, got $eps")
    val key = concat_ws("|", lit(seed) +: groupCols.map(c => col(c).cast("string")): _*)
    val u = (graft.text.TextAnalysis.md5Int32(key) + 0.5) / 4294967296.0
    val centered = u - 0.5
    val noise = (lit(-1.0 / eps) * signum(centered)
      * log(lit(1.0) - lit(2.0) * abs(centered)))
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("noisy_n", round(col("n") + noise, 6))
      .withColumn("eps", lit(eps))
  }
}
