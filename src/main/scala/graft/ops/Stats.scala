package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distributed statistics: group-wise OLS regression, chi-squared
  * independence, Welch's t, MAD robust outliers, Benford first-digit audit.
  * The inferential complement to the drift suite (ops/Drift) — where PSI/KS
  * ask "did the distribution move?", these ask "is the relationship /
  * difference real, and which rows break it?".
  *
  * Float determinism contract (so a DuckDB oracle hash-matches): every
  * data-sized sum runs over DECIMAL casts (order-independent across any
  * partitioning), derived statistics are computed from those exact sums
  * with a mirrored operation order, and results round to 6. Each operator
  * is one map-side-combined aggregation over data rows; all ratio math
  * runs on report-sized frames.
  */
object Stats {

  /** Per-group simple linear regression of `y` on `x` by the closed-form
    * normal equations: returns (groupCols*, n, slope, intercept, r2).
    *
    * slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²) — groups with zero x
    * variance return null slope/intercept/r2 rather than ±Inf. All five
    * sums are DECIMAL(38,8) (exact; order-independent), so the doubles
    * derived from them are bit-identical on any engine replaying the same
    * formula. One shuffle (the groupBy, partial-aggregated map-side);
    * no second pass, no windows over data.
    */
  def regrByGroup(df: DataFrame, groupCols: Seq[String], x: Column,
      y: Column): DataFrame = {
    // products are DOUBLE multiplies cast to decimal (identical IEEE result
    // then identical half-up cast on any engine) — decimal×decimal would
    // hit engine-specific precision-overflow rescaling rules instead
    val xd = x.cast("double")
    val yd = y.cast("double")
    val agg = df
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(when(x.isNotNull && y.isNotNull, 1)).as("n"),
        sum(when(y.isNotNull, x.cast("decimal(28,8)"))).cast("double").as("sx"),
        sum(when(x.isNotNull, y.cast("decimal(28,8)"))).cast("double").as("sy"),
        sum((xd * yd).cast("decimal(38,8)")).cast("double").as("sxy"),
        sum(when(y.isNotNull, (xd * xd).cast("decimal(38,8)"))).cast("double").as("sxx"),
        sum(when(x.isNotNull, (yd * yd).cast("decimal(38,8)"))).cast("double").as("syy"))
    val n = col("n").cast("double")
    val covN = n * col("sxy") - col("sx") * col("sy")   // n²·cov
    val varXN = n * col("sxx") - col("sx") * col("sx")  // n²·var(x)
    val varYN = n * col("syy") - col("sy") * col("sy")
    val slope = covN / varXN
    agg
      .withColumn("slope", when(varXN > 0, round(slope, 6)))
      .withColumn("intercept",
        when(varXN > 0, round((col("sy") - slope * col("sx")) / n, 6)))
      .withColumn("r2",
        when(varXN > 0 && varYN > 0, round(covN * covN / (varXN * varYN), 6)))
      .drop("sx", "sy", "sxy", "sxx", "syy")
  }

  /** Pearson chi-squared test of independence between two categorical
    * columns: one row (chi2, dof, n). The contingency table is ONE
    * map-side-combined groupBy over data; expected counts and the statistic
    * come from marginal windows over that ≤|A|·|B|-row table. Observed
    * zeros for present-marginal pairs are handled by densifying the
    * (a, b) grid from the marginals (a cross of two report tables), so
    * chi2 matches the textbook definition, not just the support. Terms are
    * rounded to 8 before the decimal total (mirrorable order-independent
    * sum), chi2 rounds to 6. */
  def chiSquareIndependence(df: DataFrame, a: Column, b: Column): DataFrame = {
    val obs = df.filter(a.isNotNull && b.isNotNull)
      .select(a.as("a"), b.as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("o"))
    val ma = obs.groupBy("a").agg(sum(col("o")).as("na"))
    val mb = obs.groupBy("b").agg(sum(col("o")).as("nb"))
    val grid = ma.crossJoin(broadcast(mb)) // report × report
    val dense = grid.join(obs, Seq("a", "b"), "left").na.fill(Map("o" -> 0L))
    val all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val nTot = sum(col("o")).over(all)
    val e = col("na").cast("double") * col("nb").cast("double") / nTot.cast("double")
    val term = (col("o").cast("double") - e) * (col("o").cast("double") - e) / e
    val ka = size(collect_set(col("a")).over(all))
    val kb = size(collect_set(col("b")).over(all))
    dense
      .withColumn("chi2",
        round(sum(round(term, 8).cast("decimal(28,8)")).over(all).cast("double"), 6))
      .withColumn("dof", ((ka - 1) * (kb - 1)).cast("bigint"))
      .withColumn("n", nTot.cast("bigint"))
      .select("chi2", "dof", "n").limit(1)
  }

  /** Welch's unequal-variance t statistic between the rows where `side`
    * is true (group a) and false (group b): one row
    * (n_a, n_b, mean_a, mean_b, t_stat, dof) with the Welch–Satterthwaite
    * degrees of freedom. ONE aggregation over data (conditional decimal
    * sums); every derived double replays bit-identically from the exact
    * sums. Degenerate inputs (a group under 2 rows, both variances 0)
    * return null t/dof. */
  def welchTTest(df: DataFrame, side: Column, value: Column): DataFrame = {
    val v = value.cast("double")
    val vd = value.cast("decimal(28,8)")
    val v2d = (v * v).cast("decimal(38,8)")
    val agg = df.filter(value.isNotNull && side.isNotNull)
      .agg(
        count(when(side, 1)).as("n_a"),
        count(when(!side, 1)).as("n_b"),
        sum(when(side, vd)).cast("double").as("sa"),
        sum(when(!side, vd)).cast("double").as("sb"),
        sum(when(side, v2d)).cast("double").as("sa2"),
        sum(when(!side, v2d)).cast("double").as("sb2"))
    val na = col("n_a").cast("double")
    val nb = col("n_b").cast("double")
    val meanA = col("sa") / na
    val meanB = col("sb") / nb
    val varA = (col("sa2") - col("sa") * col("sa") / na) / (na - 1)
    val varB = (col("sb2") - col("sb") * col("sb") / nb) / (nb - 1)
    val se2 = varA / na + varB / nb
    val dof = se2 * se2 /
      (varA * varA / (na * na * (na - 1)) + varB * varB / (nb * nb * (nb - 1)))
    val ok = col("n_a") >= 2 && col("n_b") >= 2 && se2 > 0
    agg
      .withColumn("mean_a", round(meanA, 6))
      .withColumn("mean_b", round(meanB, 6))
      .withColumn("t_stat", when(ok, round((meanA - meanB) / sqrt(se2), 6)))
      .withColumn("dof", when(ok, round(dof, 6)))
      .select("n_a", "n_b", "mean_a", "mean_b", "t_stat", "dof")
  }

  /** Robust per-group outliers by Median Absolute Deviation: rows where
    * |x − median| > k·MAD, scored |x − median| / MAD (rounded 6). Exact
    * interpolated medians (percentile 0.5 — the q05 cross-engine contract);
    * two keyed aggregations + one join back on the group key, all
    * shuffle-aligned on `group` so AQE coalesces them into one exchange
    * chain. Groups with MAD = 0 flag nothing (score undefined — a
    * constant-valued group has no robust scale). */
  def madOutliers(df: DataFrame, group: String, value: Column, k: Double = 3.0,
      out: String = "mad_score"): DataFrame = {
    val v = value.cast("double")
    val med = df.groupBy(group)
      .agg(percentile(v, lit(0.5)).as("__med"))
    val withMed = df.join(med, Seq(group))
    val mad = withMed.groupBy(group)
      .agg(percentile(abs(v - col("__med")), lit(0.5)).as("__mad"))
    withMed.join(mad, Seq(group))
      .filter(col("__mad") > 0 && abs(v - col("__med")) > col("__mad") * k)
      .withColumn(out, round(abs(v - col("__med")) / col("__mad"), 6))
      .drop("__med", "__mad")
  }

  /** Benford first-digit audit over a positive numeric column: per digit
    * 1-9, observed count/share vs the Benford expectation log10(1+1/d),
    * with the chi-squared deviation total replicated on every row. The
    * first significant digit is taken from the DECIMAL(18,2) string
    * rendering (exact, never scientific notation — log10-based extraction
    * would misdigit at power-of-ten boundaries). One data pass; the digit
    * table is ≤9 rows. */
  def benford(df: DataFrame, value: Column): DataFrame = {
    val digit = regexp_extract(value.cast("decimal(18,2)").cast("string"),
      "[1-9]", 0)
    val hist = df.filter(value.isNotNull && value.cast("double") > 0)
      .select(digit.as("digit")).filter(col("digit") =!= "")
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val nTot = sum(col("n")).over(all).cast("double")
    val p = col("n").cast("double") / nTot
    // explicit ln ratio — log(base, x) helpers differ across engines
    val q = log(lit(1.0) + lit(1.0) / col("digit").cast("double")) / log(lit(10.0))
    val term = (p - q) * (p - q) / q * nTot // chi2 contribution n·(p−q)²/q
    hist
      .withColumn("p_obs", round(p, 6))
      .withColumn("p_benford", round(q, 6))
      .withColumn("chi2_total",
        round(sum(round(term, 8).cast("decimal(28,8)")).over(all).cast("double"), 6))
      .orderBy("digit")
  }
}
