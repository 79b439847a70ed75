package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Aggregation helpers (SURVEY §2.4).
  *
  * Float determinism policy for oracle parity: money-like sums go through
  * DECIMAL (exact, order-independent) and are cast back to double; averages are
  * decimal-sum / count; exact `percentile` (linear interpolation, same as
  * pandas/DuckDB quantile_cont) — never percentile_approx on an oracle path.
  */
object Aggregates {

  /** Order-independent exact sum of a money-like double column, as double. */
  def decSum(c: Column, scale: Int = 2): Column =
    sum(c.cast(s"decimal(28,$scale)")).cast("double")

  /** Order-independent mean: exact decimal sum / count, as double. */
  def decAvg(c: Column, scale: Int = 2): Column =
    (sum(c.cast(s"decimal(28,$scale)")).cast("double") / count(c)).cast("double")

  /** Exact percentile (linear interpolation — matches pandas quantile and
    * DuckDB quantile_cont). Reference: preprocessing.py:351, 556-580.
    */
  def exactPercentile(c: Column, p: Double): Column =
    percentile(c, lit(p))

  /** Mode with the pandas tie-break: highest count, then SMALLEST value
    * (pandas `mode()[0]` sorts values). Reference: preprocessing.py:314, 377.
    * Spark 4's `mode()` is arbitrary on ties, so: groupBy → count → top-1.
    */
  def modeSmallest(df: DataFrame, column: String): DataFrame =
    df.filter(col(column).isNotNull)
      .groupBy(col(column))
      .count()
      .orderBy(desc("count"), asc(column))
      .limit(1)
      .select(col(column))

  /** A11 scale path: HyperLogLog++ approximate distinct count. Exact
    * `countDistinct` shuffles every distinct value; the sketch shuffles one
    * fixed-size buffer per partition — the 100 TB form. `rsd` is the target
    * relative standard deviation (accuracy/buffer tradeoff). Accuracy vs
    * exact is pinned in OpsSpec; not oracled (sketch internals are
    * engine-specific by design).
    */
  def approxDistinct(df: DataFrame, column: String, rsd: Double = 0.02): Long =
    df.agg(approx_count_distinct(col(column), rsd)).head().getLong(0)

  /** A7 scale path: approximate percentiles via Spark's quantile sketch
    * (Greenwald-Khanna): mergeable fixed-size partial state instead of
    * shuffling values — the 100 TB form of the quantile barrier. `accuracy`
    * trades state size for error (1/accuracy relative rank error). Exact
    * `percentile` stays the oracle-path default; accuracy pinned in OpsSpec.
    */
  def approxQuantiles(df: DataFrame, column: String, probs: Seq[Double],
      accuracy: Int = 10000): Seq[Double] =
    df.agg(percentile_approx(col(column),
        array(probs.map(lit): _*), lit(accuracy)))
      .head().getSeq[Double](0)

  /** Stratified sample with per-stratum fractions (seeded, reproducible for
    * a fixed seed+partitioning) — training-data curation's "rebalance by
    * source/language/quality-bucket" step. Map-side filter per row: no
    * shuffle at all.
    */
  def stratifiedSample(df: DataFrame, stratumCol: String,
      fractions: Map[String, Double], seed: Long = 42L): DataFrame =
    df.stat.sampleBy(stratumCol, fractions, seed)

  /** value_counts with percentage (preprocessing.py:270-271, 299-307).
    * The total is a scalar broadcast via a windowless cross-join-free
    * `sum over ()` — one shuffle for the groupBy, the pct is derived.
    */
  def valueCounts(df: DataFrame, column: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df.groupBy(col(column)).agg(count(lit(1)).as("cnt"))
      .withColumn("pct", (col("cnt") / sum("cnt").over(Window.partitionBy())).cast("double"))
      .orderBy(desc("cnt"), asc(column))
  }

  /** Population skewness expressed through raw moments; matches Spark's
    * `skewness` formula. pandas `.skew()` is the bias-corrected sample
    * statistic: multiply by sqrt(n(n-1))/(n-2) for parity (SURVEY §2.4 A9).
    */
  def sampleSkewCorrection(n: Long): Double =
    math.sqrt(n.toDouble * (n - 1)) / (n - 2)

  /** Pairwise Pearson correlation matrix over the given numeric columns,
    * computed in ONE aggregate pass (all pairs at once), returned long-form
    * (c1, c2, corr). Reference: model/project.py:65-69.
    */
  def correlationMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    val pairs = for { a <- cols; b <- cols if a < b } yield (a, b)
    val aggs = pairs.map { case (a, b) => corr(col(a), col(b)).as(s"${a}__${b}") }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val spark = df.sparkSession
    import spark.implicits._
    val r = row.head()
    pairs.zipWithIndex
      .map { case ((a, b), i) => (a, b, r.getAs[Double](i)) }
      .toDF("c1", "c2", "corr")
  }

  /** IQR outlier bounds [Q1 - 1.5·IQR, Q3 + 1.5·IQR] (preprocessing.py:351-354). */
  def iqrBounds(df: DataFrame, column: String): (Double, Double) = {
    val Array(q1, q3) = df.agg(expr(s"percentile($column, array(0.25, 0.75))"))
      .head().getSeq[Double](0).toArray
    val iqr = q3 - q1
    (q1 - 1.5 * iqr, q3 + 1.5 * iqr)
  }
}
