package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-drift monitoring between two dataset snapshots — the check a
  * training-data pipeline runs before swapping in a new corpus release
  * (reference: the release-diff / report-card audits in scraper pipelines;
  * the metric itself is the standard Population Stability Index).
  *
  * PSI = Σ_buckets (p_a − p_b) · ln(p_a / p_b), with empty buckets floored
  * at `eps` so a bucket present on only one side contributes a large-but-
  * finite term instead of ±∞.
  *
  * Scale shape: each snapshot collapses to its bucket histogram first
  * (map-side combined groupBy — the only pass over data rows), and all
  * ratio/log arithmetic runs over the ≤#buckets joined histogram. The
  * totals windows are over that same tiny table, never data rows. Two
  * scans, one shuffle each, no driver barriers.
  */
object Drift {

  /** Per-bucket drift rows between snapshots `a` and `b`:
    * (bucket, n_a, n_b, p_a, p_b, psi_term, psi_total), ordered by bucket.
    * `bucket` is any deterministic bucketing expression over a row (width
    * bucket, capped quantile id, category). Null buckets count as a real
    * bucket (rendered by the caller's expression; nulls group together).
    */
  def psiReport(a: DataFrame, b: DataFrame, bucket: Column,
      eps: Double = 1e-6): DataFrame = {
    val hist = a.select(bucket.as("bucket")).withColumn("__side", lit("a"))
      .unionByName(b.select(bucket.as("bucket")).withColumn("__side", lit("b")))
      .groupBy(col("bucket"))
      .agg(
        sum(when(col("__side") === "a", 1L).otherwise(0L)).as("n_a"),
        sum(when(col("__side") === "b", 1L).otherwise(0L)).as("n_b"))
    // totals over the ≤#buckets histogram — a global window here is over
    // handfuls of rows, not data
    val w = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val pa = greatest(col("n_a").cast("double") / sum(col("n_a")).over(w), lit(eps))
    val pb = greatest(col("n_b").cast("double") / sum(col("n_b")).over(w), lit(eps))
    val term = (pa - pb) * log(pa / pb)
    hist
      .withColumn("p_a", round(pa, 6))
      .withColumn("p_b", round(pb, 6))
      .withColumn("psi_term", round(term, 6))
      .withColumn("psi_total",
        round(sum(round(term, 6)).over(w), 6))
      .orderBy(col("bucket"))
  }
}
