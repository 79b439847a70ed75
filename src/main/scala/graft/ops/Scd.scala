package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Type-2 slowly-changing dimension build from a change-event stream — the
  * batch twin of LinkState's status lifecycle: instead of keeping only the
  * latest status per key, every attribute change opens a version row with
  * a validity interval.
  *
  *   - consecutive duplicate values collapse (only real changes version);
  *   - valid_from = the change's timestamp, valid_to = the next version's
  *     timestamp (null = current version), version = 1..n per key.
  *
  * Scale shape: both windows partition by the dimension key, and the
  * second runs on the first's output with the same partitioning+ordering,
  * so the whole build is ONE shuffle on the key. Per-key history is the
  * partition bound — dimensions with million-version keys don't exist in
  * practice; if one did, split by time range first.
  */
object Scd {

  /** `tieBreak` orders same-timestamp events deterministically (an event id
    * or ingest ordinal). Change detection is null-safe (`<=>`), so null
    * attribute values version like any other value.
    */
  def scd2(df: DataFrame, keys: Seq[String], attr: String, ts: String,
      tieBreak: String): DataFrame = {
    val part: Seq[Column] = keys.map(col)
    val w = Window.partitionBy(part: _*).orderBy(col(ts), col(tieBreak))
    // first-row test via row_number (not lag-is-null: attr may BE null)
    val changes = df
      .withColumn("__graft_prev", lag(col(attr), 1).over(w))
      .withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") === 1 || !(col("__graft_prev") <=> col(attr)))
      .drop("__graft_prev", "__graft_rn")
    changes
      .withColumn("valid_from", col(ts))
      .withColumn("valid_to", lead(col(ts), 1).over(w))
      .withColumn("version", row_number().over(w))
      .withColumn("is_current", lead(col(ts), 1).over(w).isNull)
  }
}
