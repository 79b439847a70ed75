package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — an operator Spark lacks natively (DuckDB/kdb/pandas
  * `merge_asof` have it): attach to each left row the most recent right row
  * per key with right time ≤ left time.
  *
  * Spark-first composition (preference (a) of SURVEY's custom-operator
  * ladder): tag both sides, UNION, and carry the right payload forward with
  * a per-key ordered window (`last(..., ignoreNulls)` over rows up to the
  * current one). ONE shuffle on the key, no range cross join, no custom
  * physical operator; state per key is a single carried struct, so the plan
  * scales exactly like any partitioned window.
  *
  * Tie-breaking is deterministic: a right row at the same instant as a left
  * row IS matched (side-ordering sorts right before left), and multiple
  * right rows at the same (key, time) resolve to the struct-maximum payload.
  */
object AsofJoin {

  def asofBackward(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, payload: Seq[String],
      outPrefix: String = "asof_"): DataFrame = {
    val rv = struct(col(rightTime).as("__t") +: payload.map(col): _*)
    val rvType = right.select(rv.as("__rv")).schema.head.dataType
    val lRow = struct(left.columns.map(col).toSeq: _*)
    val lRowType = left.select(lRow.as("__lrow")).schema.head.dataType

    val r2 = right.select(
      col(key).as("__k"), col(rightTime).as("__ts"), lit(0).as("__side"),
      rv.as("__rv"), lit(null).cast(lRowType).as("__lrow"))
    val l2 = left.select(
      col(key).as("__k"), col(leftTime).as("__ts"), lit(1).as("__side"),
      lit(null).cast(rvType).as("__rv"), lRow.as("__lrow"))

    val w = Window.partitionBy("__k")
      .orderBy(col("__ts"), col("__side"), col("__rv"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = r2.unionByName(l2)
      .withColumn("__carry", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val outCols: Seq[Column] =
      left.columns.toSeq.map(c => col(s"__lrow.$c").as(c)) ++
        (col(s"__carry.__t").as(s"$outPrefix$rightTime") +:
          payload.map(p => col(s"__carry.$p").as(s"$outPrefix$p")))
    carried.select(outCols: _*)
  }

  /** Bounded interval join (a range join with an equi key): pairs (l, r) on
    * the same key with r.time in [l.time, l.time + interval]. The key
    * equality keeps it a hash/sort-merge EQUI join — the range condition is
    * a post-join filter, so there is no cross product; per-key fan-out is
    * bounded by the interval.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, interval: String): DataFrame =
    left.join(right,
      left(key) === right(key) &&
        right(rightTime) >= left(leftTime) &&
        right(rightTime) <= left(leftTime) + expr(s"INTERVAL $interval"))
      .drop(right(key))
}
