package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Null statistics + the data-dependent column prune.
  *
  * Reference: preprocessing.py:79-85 (clean_missing_data drops any column whose
  * null fraction exceeds a threshold — the schema becomes data-dependent),
  * :404 (isna().sum()), model/project.py:41-47 (missing report).
  *
  * All per-column stats are computed in a SINGLE pass (one aggregate over all
  * columns), not one job per column — at 100 TB a per-column loop of jobs would
  * re-scan the table N times.
  */
object MissingData {

  private def nullFrac(c: String): Column =
    avg(when(col(c).isNull, 1.0).otherwise(0.0)).as(c)

  private def nullCnt(c: String): Column =
    sum(when(col(c).isNull, 1L).otherwise(0L)).as(c)

  /** One row: null fraction per column (pandas `df.isnull().mean()`). */
  def nullFractions(df: DataFrame, cols: Seq[String] = Nil): DataFrame = {
    val cs = if (cols.nonEmpty) cols else df.columns.toSeq
    df.agg(nullFrac(cs.head), cs.tail.map(nullFrac): _*)
  }

  /** One row: null count per column (pandas `df.isna().sum()`). */
  def nullCounts(df: DataFrame, cols: Seq[String] = Nil): DataFrame = {
    val cs = if (cols.nonEmpty) cols else df.columns.toSeq
    df.agg(nullCnt(cs.head), cs.tail.map(nullCnt): _*)
  }

  /** The two-pass prune: aggregate → collect tiny row → project.
    * Returns (prunedDf, droppedColumns) so callers can log/pin the decision
    * (SURVEY §7.4-3: thread the surviving-column set explicitly).
    */
  def cleanMissingData(df: DataFrame, threshold: Double): (DataFrame, Seq[String]) = {
    val fracRow = nullFractions(df).head()
    val dropped = df.columns.toSeq.filter(c => fracRow.getAs[Double](c) > threshold)
    (df.drop(dropped: _*), dropped)
  }

  /** pandas `fill_missing_with_stat` (preprocessing.py:364-392): fill nulls in
    * each listed column with its mode (pandas tie-break: smallest), median
    * (linear interpolation) or mean. One tiny driver collect per column —
    * same barrier shape as the reference; row data stays on executors.
    * Columns absent from the frame are skipped (pandas `if column in df`).
    */
  def fillWithStat(df: DataFrame, columns: Seq[String], method: String): DataFrame = {
    val present = columns.filter(df.columns.contains)
    if (present.isEmpty) return df
    method match {
      case "mode" =>
        // one groupBy per column is unavoidable for exact modes, but the
        // fill values apply as a single projection
        present.foldLeft(df) { (acc, c) =>
          Aggregates.modeSmallest(acc, c).collect().headOption.map(_.get(0)) match {
            case Some(v: java.lang.Number) => acc.na.fill(Map(c -> v.doubleValue()))
            case Some(v)                   => acc.na.fill(Map(c -> v.toString))
            case None                      => acc
          }
        }
      case "median" | "mean" =>
        // ONE aggregate pass for every column — not a scan per column
        val aggs = present.map { c =>
          val v = col(c).cast("double")
          (if (method == "median") percentile(v, lit(0.5)) else avg(v)).as(c)
        }
        val row = df.agg(aggs.head, aggs.tail: _*).head()
        val fills = present.flatMap(c =>
          Option(row.getAs[Any](c)).map(v =>
            c -> v.asInstanceOf[java.lang.Number].doubleValue())).toMap
        if (fills.isEmpty) df else df.na.fill(fills)
      case other => throw new IllegalArgumentException(s"method $other")
    }
  }
}
