package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic keep-first deduplication.
  *
  * pandas `drop_duplicates(keep='first')` keeps the first row in FILE ORDER
  * (preprocessing.py:462-463, 240, 250). Spark's `dropDuplicates` keeps an
  * ARBITRARY row, so for oracle parity callers must carry an explicit order
  * column (an ingest ordinal or a natural key) — SURVEY §2.5 W1-W3.
  *
  * Scale note: row_number over a partitioned window is a single shuffle on the
  * dedup key; no global sort.
  */
object Dedup {

  private val RN = "__graft_rn"

  /** Keep the first `n` rows per `keys`, "first" defined by ascending
    * `orderCols` (per-group caps and keep-first dedup are the same window).
    */
  def keepTopN(df: DataFrame, keys: Seq[String], orderCols: Seq[String],
      n: Int): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderCols.map(col): _*)
    df.withColumn(RN, row_number().over(w)).filter(col(RN) <= n).drop(RN)
  }

  /** Keep the first row per `keys`, "first" defined by ascending `orderCols`. */
  def keepFirst(df: DataFrame, keys: Seq[String], orderCols: Seq[String]): DataFrame =
    keepTopN(df, keys, orderCols, 1)

  /** Attach a read-order ordinal usable as the keep-first order column when the
    * input has no natural key. Stable for a fixed file layout (same guarantee
    * pandas gives: "first" = first in the file).
    */
  def withIngestOrdinal(df: DataFrame, name: String = "__ingest_ord"): DataFrame =
    df.withColumn(name, monotonically_increasing_id())
}
