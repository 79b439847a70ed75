package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Row-filter semantics from the reference's cleaning stage.
  *
  * Reference: /root/reference/Preprocessing/preprocessing.py:34-44 (conditional
  * filters), :71-73 (postal length), :75-77 (drop-all-null), :583 (bounds);
  * /root/reference/scraper/scraper.py:139 (substring predicates), :230 (status).
  *
  * The pandas trap (SURVEY §2.2 P3): `df[df[c] != True]` KEEPS NaN rows because
  * NaN != True is truthy in pandas, while Spark's `col =!= true` evaluates to
  * NULL on nulls and the filter drops them. All the *KeepingNulls variants below
  * therefore use the null-safe `<=>` comparison, negated.
  */
object Filters {

  /** Keep rows where col is not TRUE — nulls are KEPT (pandas `!= True`). */
  def notTrueKeepingNulls(c: Column): Column = !(c <=> lit(true))

  /** Keep rows where col is not FALSE — nulls are KEPT (pandas `!= False`). */
  def notFalseKeepingNulls(c: Column): Column = !(c <=> lit(false))

  /** preprocessing.py:34-44 — the four filter modes. */
  def filterRows(df: DataFrame, column: String, mode: String): DataFrame = mode match {
    case "not_true"  => df.filter(notTrueKeepingNulls(col(column)))
    case "not_false" => df.filter(notFalseKeepingNulls(col(column)))
    case "is_null"   => df.filter(col(column).isNull)
    case "not_null"  => df.filter(col(column).isNotNull)
    case other       => throw new IllegalArgumentException(s"unknown filter mode: $other")
  }

  /** preprocessing.py:71-73 — keep rows whose (string-cast) column has exactly
    * `n` characters. pandas `.str.len()` on a non-string yields NaN which the
    * `== 4` comparison drops; Spark `length` of NULL is NULL which the
    * comparison also drops — semantics line up.
    */
  def lengthEquals(c: Column, n: Int): Column = length(c.cast("string")) === n

  /** preprocessing.py:75-77 — drop rows where ALL of the given columns are null. */
  def dropAllNull(df: DataFrame, cols: Seq[String]): DataFrame =
    df.na.drop("all", cols)

  /** scraper.py:139 — URL substring predicate. */
  def listingUrlFilter(url: Column): Column =
    url.contains("for-sale") && (url.contains("house") || url.contains("apartment"))

  /** preprocessing.py:583 — inclusive coordinate bounds (pandas between is inclusive). */
  def validCoordinates(lat: Column, lon: Column): Column =
    lat.between(-90, 90) && lon.between(-180, 180)
}
