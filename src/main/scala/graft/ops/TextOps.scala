package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** String transforms from the reference's cleaning stage, as codegen-friendly
  * Column expressions (no UDFs — SURVEY §2.7, §2.10).
  */
object TextOps {

  /** pandas `str.capitalize()` — first char upper, REST LOWERED.
    * NOT `initcap` (which capitalizes every word).
    * Reference: /root/reference/Preprocessing/preprocessing.py:58-60.
    */
  def capitalize(c: Column): Column =
    when(c.isNull, lit(null))
      .otherwise(concat(upper(substring(c, 1, 1)), lower(substring(c, 2, 1 << 28))))

  /** pandas `str.replace('_',' ').str.capitalize()` on categorical columns. */
  def cleanCategory(c: Column): Column = capitalize(regexp_replace(c, "_", " "))

  /** pandas `str.title()` — capitalizes each word; Spark initcap matches.
    * Reference: preprocessing.py:62-64.
    */
  def titleCase(c: Column): Column = initcap(c)

  /** Strip embedded "(1234)" zips: preprocessing.py:66-67. */
  def stripParenZip(c: Column): Column = regexp_replace(c, "\\s*\\(\\d+\\)", "")

  /** Address normalization: strip, lower, expand abbreviations, collapse
    * whitespace. Reference: preprocessing.py:149-154.
    */
  def normalizeAddress(c: Column): Column = {
    val lowered = lower(trim(c))
    val expanded = Seq("str\\." -> "straat", "ave\\b" -> "avenue", "blvd\\b" -> "boulevard")
      .foldLeft(lowered) { case (acc, (pat, rep)) => regexp_replace(acc, pat, rep) }
    regexp_replace(expanded, "\\s+", " ")
  }

  /** URL tail: `url.strip('/').split('/')[-1]`. Reference: scraper.py:152-156. */
  def urlTail(url: Column): Column =
    element_at(split(regexp_replace(url, "/+$", ""), "/"), -1)

  /** Remap values via a literal map, keep original when unmapped
    * (pandas `.map(m).fillna(col)`). Reference: preprocessing.py:529, 535.
    * A when-chain instead of a join: no shuffle, stays in codegen.
    */
  def remapWithFallback(c: Column, m: Map[String, String]): Column =
    m.foldLeft(c) { case (acc, (k, v)) => when(c === lit(k), lit(v)).otherwise(acc) }

  /** Replace-by-list: any value in `from` becomes `to` (pandas Series.replace).
    * Reference: preprocessing.py:265-266 with the grouping dict at 506-511.
    */
  def replaceValues(c: Column, from: Seq[String], to: String): Column =
    when(c.isin(from: _*), lit(to)).otherwise(c)
}
