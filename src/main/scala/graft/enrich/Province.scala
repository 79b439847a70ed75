package graft.enrich

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Postal-code → province: ordered half-open range map [start, end).
  * Reference: /root/reference/Preprocessing/preprocessing.py:110-135.
  * Pure when-chain (codegen'd, no UDF); non-numeric input → try_cast null →
  * falls through to null, matching the reference's int() failure → None.
  */
object Province {

  /** (start inclusive, end exclusive, name) — preprocessing.py:117-129. */
  val Ranges: Seq[(Int, Int, String)] = Seq(
    // Names byte-for-byte as the reference emits them (preprocessing.py:
    // 117-129): three are space-separated, Brabant_Walloon keeps its
    // underscore there too.
    (1000, 1300, "Brussels"),
    (1300, 2000, "Brabant_Walloon"),
    (2000, 3000, "Antwerp"),
    (3000, 3500, "Flemish Brabant"),
    (3500, 4000, "Limburg"),
    (4000, 5000, "Liège"),
    (5000, 6000, "Namur"),
    (6000, 7000, "Luxembourg"),
    (7000, 8000, "Hainaut"),
    (8000, 9000, "West Flanders"),
    (9000, 10000, "East Flanders"))

  def fromPostalCode(postal: Column): Column = {
    val p = postal.cast("string").try_cast("int")
    Ranges.foldRight(lit(null).cast("string")) { case ((lo, hi, name), acc) =>
      when(p >= lo && p < hi, lit(name)).otherwise(acc)
    }
  }
}
