package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator: a Spark query over the test tables plus (when
  * SQL-expressible) an equivalent DuckDB oracle query. Column names and row
  * order must match between the two (the driver hash-compares values after
  * sorting columns by name).
  *
  * Float determinism contract (so the hashes CAN match):
  *  - money sums → DECIMAL-cast sums cast back to double (order-independent);
  *  - averages → decimal sum / count;
  *  - quantiles → exact linear-interpolation percentile on both sides;
  *  - moment statistics (corr, skew) → round(…, 6) on both sides.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait QueryGroup {
  def defs: Seq[QueryDef]
}
