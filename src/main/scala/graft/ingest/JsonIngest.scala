package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Fault-tolerant JSONL ingest for crawl-scale feeds, where some fraction of
  * records is ALWAYS malformed (truncated uploads, encoding damage, schema
  * drift). PERMISSIVE parsing keeps the pipeline running and ACCOUNTS for
  * every dropped record instead of failing the job (FAILFAST) or silently
  * dropping rows (DROPMALFORMED): good rows flow on; corrupt raw lines are
  * quarantined with the row intact for replay/debugging.
  *
  * Scale shape: one pass, no shuffle — corrupt routing is a map-side filter
  * on the `_corrupt_record` column the PERMISSIVE reader populates.
  */
object JsonIngest {

  val CorruptCol = "_corrupt_record"

  /** `release()` unpersists the shared raw cache once good/corrupt have
    * been written — long-running ingest drivers must not accumulate dead
    * cached batches. */
  final case class Tolerant(good: DataFrame, corrupt: DataFrame,
      private val raw: DataFrame) {
    def release(): Unit = raw.unpersist(blocking = false)
  }

  /** Read JSONL at `path` against `schema`; split good vs corrupt.
    * The returned `corrupt` frame carries the raw offending line. Call
    * `release()` on the result after consuming both sides.
    */
  def readJsonTolerant(spark: SparkSession, path: String,
      schema: StructType): Tolerant = {
    val withCorrupt = schema.add(CorruptCol, "string")
    // PERMISSIVE + cache: Spark requires referencing the corrupt column only
    // after materialization (a raw-line column is not a real data column)
    val raw = spark.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
      .cache()
    Tolerant(
      good = raw.filter(col(CorruptCol).isNull).drop(CorruptCol),
      corrupt = raw.filter(col(CorruptCol).isNotNull).select(col(CorruptCol)),
      raw = raw)
  }

  /** Ingest-health one-liner: totals the reader saw, for the run report. */
  def ingestStats(t: Tolerant): DataFrame = {
    val g = t.good.agg(count(lit(1)).as("n")).select(col("n").as("n_good"))
    g.crossJoin(t.corrupt.agg(count(lit(1)).as("n_corrupt")))
      .withColumn("corrupt_frac",
        round(col("n_corrupt").cast("double")
          / (col("n_good") + col("n_corrupt")), 6))
  }
}
