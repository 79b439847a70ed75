package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (see TESTDATA.md).
  *
  * At 100 TB these would be partitioned/bucketed managed tables; the loader
  * keeps the access path declarative (`spark.read.parquet`) so Catalyst can
  * push filters and prune columns into the scan.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    normalizeTs(df)
  }

  /** Normalize the `ts` column to a session-zoned `TimestampType` regardless
    * of how the parquet writer encoded it. The driver has shipped events both
    * as TIMESTAMP(NANOS) (read as a nanos LongType under
    * spark.sql.legacy.parquet.nanosAsLong=true) and as TIMESTAMP(MICROS,
    * isAdjustedToUTC=false) (read as TIMESTAMP_NTZ in Spark 4). Event-time
    * operators (`window()`, `withWatermark`, `unix_micros`) require the
    * instant-bearing TimestampType, so both encodings funnel to it here. All
    * session builders pin spark.sql.session.timeZone=UTC, making the
    * NTZ→timestamp cast an exact instant (identical to DuckDB's `epoch()`).
    */
  def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) =>
        // integer DIV, not `/`: float division drifts ±1 µs at ns magnitudes
        df.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts DIV 1000")))
      case Some(TimestampNTZType) =>
        df.withColumn("ts", org.apache.spark.sql.functions.col("ts").cast("timestamp"))
      case _ => df
    }
  }

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
