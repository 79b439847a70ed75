package graft.ingest

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** S4: the reference's interchange store is a single-file SQL database
  * (SQLite, /root/reference/scraper/scraper.py:15, reads at :166-171, :230).
  * This is the `spark.read.jdbc` ingest/egest path for migrating such a
  * deployment — the Parquet-backed tables remain the default store.
  *
  * Tests run against the EMBEDDED DERBY driver that ships on Spark's
  * classpath (this build resolves no external artifacts); a real SQLite
  * deployment only swaps `url`/`driver` (e.g. `jdbc:sqlite:/data/immoweb.db`
  * with `org.sqlite.JDBC` on the classpath) — the Spark plan is identical.
  *
  * Scale posture: a JDBC read is a SINGLE partition unless bounded — always
  * pass `partitionCol` (+ bounds) for anything bigger than a lookup table so
  * the scan fans out into `numPartitions` range queries. A single-file store
  * obviously caps server-side parallelism; the partitioned read is still the
  * right plan shape for when the same tables live in a real RDBMS.
  */
object JdbcStore {

  /** Read one table; partitioned range scan when `partitionCol` is given. */
  def readTable(spark: SparkSession, url: String, table: String,
      partitionCol: Option[String] = None,
      lowerBound: Long = 0L, upperBound: Long = Long.MaxValue,
      numPartitions: Int = 32,
      driver: Option[String] = None): DataFrame = {
    val props = new Properties()
    driver.foreach(props.setProperty("driver", _))
    partitionCol match {
      case Some(c) =>
        spark.read.jdbc(url, table, c, lowerBound, upperBound, numPartitions, props)
      case None =>
        spark.read.jdbc(url, table, props)
    }
  }

  /** Append rows to a JDBC table (created on first write). The reference's
    * INSERT OR IGNORE semantics live one level up (ScrapeJob.appendDedup
    * dedups against the existing keys before appending).
    */
  def writeTable(df: DataFrame, url: String, table: String,
      driver: Option[String] = None): Unit = {
    val props = new Properties()
    driver.foreach(props.setProperty("driver", _))
    df.write.mode(SaveMode.Append).jdbc(url, table, props)
  }
}
