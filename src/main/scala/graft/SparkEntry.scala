package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY §2 (and the LLM-pipeline extensions)
  * registers one QueryDef in a QueryGroup; SQL-expressible ones also carry a
  * DuckDB oracle query with matching column names and row order.
  */
object SparkEntry {

  // private[graft]: tools.OperatorIndex generates the README query index
  // from the live registry (group membership -> defining file)
  private[graft] val groups: Seq[QueryGroup] = Seq(
    CoreQueries, JoinQueries, WindowQueries, ScalarQueries,
    TextQueries, DedupQueries, SimQueries, PipelineQueries, MlStreamQueries,
    WindowExtraQueries, GroupingQueries, CurationQueries, AnalyticsQueries,
    MonitoringQueries, StatsQueries)

  private lazy val all: Seq[QueryDef] = {
    val ds = groups.flatMap(_.defs)
    val dup = ds.groupBy(_.name).filter(_._2.size > 1).keys
    require(dup.isEmpty, s"duplicate query names: ${dup.mkString(", ")}")
    ds
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.q01PricingSummary.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
