package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Aggregates.decSum

/** Multi-level grouping beyond the reference's single-key groupBys: rollup,
  * cube, pivot — completing the general-analytics surface. Null ordering is
  * aligned explicitly (Spark defaults NULLS FIRST asc, DuckDB NULLS LAST).
  */
object GroupingQueries extends QueryGroup {

  /** ROLLUP over (year, priority): per-group, per-year subtotal, grand total. */
  val q36Rollup = QueryDef(
    "q36_rollup",
    (s, d) => Tables.orders(s, d)
      .withColumn("y", year(col("o_orderdate")))
      .rollup("y", "o_orderpriority")
      // gid makes the sort TOTAL: a (NULL, NULL) DATA group (rows whose
      // date and priority are genuinely null) collides with the y=NULL
      // subtotal and the grand total on every other sort key
      .agg(grouping_id().cast("int").as("gid"),
        count(lit(1)).as("cnt"), decSum(col("o_totalprice")).as("sum_price"))
      .orderBy(asc_nulls_first("y"), asc_nulls_first("o_orderpriority"),
        asc("gid")),
    Some("""SELECT CAST(year(o_orderdate) AS INT) AS y, o_orderpriority,
        CAST(GROUPING(y) * 2 + GROUPING(o_orderpriority) AS INT) AS gid,
        COUNT(*) AS cnt,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS sum_price
      FROM orders GROUP BY ROLLUP(y, o_orderpriority)
      ORDER BY y ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST, gid ASC"""))

  /** CUBE over (returnflag, linestatus) with grouping-set id. */
  val q37Cube = QueryDef(
    "q37_cube",
    (s, d) => Tables.lineitem(s, d)
      .cube("l_returnflag", "l_linestatus")
      .agg(
        grouping_id().cast("int").as("gid"),
        count(lit(1)).as("cnt"),
        decSum(col("l_quantity")).as("sum_qty"))
      .orderBy(asc("gid"), asc_nulls_first("l_returnflag"),
        asc_nulls_first("l_linestatus")),
    Some("""SELECT l_returnflag, l_linestatus,
        CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS INT) AS gid,
        COUNT(*) AS cnt,
        CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty
      FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
      ORDER BY gid ASC, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"""))

  /** Pivot on linestatus (fixed value list ⇒ stable schema both sides). */
  val q38Pivot = QueryDef(
    "q38_pivot",
    (s, d) => Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(decSum(col("l_extendedprice")))
      .orderBy("l_returnflag"),
    Some("""SELECT l_returnflag,
        CAST(SUM(CAST(CASE WHEN l_linestatus = 'F' THEN l_extendedprice END AS DECIMAL(28,2))) AS DOUBLE) AS F,
        CAST(SUM(CAST(CASE WHEN l_linestatus = 'O' THEN l_extendedprice END AS DECIMAL(28,2))) AS DOUBLE) AS O
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag NULLS FIRST"""))

  /** Explicit GROUPING SETS — the à-la-carte sibling of q36's ROLLUP /
    * q37's CUBE: exactly (year × status), (year) and grand total, no
    * unwanted (status) set, with the grouping-id disambiguator. */
  val q212GroupingSets = QueryDef(
    "q212_grouping_sets",
    (s, d) => Tables.orders(s, d)
      .withColumn("y", year(col("o_orderdate")))
      .groupingSets(
        Seq(Seq(col("y"), col("o_orderstatus")), Seq(col("y")), Seq()),
        col("y"), col("o_orderstatus"))
      .agg(
        grouping_id().cast("int").as("gid"),
        count(lit(1)).as("cnt"),
        decSum(col("o_totalprice")).as("sum_price"))
      .orderBy(asc("gid"), asc_nulls_first("y"),
        asc_nulls_first("o_orderstatus")),
    Some("""SELECT CAST(year(o_orderdate) AS INT) AS y, o_orderstatus,
        CAST(GROUPING(y) * 2 + GROUPING(o_orderstatus)
          AS INT) AS gid,
        COUNT(*) AS cnt,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS sum_price
      FROM orders
      GROUP BY GROUPING SETS ((y, o_orderstatus), (y), ())
      ORDER BY gid ASC, y ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST"""))

  override val defs: Seq[QueryDef] = Seq(q36Rollup, q37Cube, q38Pivot,
    q212GroupingSets)
}
