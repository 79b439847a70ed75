package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Dedup

/** Window-shaped operators (SURVEY §2.5 W1-W5): deterministic keep-first
  * dedup, top-k per group, running aggregates.
  *
  * Scale note: every window here partitions by a key (one shuffle, no global
  * sort); none uses an unpartitioned ordered window, which would serialize on
  * a single task at 100 TB.
  */
object WindowQueries extends QueryGroup {

  /** W1: keep-first dedup under an explicit order column. */
  val q21DedupFirst = QueryDef(
    "q21_dedup_first",
    // (l_orderkey, l_linenumber) is NOT unique in the test data — the order
    // columns must form a total order within each key for determinism.
    (s, d) => Dedup.keepFirst(Tables.lineitem(s, d), Seq("l_orderkey"),
      Seq("l_linenumber", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice"))
      .groupBy("l_returnflag")
      .agg(
        sum(col("l_quantity").cast("decimal(28,2)")).cast("double").as("sum_qty"),
        count(lit(1)).as("cnt"))
      .orderBy("l_returnflag"),
    Some("""SELECT l_returnflag,
      CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty,
      COUNT(*) AS cnt
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY l_orderkey
              ORDER BY l_linenumber, l_partkey, l_suppkey, l_quantity, l_extendedprice) AS rn
            FROM lineitem) WHERE rn = 1
      GROUP BY l_returnflag ORDER BY l_returnflag NULLS FIRST"""))

  /** W4-flavored top-k per group: 3 richest customers per nation (ties broken
    * by key so the result is total-ordered). */
  val q22TopkPerGroup = QueryDef(
    "q22_topk_per_group",
    (s, d) => {
      val w = Window.partitionBy("c_nationkey")
        .orderBy(desc("c_acctbal"), asc("c_custkey"))
      Tables.customer(s, d)
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select("c_nationkey", "rk", "c_custkey", "c_acctbal")
        .orderBy("c_nationkey", "rk")
    },
    Some("""SELECT c_nationkey, CAST(rk AS INTEGER) AS rk, c_custkey, c_acctbal FROM (
      SELECT c_nationkey, c_custkey, c_acctbal,
        ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC) AS rk
      FROM customer) WHERE rk <= 3
      ORDER BY c_nationkey NULLS FIRST, rk"""))

  /** Running (cumulative) sum per customer over order dates — exact via
    * decimal, deterministic via the (date, key) total order. */
  val q23RunningSum = QueryDef(
    "q23_running_sum",
    (s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d)
        .withColumn("running_total",
          sum(col("o_totalprice").cast("decimal(28,2)")).over(w).cast("double"))
        .select("o_custkey", "o_orderkey", "running_total")
        .orderBy("o_custkey", "o_orderkey")
    },
    Some("""SELECT o_custkey, o_orderkey,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
      FROM orders ORDER BY o_custkey NULLS FIRST, o_orderkey"""))

  override val defs: Seq[QueryDef] = Seq(q21DedupFirst, q22TopkPerGroup, q23RunningSum)
}
