package graft

import org.apache.spark.sql.functions._

import graft.io.Bucketing

/** Bucketed co-located join: the one-time bucketed write buys every later
  * join on the key a shuffle-free plan.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  private def dropWithLocation(table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new java.io.File(s"spark-warehouse/$table")
    def del(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(del)); f.delete(): Unit
    }
    if (loc.exists()) del(loc)
  }

  test("joining two same-bucketed tables plans no Exchange") {
    dropWithLocation("b_orders")
    dropWithLocation("b_lineitem")
    val orders = Tables.orders(spark, sf001)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = Tables.lineitem(spark, sf001)
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
    Bucketing.writeBucketed(orders, "b_orders", "o_orderkey", buckets = 8)
    Bucketing.writeBucketed(lineitem, "b_lineitem", "o_orderkey", buckets = 8)

    // force the non-broadcast path: bucketing matters exactly when the
    // tables are too big to broadcast, which sf0.001 is not
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.bucketedJoin(spark, "b_orders", "b_lineitem", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString()
      assert(plan.contains("SortMergeJoin"), s"expected sort-merge join:\n$plan")
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")

      // and it computes the same result as the plain (shuffling) join
      val expected = orders.join(lineitem, Seq("o_orderkey")).count()
      assert(joined.count() == expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)

    dropWithLocation("b_orders")
    dropWithLocation("b_lineitem")
  }
}
