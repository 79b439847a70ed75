package graft

import org.apache.spark.sql.functions._

/** Runtime skew handling: the README claims AQE skew-join splitting covers
  * skewed JOINS (ops.Skew covers skewed aggregations) — pin it: a join with
  * one hot key must come out of AQE with its skewed partition split
  * (`skew=true` in the final sort-merge join).
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  private def withConfs(confs: (String, String)*)(body: => Unit): Unit = {
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("AQE splits the hot partition of a skewed sort-merge join") {
    // 95% of the big side lands on key 0; the dim side is uniform
    val big = spark.range(0, 300000)
      .select(when($"id" % 20 =!= 0, lit(0L)).otherwise($"id" % 1000).as("k"),
        $"id".as("payload"))
    val dim = spark.range(0, 1000).select($"id".as("k"), ($"id" * 2).as("w"))
    withConfs(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "65536",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val joined = big.join(dim, Seq("k"))
      // AQE finalizes THIS df's physical plan only when it executes itself
      // (count() would build a separate QueryExecution) — collect, then look
      assert(joined.collect().length == 300000)
      val plan = joined.queryExecution.executedPlan.toString()
      assert(plan.contains("skew=true"),
        s"AQE did not mark/split the skewed partition:\n${plan.take(2000)}")
    }
  }
}
