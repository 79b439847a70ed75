package graft

import graft.ops.Spread

import org.apache.spark.sql.functions._

/** [[graft.ops.Spread.forAmplification]] — the under-partitioned-scan
  * guard in front of explode-amplifying stages (q279/q286/q231/q232's
  * sf10 lesson). The contract under test: (1) an input with fewer
  * partitions than defaultParallelism (and above the size floor) comes
  * back repartitioned to exactly defaultParallelism; (2) an input
  * already at-or-above parallelism is returned UNTOUCHED (same plan
  * object — no gratuitous exchange on a well-split 100 TB read); (3) an
  * input BELOW the engagement floor is returned untouched — at small
  * sizes the exchange costs more than the serialized map stage it would
  * parallelize (measured: +4.6 s over 26 sf0.1 text queries when the
  * cheap token explodes engaged unconditionally); (4) rows are preserved
  * bit-for-bit either way; (5) the explicit partition count survives AQE
  * (the coalescer must not shrink a pinned exchange back to the
  * serialized shape the guard exists to break).
  */
class SpreadSpec extends SparkSpec {

  private def ids(n: Int) = {
    import spark.implicits._
    (1 to n).map(i => (i.toLong, s"doc $i text")).toDF("id", "t")
  }

  test("under-partitioned input above the floor spreads to defaultParallelism") {
    val p = spark.sparkContext.defaultParallelism
    val one = ids(64).coalesce(1)
    assert(one.rdd.getNumPartitions === 1)
    val spread = Spread.forAmplification(one, 0L, col("id"))
    assert(spread.rdd.getNumPartitions === p)
    // rows unchanged
    assert(spread.orderBy("id").collect().toSeq ===
      one.orderBy("id").collect().toSeq)
  }

  test("input below the engagement floor passes through untouched") {
    // a 64-row frame is far below both floors: the guard must not pay an
    // exchange to parallelize sub-second work
    val one = ids(64).coalesce(1)
    assert(Spread.forAmplification(one, col("id")) eq one)
    assert(Spread.forHeavyAmplification(one, col("id")) eq one)
    // and the heavy floor is deliberately ~64x lower than the default
    assert(Spread.HeavyMinBytes * 64 === Spread.DefaultMinBytes)
  }

  test("well-partitioned input passes through untouched") {
    val p = spark.sparkContext.defaultParallelism
    val wide = ids(64).repartition(p + 2, col("id"))
    val out = Spread.forAmplification(wide, 0L, col("id"))
    // reference equality: the guard must not insert an exchange
    assert(out eq wide)
  }

  test("no-key form spreads too") {
    val one = ids(16).coalesce(1)
    val out = Spread.forAmplification(one, 0L)
    assert(out.rdd.getNumPartitions ===
      spark.sparkContext.defaultParallelism)
    assert(out.count() === 16)
  }

  test("pinned partition count survives AQE execution") {
    // run a real aggregate over the spread frame with AQE on and assert
    // the executed exchange kept the pinned count: the guard's explicit
    // numPartitions must not be coalesced down to 1-2 partitions by the
    // size-based coalescer (which cannot see downstream amplification)
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    try {
      val p = spark.sparkContext.defaultParallelism
      val spread = Spread.forAmplification(ids(64).coalesce(1), 0L, col("id"))
      // explode-amplify then aggregate, mirroring the guarded operators
      val out = spread
        .select(col("id"), explode(sequence(lit(1), lit(50))).as("k"))
        .groupBy("id").agg(count(lit(1)).as("n"))
      assert(out.filter(col("n") =!= 50).count() === 0)
      val shuffles = collectShuffleCounts(out.queryExecution.executedPlan)
      assert(shuffles.contains(p),
        s"expected a pinned $p-partition exchange, saw $shuffles")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  private def collectShuffleCounts(
      plan: org.apache.spark.sql.execution.SparkPlan): Seq[Int] = {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val expanded = plan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    expanded.collect {
      case s: ShuffleExchangeExec => s.outputPartitioning.numPartitions
    }
  }
}
