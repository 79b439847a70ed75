package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.{EventAnalytics, PageRank}

/** Unit semantics for the event-analytics + graph operators (q137-q140). */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private val ts = (m: Int) => Timestamp.valueOf(f"2024-01-01 0${m / 60}%d:${m % 60}%02d:00")

  test("pagerank: ring graph converges to uniform ranks; mass sums to 1") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("src", "dst")
    val ranks = PageRank.run(edges, iterations = 5).as[(String, Double)]
      .collect().toMap
    // symmetric out-degree-1 cycle: stationary distribution is uniform
    ranks.values.foreach(r => assert(math.abs(r - 1.0 / 3) < 1e-9))
    assert(math.abs(ranks.values.sum - 1.0) < 1e-9)
  }

  test("pagerank: a sink-heavy star ranks the hub above the leaves") {
    val edges = Seq(("l1", "hub"), ("l2", "hub"), ("l3", "hub"),
      ("hub", "l1")).toDF("src", "dst")
    val ranks = PageRank.run(edges, iterations = 10).as[(String, Double)]
      .collect().toMap
    assert(ranks("hub") > ranks("l2") && ranks("hub") > ranks("l3"))
  }

  test("resample+ffill: empty cells fill from the last populated cell, raw stays null") {
    val ev = Seq(
      (1L, ts(5), 10.0),   // hour 0 -> bucket 0
      (1L, ts(10), 30.0),  // hour 0 (max wins)
      (1L, ts(185), 7.0))  // hour 3 -> two empty cells between
      .toDF("user_id", "ts", "value")
      .withColumn("ts", col("ts"))
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime / 1000
    val got = EventAnalytics.resampleFfill(ev, "user_id", "ts", "value", 3600L)
      .orderBy("bucket")
      .select("bucket", "v", "v_ffill")
      .as[(Long, Option[Double], Double)].collect().toSeq
    assert(got == Seq(
      (base, Some(30.0), 30.0),
      (base + 3600, None, 30.0),
      (base + 7200, None, 30.0),
      (base + 10800, Some(7.0), 7.0)))
  }

  test("funnel: steps must occur strictly in order per entity") {
    val ev = Seq(
      // u1: full ordered funnel
      (1L, "view", ts(1)), (1L, "click", ts(2)), (1L, "purchase", ts(3)),
      // u2: purchase BEFORE click -> stops at click
      (2L, "view", ts(1)), (2L, "purchase", ts(2)), (2L, "click", ts(3)),
      // u3: never views -> counts in no step
      (3L, "click", ts(1)))
      .toDF("user_id", "event_type", "ts")
    val got = EventAnalytics.funnel(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .orderBy("step")
      .as[(Int, String, Long, Double)].collect().toSeq
    assert(got == Seq(
      (1, "view", 2L, round(2.0 / 3)),
      (2, "click", 2L, 1.0),
      (3, "purchase", 1L, 0.5)))
  }

  test("cohort retention: offsets are relative to each entity's first week") {
    val wk = (w: Int, d: Int) => new Timestamp(
      (19723L + w * 7 + d) * 86400L * 1000L) // epoch-day aligned
    val ev = Seq(
      (1L, wk(0, 0)), (1L, wk(0, 1)), (1L, wk(2, 0)), // cohort w, offsets 0,0,2
      (2L, wk(1, 0)), (2L, wk(2, 0)))                 // cohort w+1, offsets 0,1
      .toDF("user_id", "ts")
    val got = EventAnalytics.cohortRetention(ev, "user_id", "ts")
      .orderBy("cohort_week", "offset_weeks")
      .as[(Long, Long, Long)].collect().toSeq
    val offsets = got.map { case (_, off, n) => (off, n) }
    assert(offsets == Seq((0L, 1L), (2L, 1L), (0L, 1L), (1L, 1L)))
  }

  private def round(x: Double): Double = math.round(x * 1e6) / 1e6
}
