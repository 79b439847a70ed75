package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.AsofJoin

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def t(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  test("asofBackward: latest right row at-or-before each left row, per key") {
    val left = Seq((1L, t(10), "L1"), (1L, t(25), "L2"), (2L, t(5), "L3"))
      .toDF("k", "lt", "tag")
    val right = Seq((1L, t(10), "a"), (1L, t(20), "b"), (2L, t(50), "c"))
      .toDF("k", "rt", "pay")
    val got = AsofJoin.asofBackward(left, right, "k", "lt", "rt", Seq("pay"))
      .select("tag", "asof_pay").as[(String, Option[String])].collect().toMap
    // equal timestamps match (right sorts before left); no earlier row -> null
    assert(got == Map("L1" -> Some("a"), "L2" -> Some("b"), "L3" -> None))
  }

  test("asofBackward: duplicate right timestamps resolve to the struct max") {
    val left = Seq((1L, t(30), "L")).toDF("k", "lt", "tag")
    val right = Seq((1L, t(10), "x"), (1L, t(10), "z"), (1L, t(10), "y"))
      .toDF("k", "rt", "pay")
    val got = AsofJoin.asofBackward(left, right, "k", "lt", "rt", Seq("pay"))
      .select("asof_pay").as[String].head()
    assert(got == "z")
  }

  test("asofBackward: preserves every left row and all left columns") {
    val left = Seq((1L, t(1), 100.0), (9L, t(2), 200.0)).toDF("k", "lt", "v")
    val right = Seq((1L, t(0), 1.0)).toDF("k", "rt", "w")
    val out = AsofJoin.asofBackward(left, right, "k", "lt", "rt", Seq("w"))
    assert(out.count() == 2)
    assert(out.columns.toSeq == Seq("k", "lt", "v", "asof_rt", "asof_w"))
  }

  test("intervalJoin: pairs bounded by the interval on an equi key") {
    val clicks = Seq((1L, t(0)), (1L, t(30)), (2L, t(0))).toDF("k", "ct")
    val views = Seq((1L, t(5)), (1L, t(11)), (1L, t(35)), (2L, t(20)))
      .toDF("k", "vt")
    val got = AsofJoin.intervalJoin(clicks, views, "k", "ct", "vt", "10 minutes")
      .select(unix_micros($"ct"), unix_micros($"vt")).as[(Long, Long)]
      .collect().toSet
    def us(m: Int) = t(m).getTime * 1000L
    // click@0 catches views@5; click@30 catches view@35; 11 min is outside
    // for click@0 but... 11 <= 0+10 is false; view@11 NOT matched
    assert(got == Set((us(0), us(5)), (us(30), us(35))))
  }
}
