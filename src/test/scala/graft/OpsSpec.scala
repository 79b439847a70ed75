package graft

import org.apache.spark.sql.functions._

import graft.ops._
import graft.enrich.Province

/** Pins the pandas-semantics traps called out in SURVEY §7.4-1. */
class OpsSpec extends SparkSpec {
  import spark.implicits._

  test("P3: != True filter KEEPS nulls (null-safe <=>)") {
    val df = Seq(Some(true), Some(false), None).toDF("b")
    val kept = df.filter(Filters.notTrueKeepingNulls($"b")).collect().map(_.isNullAt(0))
    // false row + null row survive
    assert(kept.length == 2 && kept.count(identity) == 1)
  }

  test("F5: capitalize lowercases the tail (not initcap)") {
    val df = Seq("fOR rENT", "brussels CITY", "a").toDF("s")
    val got = df.select(TextOps.capitalize($"s")).as[String].collect().toSeq
    assert(got == Seq("For rent", "Brussels city", "A"))
  }

  test("F5: cleanCategory replaces underscores then capitalizes") {
    val got = Seq("GOOD_AS_NEW").toDF("s")
      .select(TextOps.cleanCategory($"s")).as[String].head()
    assert(got == "Good as new")
  }

  test("F1: urlTail takes last path segment after stripping trailing slashes") {
    val got = Seq("https://x.be/a/b/12345///").toDF("u")
      .select(TextOps.urlTail($"u")).as[String].head()
    assert(got == "12345")
  }

  test("A5: mode tie-break picks the SMALLEST value") {
    val df = Seq(3, 3, 1, 1, 2).toDF("v")
    assert(Aggregates.modeSmallest(df, "v").as[Int].head() == 1)
  }

  test("W1: keepFirst is deterministic under an order column") {
    val df = Seq((1, 10, "b"), (1, 5, "a"), (2, 7, "c")).toDF("k", "ord", "v")
    val got = Dedup.keepFirst(df, Seq("k"), Seq("ord"))
      .orderBy("k").select("v").as[String].collect().toSeq
    assert(got == Seq("a", "c"))
  }

  test("F15: province ranges are half-open [start, end)") {
    val df = Seq("1000", "1299", "1300", "9999", "10000", "999", "xx", null)
      .toDF("postal")
    val got = df.select(Province.fromPostalCode($"postal")).as[String].collect().toSeq
    assert(got == Seq("Brussels", "Brussels", "Brabant_Walloon", "East Flanders",
      null, null, null, null))
  }

  test("F11: nullToFalse implements intent (null -> false)") {
    val df = Seq(Some(true), None).toDF("b")
    val got = df.select(CastOps.nullToFalse($"b")).as[Boolean].collect().toSeq
    assert(got == Seq(true, false))
  }

  test("F13: winsorize clips into the exact-percentile bounds") {
    val df = (1 to 100).map(_.toDouble).toDF("x")
    val clipped = CastOps.winsorize(df, "x", 0.05, 0.95)
    val (mn, mx) = clipped.agg(min($"x"), max($"x")).as[(Double, Double)].head()
    assert(mn == 5.95 && mx == 95.05) // pandas-style linear interpolation
  }

  test("A11 scale path: approx_count_distinct within rsd of exact") {
    val li = Tables.lineitem(spark, sf001)
    val exact = li.select("l_partkey").distinct().count()
    val approx = graft.ops.Aggregates.approxDistinct(li, "l_partkey", rsd = 0.02)
    val err = math.abs(approx - exact).toDouble / exact
    assert(err < 0.05, s"approx=$approx exact=$exact err=$err")
  }

  test("A7 scale path: approx quantiles close to exact percentiles") {
    val o = Tables.orders(spark, sf001)
    val approx = graft.ops.Aggregates.approxQuantiles(
      o, "o_totalprice", Seq(0.25, 0.5, 0.75))
    val exact = o.agg(expr("percentile(o_totalprice, array(0.25, 0.5, 0.75))"))
      .head().getSeq[Double](0)
    approx.zip(exact).foreach { case (a, e) =>
      assert(math.abs(a - e) / e < 0.02, s"approx $a vs exact $e")
    }
  }

  test("stratified sample: per-stratum fractions roughly honored, no shuffle") {
    val li = Tables.lineitem(spark, sf001)
    val sampled = graft.ops.Aggregates.stratifiedSample(
      li, "l_returnflag", Map("A" -> 0.1, "N" -> 0.5, "R" -> 0.0))
    val got = sampled.groupBy("l_returnflag").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val base = li.groupBy("l_returnflag").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!got.contains("R"))
    assert(math.abs(got("A").toDouble / base("A") - 0.1) < 0.05)
    assert(math.abs(got("N").toDouble / base("N") - 0.5) < 0.1)
    assert(!sampled.queryExecution.executedPlan.toString().contains("Exchange"))
  }

  test("A1: cleanMissingData drops columns above the threshold") {
    val df = Seq((Some(1), None: Option[Int]), (Some(2), Some(3)))
      .toDF("keep", "mostly_null")
    val (pruned, dropped) = MissingData.cleanMissingData(df, 0.4)
    assert(dropped == Seq("mostly_null") && pruned.columns.toSeq == Seq("keep"))
  }

  test("GeoOps: Mercator distance Brussels->Antwerp ~ Mercator metres (not true km)") {
    val df = Seq((50.8503, 4.3517, 51.2194, 4.4025)).toDF("la1", "lo1", "la2", "lo2")
    val m = df.select(GeoOps.dist3395($"la1", $"lo1", $"la2", $"lo2")).as[Double].head()
    // true ground distance ~41.5 km; Mercator at ~51°N inflates by ~1.59x
    assert(m > 60000 && m < 70000)
  }

  test("Checks.run: one-pass suite reports metrics and pass flags incl. nulls") {
    import graft.ops.Checks
    val df = Seq(
      (Some(1L), Some("a"), 10.0),
      (Some(2L), None, 20.0),
      (Some(2L), Some("b"), 30.0),
      (None, Some("zz"), 40.0)).toDF("id", "cat", "v")
    val got = Checks.run(df, Seq(
      Checks.isComplete("id"),                       // 3/4 = 0.75 -> fail
      Checks.isUnique("id"),                         // 2 distinct / 3 -> fail
      Checks.minAtLeast("v", 5.0),                   // 10 >= 5 -> pass
      Checks.maxAtMost("v", 35.0),                   // 40 > 35 -> fail
      Checks.isContainedIn("cat", Seq("a", "b"))))   // 2/3 non-null -> fail
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(2), r.getBoolean(4))).toMap
    assert(got(("completeness", "id")) == (0.75, false))
    assert(got(("uniqueness", "id"))._2 == false)
    assert(got(("min_at_least", "v")) == (10.0, true))
    assert(got(("max_at_most", "v")) == (40.0, false))
    assert(math.abs(got(("membership_rate", "cat"))._1 - 0.666667) < 1e-6)
    // the whole suite is ONE scan: a single leaf in the plan
    val plan = Checks.run(df, Seq(Checks.isComplete("id"), Checks.isUnique("id")))
      .queryExecution.executedPlan
    assert(plan.collectLeaves().size == 1, "check suite re-scanned the input")
  }

  test("Checks.skewReport: hot key surfaces with the right skew factor") {
    import graft.ops.Checks
    val df = (Seq.fill(90)("hot") ++ Seq("a", "b", "c", "d", "e",
      "f", "g", "h", "i", "j")).toDF("k")
    val r = Checks.skewReport(df, "k").collect().head
    assert(r.getAs[Long]("n_rows") == 100L && r.getAs[Long]("n_keys") == 11L)
    assert(r.getAs[Long]("max_key_rows") == 90L)
    assert(r.getAs[String]("hottest_key") == "hot")
    // mean = 100/11; skew = 90/(100/11) = 9.9
    assert(math.abs(r.getAs[Double]("skew_factor") - 9.9) < 1e-6)
  }

  test("Checks.kAnonymityAudit: counts violating groups/rows, NULL QI is " +
      "its own auditable group") {
    // groups: (a,1)x5 safe, (a,2)x2 at risk, (b,1)x1 at risk, (null,1)x3 at risk
    val df = (Seq.fill(5)(("a", Some(1))) ++ Seq.fill(2)(("a", Some(2)))
      ++ Seq(("b", Some(1))) ++ Seq.fill(3)((null: String, Some(1))))
      .toDF("seg", "grp")
    val r = Checks.kAnonymityAudit(df, Seq(col("seg"), col("grp")), k = 5)
      .collect().head
    assert(r.getAs[Long]("n_rows") == 11L)
    assert(r.getAs[Long]("n_groups") == 4L)
    assert(r.getAs[Long]("n_violating_groups") == 3L)
    assert(r.getAs[Long]("rows_at_risk") == 6L)
    assert(r.getAs[Long]("min_group_size") == 1L)
    assert(math.abs(r.getAs[Double]("suppressed_frac") - 6.0 / 11) < 1e-6)
  }

  test("Checks.lDiversityAudit: flags constant-sensitive groups regardless " +
      "of size; NULL sensitive values are not a distinct value") {
    // (a): 5 rows, sensitive all 7 -> d=1, at risk despite size
    // (b): 3 rows, sensitive {1,2,3} -> d=3, safe
    // (c): 2 rows, sensitive {4, NULL} -> d=1 (NULL not counted), at risk
    val df = (Seq.fill(5)(("a", Some(7))) ++
      Seq(("b", Some(1)), ("b", Some(2)), ("b", Some(3))) ++
      Seq(("c", Some(4)), ("c", None))).toDF("seg", "sens")
    val r = Checks.lDiversityAudit(df, Seq(col("seg")), col("sens"), l = 3)
      .collect().head
    assert(r.getAs[Long]("n_rows") == 10L)
    assert(r.getAs[Long]("n_groups") == 3L)
    assert(r.getAs[Long]("n_violating_groups") == 2L)
    assert(r.getAs[Long]("rows_at_risk") == 7L)
    assert(r.getAs[Long]("min_diversity") == 1L)
  }

  test("Checks.dpNoisyCounts: noise is seeded-deterministic, mean-zero-ish, " +
      "and scales as 1/eps") {
    val df = (1 to 100).map(i => ("g" + (i % 10), i)).toDF("g", "v")
    val a = Checks.dpNoisyCounts(df, Seq("g"), eps = 0.5).collect()
      .map(r => r.getAs[String]("g") -> r.getAs[Double]("noisy_n")).toMap
    val b = Checks.dpNoisyCounts(df, Seq("g"), eps = 0.5).collect()
      .map(r => r.getAs[String]("g") -> r.getAs[Double]("noisy_n")).toMap
    assert(a == b) // identical release on re-run — deterministic by seed
    val tight = Checks.dpNoisyCounts(df, Seq("g"), eps = 5.0).collect()
      .map(r => math.abs(r.getAs[Double]("noisy_n") - r.getAs[Long]("n")))
    val loose = Checks.dpNoisyCounts(df, Seq("g"), eps = 0.5).collect()
      .map(r => math.abs(r.getAs[Double]("noisy_n") - r.getAs[Long]("n")))
    // same per-key uniforms, scale 1/eps: each loose residual is exactly
    // 10x its tight twin (up to the round-6 of the released value)
    assert(tight.zip(loose).forall { case (t, l) => math.abs(l - 10 * t) < 1e-4 })
    // a different seed moves the release
    val s2 = Checks.dpNoisyCounts(df, Seq("g"), eps = 0.5, seed = "43")
      .collect().map(r => r.getAs[String]("g") -> r.getAs[Double]("noisy_n")).toMap
    assert(s2 != a)
  }
}
