package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.enrich.Province
import graft.ingest.LinkState
import graft.ops.{CastOps, Dedup}

/** Property-based invariants (SURVEY §5.4) via plain ScalaCheck. */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def check(name: String, p: Prop, n: Int = 10): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n).withWorkers(1), p)
    assert(res.passed, s"$name: ${res.status}")
  }

  test("province: ints in [1000,10000) map to a province; outside to null") {
    check("province-cover", Prop.forAll(Gen.chooseNum(-500, 12000)) { p =>
      val got = Seq(p.toString).toDF("postal")
        .select(Province.fromPostalCode($"postal")).as[String].head()
      if (p >= 1000 && p < 10000) got != null else got == null
    }, n = 25)
  }

  test("winsorize: output within learned bounds, count preserved") {
    check("winsorize", Prop.forAll(
      Gen.listOfN(40, Gen.chooseNum(-1e6, 1e6)).suchThat(_.size >= 2)) { xs =>
      val df = xs.toDF("x")
      val out = CastOps.winsorize(df, "x", 0.05, 0.95)
      val Array(lo, hi) = df.agg(expr("percentile(x, array(0.05, 0.95))"))
        .head().getSeq[Double](0).toArray
      out.count() == xs.size &&
        out.filter($"x" < lo - 1e-9 || $"x" > hi + 1e-9).count() == 0
    }, n = 5)
  }

  test("keepFirst: idempotent, keys unique afterwards") {
    check("keepFirst", Prop.forAll(
      Gen.listOfN(30, Gen.zip(Gen.chooseNum(0, 5), Gen.chooseNum(0, 1000)))
        .suchThat(_.nonEmpty)) { pairs =>
      val df = pairs.zipWithIndex.map { case ((k, v), i) => (k, v, i) }
        .toDF("k", "v", "ord")
      val once = Dedup.keepFirst(df, Seq("k"), Seq("ord"))
      val twice = Dedup.keepFirst(once, Seq("k"), Seq("ord"))
      once.collect().toSet == twice.collect().toSet &&
        once.groupBy("k").count().filter($"count" > 1).count() == 0
    }, n = 5)
  }

  test("link snapshot trichotomy: urls partition into pending/inactive exactly once") {
    val t = java.sql.Timestamp.valueOf("2024-06-01 00:00:00")
    val base = "https://x.be/classified/house/for-sale/a/1000/"
    check("link-trichotomy", Prop.forAll(
      Gen.listOfN(12, Gen.chooseNum(1, 30)),
      Gen.listOfN(12, Gen.chooseNum(1, 30))) { (prev, next) =>
      val links0 = LinkState.applySnapshot(
        LinkState.emptyLinks(spark), prev.map(i => base + i).toDF("url"), t)
      val links1 = LinkState.applySnapshot(
        links0, next.map(i => base + i).toDF("url"), t)
      val expected = (prev ++ next).map(i => base + i).toSet
      val got = links1.select("url").as[String].collect()
      val st = links1.select("url", "status").as[(String, String)].collect().toMap
      got.toSet == expected && got.length == expected.size &&
        (prev.toSet -- next.toSet).forall(i => st(base + i) == "inactive") &&
        next.toSet.forall(i => st(base + i) == "pending")
    }, n = 5)
  }

  test("ngram Jaccard stop-shingle cap: capped pairs are a subset of " +
      "uncapped, and exact when no shingle exceeds the cap") {
    val words = Gen.listOfN(8, Gen.oneOf("cat", "dog", "sat", "mat", "ran", "the"))
      .map(_.mkString(" "))
    check("jaccard-cap", Prop.forAll(Gen.listOfN(6, words)) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      def pairs(cap: Int) = graft.text.DedupOps
        .ngramJaccardPairs(df, "doc_id", $"text", 2, 0.05, maxShingleDf = cap)
        .select("d1", "d2", "jaccard").as[(Long, Long, Double)].collect().toSet
      val uncapped = pairs(Int.MaxValue)
      // cap above any possible df (6 docs) -> identical (values included)
      val loose = pairs(6)
      // aggressive cap -> conservative: pair set shrinks, sims never grow
      val tight = pairs(2)
      val uncappedByPair = uncapped.map { case (a, b, j) => (a, b) -> j }.toMap
      loose == uncapped && tight.forall { case (a, b, j) =>
        uncappedByPair.get((a, b)).exists(j <= _ + 1e-9)
      }
    }, n = 5)
  }

  test("ngram containment equals the set-arithmetic reference on random docs") {
    val words = Gen.listOfN(8, Gen.oneOf("cat", "dog", "sat", "mat", "ran", "the"))
      .map(_.mkString(" "))
    check("containment-ref", Prop.forAll(Gen.listOfN(5, words)) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = graft.text.DedupOps
        .ngramContainmentPairs(df, "doc_id", $"text", 2, 0.0)
        .select("src", "dst", "containment").as[(Long, Long, Double)]
        .collect().map { case (s, d, c) => (s, d) -> c }.toMap
      def sh(t: String): Set[String] =
        t.split(" ").sliding(2).map(_.mkString(" ")).toSet
      val ref = (for {
        (a, i) <- texts.zipWithIndex; (b, j) <- texts.zipWithIndex
        if i != j; inter = sh(a).intersect(sh(b)).size if inter > 0
      } yield (i.toLong, j.toLong) ->
        math.round(inter.toDouble / sh(a).size * 1e6) / 1e6).toMap
      got == ref
    }, n = 5)
  }

  test("target-encode transform preserves row count (left-join semantics)") {
    check("target-encode", Prop.forAll(Gen.listOfN(25,
      Gen.zip(Gen.oneOf("A", "B", "C", "Z"), Gen.chooseNum(0.0, 1e6)))
      .suchThat(_.nonEmpty)) { rows =>
      val df = rows.toDF("cat", "target")
      val m = new graft.encode.TargetEncoder()
        .setInputCol("cat").setTargetCol("target").fit(df)
      m.transform(df).count() == rows.size
    }, n = 5)
  }
  test("canonicalizeUrl is idempotent and drops only tracking params") {
    import graft.text.UrlOps
    val genUrl = for {
      scheme <- Gen.oneOf("http", "HTTP", "https", "HTTPS")
      www <- Gen.oneOf("", "www.", "WWW.")
      host <- Gen.oneOf("Example.COM", "docs.example.org", "a.b.C.net")
      port <- Gen.oneOf("", ":80", ":443")
      path <- Gen.oneOf("", "/A/b", "/x", "/x/")
      params <- Gen.someOf(Seq("a=1", "b=2", "utm_source=x", "gclid=9", "z=3"))
      frag <- Gen.oneOf("", "#f")
    } yield {
      val q = if (params.isEmpty) "" else "?" + params.mkString("&")
      s"$scheme://$www$host$port$path$q$frag"
    }
    check("url-canon", Prop.forAll(genUrl) { u =>
      val once = Seq(u).toDF("u")
        .select(UrlOps.canonicalizeUrl($"u")).as[String].head()
      val twice = Seq(once).toDF("u")
        .select(UrlOps.canonicalizeUrl($"u")).as[String].head()
      val nonTracking = Seq("a=1", "b=2", "z=3").filter(u.contains)
      twice == once &&
        // scheme/host lowered; path case preserved
        once == once.toLowerCase(java.util.Locale.ROOT).replace("/a/b", "/A/b") &&
        nonTracking.forall(once.contains) &&
        !once.contains("utm_") && !once.contains("gclid") &&
        !once.contains("#")
    }, n = 40)
  }

  test("paragraphDedup: output never repeats a paragraph corpus-wide; payload shrinks") {
    import graft.text.DedupOps
    val genDocs = Gen.listOfN(12, Gen.listOfN(3,
      Gen.oneOf("aa", "bb", "cc", "dd", "ee")))
    check("para-dedup", Prop.forAll(genDocs) { paraLists =>
      val docs = paraLists.zipWithIndex
        .map { case (ps, i) => (i.toLong, ps.mkString(". ")) }
        .toDF("doc_id", "text")
      val out = DedupOps.paragraphDedup(docs, "doc_id", $"text")
        .as[(Long, String)].collect()
      val allParas = out.flatMap(_._2.split("\\. "))
      // every distinct paragraph survives exactly once, somewhere
      allParas.length == allParas.distinct.length &&
        allParas.toSet == paraLists.flatten.toSet
    }, n = 15)
  }

  test("chunkPlan: spans tile the stream payload exactly") {
    import graft.text.Packing
    val genSizes = Gen.listOfN(10, Gen.chooseNum(0L, 9000L))
    check("chunk-pack", Prop.forAll(genSizes) { sizes =>
      val docs = sizes.zipWithIndex.map { case (sz, i) => ("s", i.toLong, sz) }
        .toDF("source", "doc_id", "sz")
      val rows = Packing.chunkPlan(docs, "source", "doc_id", $"sz", 4096L)
        .orderBy("doc_id")
        .select($"start_off", $"chunk_first", $"chunk_last")
        .as[(Long, Long, Long)].collect()
      // offsets are the prefix sums; chunk ids consistent with offsets
      val prefix = sizes.scanLeft(0L)(_ + _)
      rows.zipWithIndex.forall { case ((off, cf, cl), i) =>
        off == prefix(i) && cf == off / 4096 &&
          cl == (if (sizes(i) > 0) (off + sizes(i) - 1) / 4096 else off / 4096) &&
          cl >= cf
      }
    }, n = 15)
  }

  test("chunkSliding: stride prefixes + final chunk reconstruct the document") {
    import graft.text.Packing
    val genText = Gen.choose(1, 900).flatMap(n =>
      Gen.listOfN(n, Gen.alphaChar).map(_.mkString))
    check("chunk-sliding", Prop.forAll(genText) { text =>
      val chunks = Packing.chunkSliding(
          Seq((1L, text)).toDF("doc_id", "text"), "doc_id", $"text", 64, 48)
        .orderBy("chunk_idx").select("chunk_text").as[String].collect()
      val rebuilt = chunks.init.map(_.take(48)).mkString + chunks.last
      rebuilt == text &&
        chunks.init.forall(_.length == 64) &&       // only the tail is short
        chunks.init.zip(chunks.tail).forall {       // 16-char overlap
          case (a, b) => a.drop(48) == b.take(a.length - 48)
        }
    }, n = 20)
  }

  test("BPE: merges learned from any corpus segment any word losslessly") {
    import graft.text.Bpe
    val word = Gen.choose(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
    val genCorpus = Gen.listOfN(8, Gen.listOfN(4, word).map(_.mkString(" ")))
    check("bpe-lossless", Prop.forAll(genCorpus, word) { (texts, probe) =>
      val merges = Bpe.learnMerges(texts.toDF("text"), $"text", 5)
      // every merge concatenates adjacent symbols, so concatenating the
      // encoded segments of ANY word (seen or not) reconstructs it exactly
      val enc = Bpe.encode(Seq(probe).toDF("text"), $"text", merges)
        .select("bpe_tokens").as[Seq[String]].head()
      enc.mkString == probe + "</w>" &&
        merges.map(_._3) == merges.map(_._3).sorted.reverse
    }, n = 8)
  }

  test("lengthBuckets: bucket is the least power of two >= max(n, 16), " +
      "including exact powers of two past 2^29 where ln-based log2 overshoots") {
    import graft.text.Packing
    val ns = (Seq(1L, 15L, 16L, 17L, 536870912L /* 2^29 */, (1L << 31),
      (1L << 39), (1L << 39) + 1) ++
      (1 to 40).map(k => (1L << (k % 45)) + k)).distinct
    val got = Packing.lengthBuckets(ns.toDF("n"), col("n"), minBucket = 16)
      .select("bucket", "n_docs")
      .as[(Long, Long)].collect().toMap
    def ref(n: Long): Long = {
      var b = 16L; while (b < n) b <<= 1; b
    }
    val expect = ns.groupBy(ref).map { case (b, xs) => b -> xs.size.toLong }
    assert(got == expect, s"got=$got expect=$expect")
  }

  test("stratifiedAllocation: quota property — every target within 1 of its " +
      "exact share, totals sum to k") {
    import graft.text.Curation
    val stratGen = Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c", "d", "e"))
      .suchThat(_.nonEmpty)
    check("hamilton-quota", Prop.forAll(stratGen, Gen.choose(0, 12)) { (ss, k0) =>
      val k = math.min(k0, ss.size) // contract: k <= total
      val df = ss.toDF("s")
      val alloc = Curation.stratifiedAllocation(df, "s", k)
        .as[(String, Long, Long)].collect().toSeq
      val total = ss.size.toLong
      val quota = alloc.forall { case (_, n, t) =>
        val exact = n.toDouble * k / total
        t >= math.floor(exact) && t <= math.ceil(exact)
      }
      quota && alloc.map(_._3).sum == k.toLong && alloc.forall(_._3 >= 0)
    }, n = 12)
  }

  test("budgetWaterfill: allocations respect caps, exhaust min(B, total), " +
      "and unsaturated sources share one water level") {
    import graft.text.Curation
    val srcGen = Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, for {
      a <- Gen.choose(0, 500); w <- Gen.choose(1, 9)
    } yield (a.toDouble, w.toDouble)))
    check("waterfill", Prop.forAll(srcGen, Gen.choose(0L, 2500L)) { (ss, b) =>
      val df = ss.zipWithIndex.map { case ((a, w), i) => (s"s$i", a, w) }
        .toDF("source", "a", "w")
      val got = Curation.budgetWaterfill(df, "source", $"a", $"w", b)
        .as[(String, Double, Double, Boolean, Double)].collect().toSeq
      val capped = got.forall { case (_, a, _, _, alloc) => alloc <= a + 1e-6 }
      val nonneg = got.forall(_._5 >= -1e-6)
      val target = math.min(b.toDouble, ss.map(_._1).sum)
      // each of <=8 allocations rounds to 6 decimals -> tolerance ~4e-6
      val exhaust = math.abs(got.map(_._5).sum - target) < 1e-4
      val levels = got.collect { case (_, _, w, false, alloc) => alloc / w }
      val oneLevel = levels.isEmpty ||
        (levels.max - levels.min) < 1e-5 * math.max(1.0, levels.max.abs)
      capped && nonneg && exhaust && oneLevel
    }, n = 30)
  }

  test("ksStatistic: symmetric, bounded in [0,1], zero on identical samples") {
    import graft.ops.Drift
    val valsGen = Gen.nonEmptyListOf(Gen.chooseNum(-50, 50)).map(_.map(_.toDouble))
    check("ks-props", Prop.forAll(valsGen, valsGen) { (xs, ys) =>
      val a = xs.toDF("v"); val b = ys.toDF("v")
      val ab = Drift.ksStatistic(a, b, $"v", partitions = 4)
        .as[(Long, Long, Double)].head()
      val ba = Drift.ksStatistic(b, a, $"v", partitions = 4)
        .as[(Long, Long, Double)].head()
      val aa = Drift.ksStatistic(a, a, $"v", partitions = 4)
        .as[(Long, Long, Double)].head()
      ab._3 == ba._3 && ab._3 >= 0.0 && ab._3 <= 1.0 && aa._3 == 0.0
    }, n = 8)
  }

  test("charEntropy: bounded by log2(distinct chars); permutation-invariant") {
    import graft.text.TextAnalysis
    val textGen = Gen.listOf(Gen.oneOf('a', 'b', 'c', 'x')).map(_.mkString)
    check("entropy-bounds", Prop.forAll(textGen) { t =>
      val Seq(h, hShuf) = Seq(t, scala.util.Random.shuffle(t.toList).mkString)
        .toDF("t").select(TextAnalysis.charEntropy(col("t")).as("e"))
        .as[Double].collect().toSeq
      val k = t.toSet.size
      // charEntropy rounds to 6 decimals (TextAnalysis.charEntropy), so a
      // uniform input can exceed log2(k) by up to half the rounding quantum
      // (5e-7). Slack must cover that, not just float epsilon.
      val bound = if (k <= 1) 0.0 else math.log(k) / math.log(2.0) + 5.1e-7
      h >= 0.0 && h <= bound && h == hShuf // entropy ignores char order
    }, n = 15)
  }

  test("aucRankSum: bounded in [0,1]; negating scores complements AUC exactly " +
      "(average ranks make this exact even under ties)") {
    import graft.ops.Stats
    val rowGen = Gen.listOfN(30,
      Gen.zip(Gen.chooseNum(-5, 5), Gen.oneOf(true, false)))
      .suchThat(rs => rs.exists(_._2) && rs.exists(!_._2))
    check("auc-props", Prop.forAll(rowGen) { rs =>
      val df = rs.map { case (s, y) => (s.toDouble, y) }.toDF("s", "y")
      val a = Stats.aucRankSum(df, $"s", $"y", partitions = 4)
        .select("auc").as[Double].head()
      val neg = Stats.aucRankSum(df.withColumn("s", -$"s"), $"s", $"y",
        partitions = 4).select("auc").as[Double].head()
      a >= 0.0 && a <= 1.0 && math.abs((a + neg) - 1.0) <= 2e-6 // 2x round(6)
    }, n = 6)
  }

  test("giniConcentration: bounded in [0, 1-1/n]; invariant under group renames") {
    import graft.ops.Stats
    val gen = Gen.listOfN(40, Gen.chooseNum(0, 9))
    check("gini-props", Prop.forAll(gen) { ks =>
      val df = ks.map(k => s"g$k").toDF("g")
      val (n, _, g) = Stats.giniConcentration(df, $"g")
        .as[(Long, Long, Double)].head()
      val renamed = ks.map(k => s"zz${9 - k}").toDF("g") // bijective rename
      val g2 = Stats.giniConcentration(renamed, $"g")
        .as[(Long, Long, Double)].head()._3
      g >= 0.0 && g <= 1.0 - 1.0 / n + 1e-9 && g == g2
    }, n = 6)
  }

  test("cohenKappa: symmetric in the raters; kappa <= 1; self-agreement is 1 " +
      "when 2+ categories") {
    import graft.ops.Stats
    val gen = Gen.listOfN(25, Gen.zip(Gen.oneOf("x", "y", "z"), Gen.oneOf("x", "y", "z")))
    check("kappa-props", Prop.forAll(gen) { rs =>
      val df = rs.toDF("a", "b")
      def k(d: org.apache.spark.sql.DataFrame) =
        Stats.cohenKappa(d, col("a"), col("b")).collect().head
      val ab = k(df)
      val ba = k(df.select($"b".as("a"), $"a".as("b")))
      val swapOk = ab.isNullAt(3) == ba.isNullAt(3) &&
        (ab.isNullAt(3) || ab.getDouble(3) == ba.getDouble(3))
      val self = k(df.select($"a", $"a".as("b")))
      val selfOk = if (rs.map(_._1).distinct.size >= 2)
        !self.isNullAt(3) && self.getDouble(3) == 1.0
      else self.isNullAt(3) // pe = 1: kappa undefined
      val boundOk = ab.isNullAt(3) || ab.getDouble(3) <= 1.0 + 1e-9
      swapOk && selfOk && boundOk
    }, n = 6)
  }

  test("calibrationCurve: bucket counts sum to input size; rates within [0,1]; " +
      "Brier within [0,1]") {
    import graft.ops.Stats
    val gen = Gen.listOfN(30, Gen.zip(Gen.chooseNum(0, 999), Gen.oneOf(true, false)))
    check("calibration-props", Prop.forAll(gen) { rs =>
      val df = rs.map { case (s, y) => (s / 1000.0, y) }.toDF("s", "y")
      val rows = Stats.calibrationCurve(df, $"s", $"y")
        .as[(Long, Long, Double, Double, Double)].collect()
      rows.map(_._2).sum == rs.size &&
        rows.forall(r => r._4 >= 0.0 && r._4 <= 1.0) &&
        rows.forall(r => r._5 >= 0.0 && r._5 <= 1.0) &&
        rows.map(_._5).distinct.length == 1 // brier_total replicated
    }, n = 6)
  }

  test("growthCurve: new-user total equals distinct entities, cumulative is " +
      "monotone and ends at the distinct count, dau bounded by cum") {
    import graft.ops.EventAnalytics
    val gen = Gen.listOfN(60, Gen.zip(Gen.chooseNum(0, 9), Gen.chooseNum(0, 5)))
    check("growth-props", Prop.forAll(gen) { rows =>
      val df = rows.map { case (u, day) =>
        (u.toLong, new java.sql.Timestamp(day * 86400L * 1000L))
      }.toDF("user_id", "ts")
      val curve = EventAnalytics.growthCurve(df, "user_id", "ts")
        .as[(Long, Long, Long, Long)].collect().toSeq // day, dau, new, cum
      val distinctUsers = rows.map(_._1).distinct.size.toLong
      val cums = curve.map(_._4)
      curve.map(_._3).sum == distinctUsers &&
        cums == cums.sorted && cums.lastOption.contains(distinctUsers) &&
        curve.forall(r => r._2 <= r._4) // day's actives ⊆ users seen so far
    }, n = 8)
  }

  test("trimmedMean: within [group min, group max] and between the 5th and " +
      "95th percentile bounds; full-width trim equals the plain mean") {
    import graft.ops.Stats
    val gen = Gen.listOfN(40, Gen.zip(Gen.oneOf("a", "b"), Gen.chooseNum(-1000, 1000)))
    check("trimmed-mean-props", Prop.forAll(gen) { rows =>
      val df = rows.map { case (g, v) => (g, v.toDouble) }.toDF("g", "v")
      val tm = Stats.trimmedMean(df, "g", $"v")
        .as[(String, Long, Double)].collect().map(r => r._1 -> r._3).toMap
      val ok = tm.forall { case (g, m) =>
        val vs = rows.filter(_._1 == g).map(_._2.toDouble)
        m >= vs.min - 1e-9 && m <= vs.max + 1e-9
      }
      // lo=0, hi=1 keeps everything: trimmed mean == plain mean (round 6)
      val wide = Stats.trimmedMean(df, "g", $"v", lo = 0.0, hi = 1.0)
        .as[(String, Long, Double)].collect().map(r => r._1 -> r._3).toMap
      val plain = rows.groupBy(_._1).map { case (g, rs) =>
        g -> math.round(rs.map(_._2.toDouble).sum / rs.size * 1e6) / 1e6
      }
      ok && wide == plain
    }, n = 6)
  }

  test("wasserstein1d: symmetric, zero on identical samples, exact on " +
      "pure translations") {
    import graft.ops.Drift
    val xsGen = Gen.choose(2, 25).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-50, 50).map(_.toDouble / 2)))
    check("w1", Prop.forAll(xsGen, Gen.choose(-10, 10)) { (xs, shift) =>
      val a = xs.toDF("v")
      val b = xs.map(_ + shift.toDouble).toDF("v")
      val ab = Drift.wasserstein1d(a, b, $"v").as[(Long, Long, Double)].head()._3
      val ba = Drift.wasserstein1d(b, a, $"v").as[(Long, Long, Double)].head()._3
      val self = Drift.wasserstein1d(a, a, $"v").as[(Long, Long, Double)].head()._3
      ab == ba && self == 0.0 && math.abs(ab - math.abs(shift)) < 1e-5
    }, n = 8)
  }

  test("kaplanMeier: survival is within [0,1] and non-increasing in t") {
    import graft.ops.Stats
    val ltGen = Gen.choose(3, 30).flatMap(n => Gen.listOfN(n, for {
      d <- Gen.choose(0, 10); obs <- Gen.oneOf(true, false)
    } yield (d.toLong, obs)))
    check("km-monotone", Prop.forAll(ltGen) { lt =>
      val curve = Stats.kaplanMeier(lt.toDF("dur", "obs"), $"dur", $"obs")
        .as[(Long, Long, Long, Long, Double)].collect().toSeq
      val s = curve.map(_._5)
      s.forall(v => v >= 0.0 && v <= 1.0) &&
        // round-6 on each point can locally invert by up to 1e-6
        s.zip(s.drop(1)).forall { case (x, y) => y <= x + 1e-6 }
    }, n = 12)
  }

  test("spearman: bounded in [-1,1], symmetric, invariant under a strictly " +
      "monotone transform of one axis") {
    import graft.ops.Stats
    val rowsGen = Gen.choose(5, 40).flatMap(n => Gen.listOfN(n, for {
      x <- Gen.choose(-20, 20); y <- Gen.choose(-20, 20)
    } yield (x.toDouble, y.toDouble)))
    check("spearman-props", Prop.forAll(rowsGen) { rows =>
      val df = rows.toDF("x", "y")
      def rho(d: org.apache.spark.sql.DataFrame,
          a: String, b: String): Option[Double] = {
        val r = Stats.spearman(d, col(a), col(b)).collect()(0)
        if (r.isNullAt(1)) None else Some(r.getDouble(1))
      }
      val xy = rho(df, "x", "y")
      val yx = rho(df, "y", "x")
      val mono = rho(df.withColumn("x", exp($"x" / 10)), "x", "y")
      val bounded = xy.forall(v => v >= -1.0 - 1e-9 && v <= 1.0 + 1e-9)
      bounded && xy == yx && xy == mono
    }, n = 10)
  }

  test("lorenzDeciles: curve below the diagonal, non-decreasing, ends at 1") {
    import graft.ops.Stats
    val gGen = Gen.choose(3, 40).flatMap(n =>
      Gen.listOfN(n, Gen.choose(1, 12)))
    check("lorenz", Prop.forAll(gGen) { sizes =>
      val df = sizes.zipWithIndex
        .flatMap { case (k, g) => Seq.fill(k)(g) }.toDF("g")
      val cur = Stats.lorenzDeciles(df, $"g")
        .as[(Int, Long, Double, Double)].collect().toSeq
      val below = cur.forall { case (_, _, p, m) => m <= p + 1e-9 }
      val mono = cur.map(_._4).zip(cur.map(_._4).drop(1))
        .forall { case (a, b) => b >= a - 1e-9 }
      below && mono && cur.last._3 == 1.0 && cur.last._4 == 1.0
    }, n = 10)
  }

  test("effectiveSampleSize: 1 <= ess <= n, deff >= 1") {
    import graft.ops.Stats
    val wGen = Gen.choose(2, 30).flatMap(n =>
      Gen.listOfN(n, Gen.choose(1, 1000).map(_.toDouble)))
    check("ess", Prop.forAll(wGen) { ws =>
      val df = ws.map(("g", _)).toDF("g", "w")
      val (_, n, ess, deff) = Stats.effectiveSampleSize(df, $"g", $"w")
        .as[(String, Long, Double, Double)].head()
      ess >= 1.0 - 1e-6 && ess <= n + 1e-6 && deff >= 1.0 - 1e-6
    }, n = 12)
  }

  test("wordNgrams: equals the sliding-window reference on arbitrary texts") {
    import graft.text.TextAnalysis
    // split(" ") semantics incl. empty tokens from doubled/leading spaces
    val wordGen = Gen.oneOf("a", "bb", "ccc", "", "d e")
    val textGen = Gen.listOf(wordGen).map(_.mkString(" "))
    check("wordNgrams reference", Prop.forAll(textGen, Gen.choose(1, 4)) {
      (text, n) =>
        val got = Seq(text).toDF("t")
          .select(TextAnalysis.wordNgrams(col("t"), n).as("g"))
          .as[Seq[String]].head()
        val toks = text.split(" ", -1).toSeq
        val want = if (toks.size < n) Seq.empty
          else toks.sliding(n).map(_.mkString(" ")).toSeq
        got == want
    }, n = 40)
  }

  test("bhAdjust: adjusted p >= raw p, monotone in rank, bounded by 1, " +
      "and invariant to input row order") {
    import graft.ops.Stats
    check("bh-fdr", Prop.forAll(
      Gen.listOfN(8, Gen.chooseNum(0.0001, 0.9999)).suchThat(_.nonEmpty)) {
      ps =>
        val fam = ps.zipWithIndex.map { case (p, i) => (s"k$i", p) }
        val run = Stats.bhAdjust(fam.toDF("k", "p"), Seq("k"), $"p")
          .select($"k", $"p_raw", $"rank", $"p_bh")
          .as[(String, Double, Long, Double)].collect().toSeq
        val shuffled = Stats.bhAdjust(
            fam.reverse.toDF("k", "p").repartition(3), Seq("k"), $"p")
          .select($"k", $"p_raw", $"rank", $"p_bh")
          .as[(String, Double, Long, Double)].collect().toSeq
        run == shuffled &&
          run.forall(r => r._4 >= r._2 - 1e-9 && r._4 <= 1.0) &&
          run.map(_._4) == run.map(_._4).sorted
    }, n = 8)
  }

  test("kendallTau: tau(x, x) = 1 on distinct values; tau in [-1, 1]") {
    import graft.ops.TimeSeries
    check("kendall-tau", Prop.forAll(
      Gen.listOfN(12, Gen.chooseNum(-1000, 1000)).map(_.distinct)
        .suchThat(_.size >= 3)) { xs =>
      val self = TimeSeries.kendallTau(
          xs.map(v => (v.toDouble, v.toDouble)).toDF("x", "y"), $"x", $"y")
        .select($"tau_b").as[Option[Double]].head()
      val ys = xs.map(v => (v.toDouble, ((v * 7919) % 101).toDouble))
      val any = TimeSeries.kendallTau(ys.toDF("x", "y"), $"x", $"y")
        .select($"tau_b").as[Option[Double]].head()
      self == Some(1.0) && any.forall(t => t >= -1.0 && t <= 1.0)
    }, n = 6)
  }

  test("hhi: per-day HHI within [1/n, 1], normalized form within [0, 1]") {
    val got = SparkEntry.queries("q239_hhi")(spark, sf001)
      .as[(Long, Long, Double, Option[Double])].collect()
    assert(got.nonEmpty)
    got.foreach { case (_, n, hhi, norm) =>
      assert(hhi >= 1.0 / n - 1e-6 && hhi <= 1.0 + 1e-6)
      norm.foreach(v => assert(v >= -1e-6 && v <= 1.0 + 1e-6))
    }
  }

  test("gains chart: cumulative counts monotone, final gain = 1, " +
      "final lift = 1") {
    val got = SparkEntry.queries("q240_gains_chart")(spark, sf001)
      .as[(Long, Long, Long, Long, Long, Double, Double)].collect().toSeq
    assert(got.nonEmpty)
    assert(got.map(_._4) == got.map(_._4).sorted)
    assert(got.map(_._5) == got.map(_._5).sorted)
    assert(got.last._6 == 1.0 && got.last._7 == 1.0)
  }

}
