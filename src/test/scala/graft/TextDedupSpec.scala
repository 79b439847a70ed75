package graft

import org.apache.spark.sql.functions._

import graft.text.{DedupOps, TextAnalysis}

class TextDedupSpec extends SparkSpec {
  import spark.implicits._

  test("shingles: 2-grams of a 4-token text, distinct") {
    val df = Seq("a b c b c").toDF("text")
    val got = df.select(DedupOps.shingles($"text", 2)).as[Seq[String]].head()
    assert(got.sorted == Seq("a b", "b c", "c b").sorted)
  }

  test("shingles: shorter than n yields empty array, not a crash") {
    val df = Seq("solo").toDF("text")
    assert(df.select(DedupOps.shingles($"text", 2)).as[Seq[String]].head().isEmpty)
  }

  test("langId: picks profile language, und when nothing matches") {
    val df = Seq("the cat sat of the mat", "der hund und die katze", "zz yy xx")
      .toDF("text")
    val got = df.select(TextAnalysis.langId($"text")).as[String].collect().toSeq
    assert(got == Seq("en", "de", "und"))
  }

  test("SubstringSetScore ≡ the HOF trigram-intersect formulation on real data") {
    val docs = Tables.documents(spark, sf001).limit(300)
    TextAnalysis.TrigramProfiles.foreach { case (lang, profile) =>
      val pairs = docs.select(
        TextAnalysis.trigramProfileScoreHof(col("text"), profile).as("hof"),
        org.apache.spark.sql.graftbridge.ColumnBridge.column(
          graft.functions.SubstringSetScore(
            org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("text")),
            org.apache.spark.sql.graftbridge.ColumnBridge.expression(
              array(profile.map(lit): _*)))).as("gen"))
        .as[(Int, Int)].collect()
      assert(pairs.forall { case (a, b) => a == b }, s"diverged for $lang")
    }
    // edge cases: empty text, text shorter than a trigram, exact trigram
    val edge = Seq("", "ab", "the", "xthex").toDF("text")
      .select(TextAnalysis.trigramProfileScoreHof(col("text"), Seq("the", "he ")).as("hof"),
        org.apache.spark.sql.graftbridge.ColumnBridge.column(
          graft.functions.SubstringSetScore(
            org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("text")),
            org.apache.spark.sql.graftbridge.ColumnBridge.expression(
              array(lit("the"), lit("he "))))).as("gen"))
      .as[(Int, Int)].collect()
    assert(edge.forall { case (a, b) => a == b })
  }

  test("jaroWinkler: textbook values, byte-level unicode, boost threshold, " +
      "null/empty handling; SQL registration agrees") {
    def jw(a: String, b: String): Double =
      Seq((a, b)).toDF("a", "b")
        .select(TextAnalysis.jaroWinkler($"a", $"b").as("s"))
        .as[Double].head()
    def r6(x: Double): Double = math.round(x * 1e6) / 1e6
    // textbook pairs (values = DuckDB jaro_winkler_similarity)
    assert(r6(jw("martha", "marhta")) == 0.961111)
    assert(r6(jw("dixon", "dicksonx")) == 0.813333)
    assert(r6(jw("dwayne", "duane")) == 0.84)
    assert(jw("abc", "abc") == 1.0)
    // below the 0.7 boost threshold the prefix must NOT be rewarded
    assert(r6(jw("abcdef", "abzzzz")) == r6(5.0 / 9)) // jaro, unboosted
    assert(r6(jw("prefixmatch", "prefixxxxxx")) == 0.69697)
    // byte-level semantics: 'ú' vs 'u' is a 2-byte-vs-1-byte comparison
    assert(r6(jw("ñandú", "ñandu")) == 0.909524)
    // empties score 0 (DuckDB convention), not 1
    assert(jw("", "") == 0.0 && jw("a", "") == 0.0)
    // window 0: adjacent transposition with length-2 strings finds nothing
    assert(jw("ab", "ba") == 0.0)
    // null propagates
    val n = Seq(("x", null: String)).toDF("a", "b")
      .select(TextAnalysis.jaroWinkler($"a", $"b").as("s")).collect()(0)
    assert(n.isNullAt(0))
    // SQL registration path computes the identical value
    graft.functions.GraftFunctions.register(spark)
    assert(spark.sql("SELECT graft_jaro_winkler('martha', 'marhta') AS s")
      .as[Double].map(r6 _).head() == 0.961111)
  }

  test("lexicalDiversity: hand-computed TTR/hapax/Simpson; all-hapax " +
      "source vs fully templated source") {
    val docs = Seq(
      ("s1", "a a b"),        // N=3 V=2 ttr=2/3 hapax=1/2 simpson=2/6
      ("s2", "x y z"),        // all hapax: simpson 0
      ("s3", "t t t t")       // one type: ttr 1/4, simpson 1
    ).toDF("source", "text")
    val got = TextAnalysis.lexicalDiversity(docs, $"source", $"text")
      .as[(String, Long, Long, Double, Double, Double)].collect().toSeq
    assert(got == Seq(
      ("s1", 3L, 2L, 0.666667, 0.5, 0.333333),
      ("s2", 3L, 3L, 1.0, 1.0, 0.0),
      ("s3", 4L, 1L, 0.25, 0.0, 1.0)))
  }

  test("graft_substr_score callable from SQL") {
    graft.functions.GraftFunctions.register(spark)
    val got = spark.sql(
      "SELECT graft_substr_score('the cat', array('the', 'dog', 'cat')) AS s")
      .as[Int].head()
    assert(got == 2)
  }

  test("charEntropy: uniform k-char string -> log2 k; constant -> 0; empty -> 0") {
    val docs = Seq("abcd", "aaaa", "", "aabb").toDF("text")
    val got = docs.select(TextAnalysis.charEntropy($"text").as("e"))
      .as[Double].collect().toSeq
    assert(got == Seq(2.0, 0.0, 0.0, 1.0), got.toString)
  }

  test("qualityScore is in [0,1] and deterministic") {
    val docs = Tables.documents(spark, sf001)
    val stats = docs.select(TextAnalysis.qualityScore($"text").as("q"))
      .agg(min($"q"), max($"q")).as[(Double, Double)].head()
    assert(stats._1 >= 0.0 && stats._2 <= 1.0)
  }

  test("unigramNll: uniform corpus scores ln(V); rare-token doc scores higher") {
    // 4 docs over a 4-token vocab, each token appearing twice except one
    // doc of two rare tokens — hand-checkable frequencies
    val df = Seq((1L, "a b"), (2L, "a b"), (3L, "c c c"), (4L, "d"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.unigramNll(df, "doc_id", $"text")
      .orderBy($"doc_id").collect()
    // totals: a=2 b=2 c=3 d=1 N=8
    def nll(cs: Seq[Long]): Double = {
      val raw = cs.map(c => -math.log(c / 8.0)).sum / cs.size
      math.rint(raw * 1e6) / 1e6
    }
    assert(got.map(_.getAs[Double]("nll")).toSeq ==
      Seq(nll(Seq(2, 2)), nll(Seq(2, 2)), nll(Seq(3, 3, 3)), nll(Seq(1))))
    assert(got.map(_.getAs[Long]("n_tokens")).toSeq == Seq(2L, 2L, 3L, 1L))
    // the single rare token is the most surprising document
    val top = TextAnalysis.unigramNll(df, "doc_id", $"text")
      .orderBy($"nll".desc).select("doc_id").as[Long].head()
    assert(top == 4L)
  }

  test("bigramNll: stereotyped transitions score lower than a novel sequence") {
    val df = (Seq.fill(6)((0L, "a b a b a b")) ++ Seq((9L, "c d e f g h")))
      .zipWithIndex.map { case ((_, t), i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = TextAnalysis.bigramNll(df, "doc_id", $"text")
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("nll")).toMap
    // the a/b docs share every transition (high p); doc 6's transitions are
    // each unique in the corpus (low p) -> strictly higher NLL
    assert(got(6L) > got(0L), got.toString)
    assert((0L to 5L).map(got).distinct.size == 1, "identical docs score identically")
  }

  test("knBigramNll: hand-computed Kneser-Ney probabilities; the per-" +
      "context distribution normalizes to 1 over the full vocab") {
    // corpus bigrams: (a,b):2 (b,a):1 (a,c):1 -> D=0.75:
    //   p(b|a) = 1.25/3 + (0.75*2/3)*(1/3) = 0.583333...
    //   p(a|b) = 0.25/1 + 0.75*(1/3)       = 0.5
    //   p(c|a) = 0.25/3 + (0.75*2/3)*(1/3) = 0.25
    // doc1 nll = (2*-ln(p(b|a)) + -ln(p(a|b)))/3 ; doc2 nll = -ln(0.25)
    val df = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val got = TextAnalysis.knBigramNll(df, "doc_id", $"text")
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> ((r.getAs[Double]("nll"), r.getAs[Long]("n_bigrams"))))
      .toMap
    assert(got(1L) == ((0.59038, 3L)), got.toString)
    assert(got(2L) == ((1.386294, 1L)), got.toString)
    // normalization over the full vocab for context 'a': observed b,c plus
    // the pure-backoff unseen 'a' term must sum to exactly 1
    val pB = 1.25 / 3 + (0.75 * 2 / 3) * (1.0 / 3)
    val pC = 0.25 / 3 + (0.75 * 2 / 3) * (1.0 / 3)
    val pUnseenA = (0.75 * 2 / 3) * (1.0 / 3)
    assert(math.abs(pB + pC + pUnseenA - 1.0) < 1e-12)
  }

  test("exactDupGroups finds only true duplicate groups") {
    val df = Seq((1L, "aaa"), (2L, "bbb"), (3L, "aaa")).toDF("id", "text")
    val got = DedupOps.exactDupGroups(df, "id", md5($"text")).collect()
    assert(got.length == 1 && got.head.getAs[Long]("n_docs") == 2
      && got.head.getAs[Long]("first_id") == 1L)
  }

  test("minhash signature of identical texts is identical; LSH pairs them") {
    val df = Seq((1L, "x y z w v u t s"), (2L, "x y z w v u t s"), (3L, "p q r p q r p q"))
      .toDF("doc_id", "text")
    val sig = DedupOps.minhashSignatures(df, "doc_id", $"text", 2)
    val pairs = DedupOps.lshCandidatePairs(sig, "doc_id").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)) && !pairs.contains((1L, 3L)))
  }

  test("LSH candidates contain the high-jaccard pairs (recall on real data)") {
    val docs = Tables.documents(spark, sf001).filter($"doc_id" < 120)
    val exact = DedupOps.ngramJaccardPairs(docs, "doc_id", $"text", 2, 0.35)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    val sig = DedupOps.minhashSignatures(docs, "doc_id", $"text", 2)
    val cand = DedupOps.lshCandidatePairs(sig, "doc_id").as[(Long, Long)].collect().toSet
    // every pair with jaccard >= 0.35 should be an LSH candidate w.h.p.
    val missed = exact.diff(cand)
    assert(missed.size <= math.max(1, exact.size / 5),
      s"LSH missed ${missed.size} of ${exact.size} high-sim pairs")
  }

  test("connectedComponents: chains merge to min label, isolates stay singleton") {
    // graph: 1-2, 2-3 (one cluster), 5-6 (another), 9 isolated
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("d1", "d2")
    val docs = Seq(1L, 2L, 3L, 5L, 6L, 9L).toDF("doc")
    val got = DedupOps.connectedComponents(pairs, docs)
      .as[(Long, Long)].collect().toMap
    assert(got(1L) == 1L && got(2L) == 1L && got(3L) == 1L)
    assert(got(5L) == 5L && got(6L) == 5L)
    assert(got(9L) == 9L)
  }

  test("connectedComponents: local union-find and distributed pointer " +
      "jumping agree exactly") {
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L), (10L, 3L)).toDF("d1", "d2")
    val docs = (1L to 12L).toDF("doc")
    def labels(threshold: Long) = DedupOps
      .connectedComponents(pairs, docs, driverMaxPairs = threshold)
      .as[(Long, Long)].collect().toSet
    val local = labels(1000000L)
    val dist = labels(0L)
    assert(local == dist, s"local $local != distributed $dist")
    assert(local.contains((10L, 1L)) && local.contains((8L, 7L)) &&
      local.contains((5L, 5L)))
  }

  test("simhash: identical texts collide, disjoint-vocab texts differ") {
    val df = Seq((1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
      (3L, "zz yy xx ww vv uu")).toDF("doc_id", "text")
    val got = DedupOps.simhash(df, "doc_id", $"text").as[(Long, Long)].collect().toMap
    assert(got(1L) == got(2L) && got(1L) != got(3L))
  }

  test("winnow: shared long substrings guarantee shared fingerprints") {
    val common = "the quick brown fox jumps over the lazy dog again"
    val df = Seq(
      (1L, s"AAAA $common BBBB"),
      (2L, s"CCCCCC $common DD"),
      (3L, "totally unrelated text with zero overlap whatsoever here"))
      .toDF("doc_id", "text")
    val fps = DedupOps.winnow(df, "doc_id", $"text")
      .as[(Long, Long)].collect().groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    // winnowing guarantee: substrings >= w+k-1 chars shared => fingerprint overlap
    assert(fps(1L).intersect(fps(2L)).nonEmpty)
    assert(fps(1L).intersect(fps(3L)).isEmpty)
  }

  test("rollingHash matches the hand-computed Rabin-Karp recurrence") {
    def ref(s: String): Long = s.foldLeft(0L)((h, c) => (h * 257 + c) % 1000000007L)
    val texts = Seq("abc", "", "the quick brown fox", "aab", "aba")
    val got = texts.toDF("t").select(TextAnalysis.rollingHash($"t"))
      .as[Long].collect().toSeq
    assert(got == texts.map(ref))
    assert(got(3) != got(4)) // order-sensitive, unlike a bag hash
  }

  test("fingerprint is stable and distinct across distinct docs") {
    val df = Seq("one two", "one two", "three four").toDF("text")
    val fps = df.select(TextAnalysis.fingerprint($"text")).as[Long].collect().toSeq
    assert(fps(0) == fps(1) && fps(0) != fps(2))
  }
  test("incrementalExactDedupBloom reproduces the plain incremental dedup exactly") {
    // 300 incoming docs: ~1/3 duplicate the corpus, ~1/5 duplicate each other
    val existing = (0 until 120).map(i => (i.toLong, s"corpus text number ${i % 80}"))
      .toDF("doc_id", "text")
    val incoming = (200 until 500).map(i =>
      (i.toLong, if (i % 3 == 0) s"corpus text number ${i % 80}"
                 else s"fresh text ${i % 60} payload")).toDF("doc_id", "text")
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").as[Long].collect().toSet
    val plain = ids(DedupOps.incrementalExactDedup(
      incoming, existing, "doc_id", md5($"text")))
    // undersized sketch (high fpp) on purpose: false positives must only cost
    // verification work, never change the result
    val bloom = ids(DedupOps.incrementalExactDedupBloom(
      incoming, existing, "doc_id", md5($"text"), expectedKeys = 50L, fpp = 0.2))
    assert(bloom == plain && plain.nonEmpty)
  }

  test("paragraphDedup keeps first occurrence corpus-wide and reassembles in order") {
    val df = Seq(
      (1L, "A. B. C"),
      (2L, "B. D"),   // B first seen in doc 1 -> doc 2 keeps only D
      (3L, "C"),      // C first seen in doc 1 -> doc 3 vanishes
      (4L, "E. E. F") // intra-doc dup: first E survives
    ).toDF("doc_id", "text")
    val got = DedupOps.paragraphDedup(df, "doc_id", $"text")
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "A. B. C", 2L -> "D", 4L -> "E. F"))
  }

  test("connectedComponents distributed path uses a reliable checkpoint dir when set") {
    val dir = java.nio.file.Files.createTempDirectory("cc-ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    try {
      val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("d1", "d2")
      val docs = (1L to 9L).toDF("doc")
      // driverMaxPairs = 0 forces the distributed path
      val got = DedupOps.connectedComponents(pairs, docs, driverMaxPairs = 0L)
        .as[(Long, Long)].collect().toMap
      assert(got(3L) == 1L && got(8L) == 7L && got(5L) == 5L)
      // the reliable checkpoint actually wrote to the configured dir
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      assert(wrote > 0, "no checkpoint files written to the reliable dir")
    } finally spark.sparkContext.setCheckpointDir(null) // None in local mode
  }

  test("mixRates caps at 1 and hits target shares; rebalance approximates them") {
    import graft.text.Curation
    // 800 en / 150 fr / 50 de; targets 50/25/25 -> fr,de upcapped at 1.0
    val docs = ((0 until 800).map(i => (i.toLong, "en")) ++
      (800 until 950).map(i => (i.toLong, "fr")) ++
      (950 until 1000).map(i => (i.toLong, "de"))).toDF("doc_id", "lang")
    val rates = Curation.mixRates(docs, "lang",
      Map("en" -> 0.5, "fr" -> 0.25, "de" -> 0.25))
    val m = rates.select($"lang", $"rate").as[(String, Double)].collect().toMap
    assert(m("en") == 0.625 && m("fr") == 1.0 && m("de") == 1.0)
    val sampled = Curation.rebalance(docs, "lang", rates, seed = 7L)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    // Bernoulli sampling: en should land near 500 (well under 800), fr/de intact
    assert(sampled("fr") == 150L && sampled("de") == 50L)
    assert(math.abs(sampled("en") - 500L) < 80L, s"en sampled ${sampled("en")}")
  }

  test("empty corpus: core curation operators return empty, never crash") {
    // empty partitions are routine at scale (a filter that matches nothing,
    // a new source with no docs yet); every operator must pass them through
    val docs = spark.emptyDataset[(Long, String)].toDF("doc_id", "text")
    val embs = spark.emptyDataset[(Long, Seq[Float])].toDF("vec_id", "embedding")
    assert(DedupOps.minhashSignatures(docs, "doc_id", $"text", 2).count() == 0)
    assert(graft.text.Packing.packWindows(
      docs.withColumn("src", lit("a")), "src", "doc_id", $"text", 64).count() == 0)
    assert(graft.text.Packing.chunkSliding(docs, "doc_id", $"text", 64, 48).count() == 0)
    assert(TextAnalysis.unigramNll(docs, "doc_id", $"text").count() == 0)
    assert(graft.text.Curation.gopherRuleFlags(docs, $"text").count() == 0)
    assert(graft.text.Curation.corpusDiff(docs, docs, "doc_id", md5($"text")).count() == 0)
    assert(graft.text.Bpe.learnMerges(docs, $"text", 3).isEmpty)
    val cents = graft.sim.Similarity.seedCentroids(embs, "vec_id", "embedding", 2)
    assert(graft.sim.Similarity.semDedup(embs, "vec_id", "embedding", cents, 0.5)
      .count() == 0)
    assert(graft.text.Retrieval.bm25(docs, "doc_id", $"text", Seq("x")).count() == 0)
    val zdir = java.nio.file.Files.createTempDirectory("zempty").resolve("out").toString
    graft.io.Layout.zorderWrite(
      docs.withColumn("a", col("doc_id")).withColumn("b", col("doc_id")),
      zdir, 2, "a", "b")
    assert(spark.read.parquet(zdir).count() == 0)
    // an EMPTY conversation is flagged invalid, not a crash
    val conv = spark.sql("SELECT array() AS conv")
      .select(col("conv").cast("array<struct<role:string,content:string>>").as("conv"))
    val flags = graft.text.Curation.conversationFlags(conv, col("conv")).head()
    assert(!flags.getAs[Boolean]("keep") && flags.getAs[Int]("n_turns") == 0)
    // DSIR: empty raw -> empty weights; empty TARGET -> finite (non-null)
    // weights from the smoothing prior, not a null column
    import graft.text.Curation
    val some = Seq((1L, "a b c")).toDF("doc_id", "text")
    assert(Curation.dsirLogWeights(docs, some, "doc_id", $"text").count() == 0)
    val wEmptyTgt = Curation.dsirLogWeights(some, docs, "doc_id", $"text")
      .select("logw").as[Double].collect()
    assert(wEmptyTgt.length == 1 && !wEmptyTgt.head.isNaN)
    assert(Curation.splitAssign(docs, "doc_id").count() == 0)
    assert(Curation.gumbelTopK(
      docs.withColumn("logw", lit(0.0)), "doc_id", "logw", 3).count() == 0)
    assert(graft.sim.Similarity.hardNegatives(
      embs.withColumn("label", lit(0)), embs.withColumn("label", lit(0)),
      "vec_id", "embedding", "label", 3).count() == 0)
    // Lloyd IVF: empty corpus -> empty quantizer -> empty ranked result
    assert(graft.sim.Similarity.lloydCentroids(embs, "vec_id", "embedding", 4, 2).isEmpty)
    assert(graft.sim.Similarity.lloydIvfTopK(embs, embs, "vec_id", "embedding",
      k = 3, nLists = 4, iters = 2, nProbe = 2).count() == 0)
    // non-empty corpus whose ids all exceed nLists: empty SEED set — the
    // quantizer degenerates to empty instead of NPEing on a null cell
    val hi = Seq((100L, Seq(1.0f, 2.0f)), (101L, Seq(3.0f, 4.0f)))
      .toDF("vec_id", "embedding")
    assert(graft.sim.Similarity.lloydCentroids(hi, "vec_id", "embedding", 4, 1).isEmpty)
    assert(graft.sim.Similarity.lloydIvfTopK(hi, hi, "vec_id", "embedding",
      k = 2, nLists = 4, iters = 1, nProbe = 2).count() == 0)
    // hashed linear scorer + temperature mix on nothing
    assert(Curation.hashedLinearScore(docs, "doc_id", $"text", _ => lit(0.0))
      .count() == 0)
    assert(Curation.temperatureMixShares(
      docs.withColumn("lang", lit("en")), "lang", lit(1L), 2.0).count() == 0)
  }

  test("ngramCharStats: hand-computed top/dup bigram char fractions") {
    import graft.text.Curation
    val df = Seq(
      (1L, "a b a b a b"),     // "a b"×3, "b a"×2; len 11
      (2L, "x y z"),           // all bigrams unique
      (3L, "w")                // no bigrams → no output row
    ).toDF("doc_id", "text")
    val got = Curation.ngramCharStats(df, "doc_id", $"text", 2)
      .orderBy("doc_id").collect()
    assert(got.length == 2)
    val r1 = got(0)
    assert(r1.getAs[String]("top_gram") == "a b" && r1.getAs[Long]("top_count") == 3L)
    assert(r1.getAs[Double]("top_frac") == math.rint(9.0 / 11 * 1e6) / 1e6)
    // dup chars = 3·3 ("a b") + 2·3 ("b a") = 15 — overlaps counted, > 1.0 ok
    assert(r1.getAs[Double]("dup_frac") == math.rint(15.0 / 11 * 1e6) / 1e6)
    val r2 = got(1)
    // unique bigrams: top count 1, lexicographically smallest gram wins
    assert(r2.getAs[Long]("top_count") == 1L && r2.getAs[String]("top_gram") == "x y")
    assert(r2.getAs[Double]("dup_frac") == 0.0)
  }

  test("gopherRuleFlags: each rule trips on its designed offender only") {
    import graft.text.Curation
    // 31 words, mean word length 4.5, stopwords {the, and}
    val good = (("the quick brown foxes jumped over and beyond sleeping dogs " * 3)
      + "end").trim
    val cases = Seq(
      (1L, good),                                          // passes all
      (2L, "the a of and or but"),                         // too few words
      (3L, good + " " + Seq.fill(30)("#").mkString(" ")),  // symbol ratio
      (4L, (1 to 30).map(i => s"- the item $i").mkString("\n")), // bullets
      (5L, (1 to 30).map(i => s"the line $i goes on...").mkString("\n")), // ellipses
      (6L, good + " " + Seq.fill(40)("123").mkString(" ")), // alpha fraction
      (7L, ("zz yy xx ww vv uu tt ss " * 4).trim)          // no stopwords
    ).toDF("id", "text")
    val got = Curation.gopherRuleFlags(cases, $"text", minWords = 20)
      .select($"id", $"g_words", $"g_symbol", $"g_bullet", $"g_ellipsis",
        $"g_alpha", $"g_stopword", $"keep")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getBoolean(7), "good doc keeps")
    assert(!got(2L).getBoolean(1) && !got(2L).getBoolean(7), "word count trips")
    assert(!got(3L).getBoolean(2) && got(3L).getBoolean(1), "symbol ratio trips")
    assert(!got(4L).getBoolean(3), "bullet fraction trips")
    assert(!got(5L).getBoolean(4), "ellipsis fraction trips")
    assert(!got(6L).getBoolean(5), "alpha fraction trips")
    assert(!got(7L).getBoolean(6) && !got(7L).getBoolean(7), "stopword rule trips")
  }

  test("BPE learnMerges reproduces the classic hand-computed merge sequence") {
    import graft.text.Bpe
    // Sennrich-style toy corpus as documents: low×5, lowest×2 (one word per
    // row times freq so the word-frequency collapse is exercised)
    val docs = (Seq.fill(5)("low") ++ Seq.fill(2)("lowest")).toDF("text")
    val merges = Bpe.learnMerges(docs, col("text"), 4)
    // pair counts round 1: (l,o)=7 (o,w)=7 … tie broken lexicographically →
    // (l,o,7); then (lo,w,7); then (low,</w>)=5 beats est pairs (2)
    assert(merges.take(3) == Seq(("l", "o", 7L), ("lo", "w", 7L), ("low", "</w>", 5L)))
    assert(merges.length == 4)
    // encode applies merges in order; "low" collapses to one token
    val enc = Bpe.encode(docs.limit(1), col("text"), merges)
      .select("bpe_tokens").as[Seq[String]].head()
    assert(enc == Seq("low</w>"))
    // unseen word still segments deterministically with learned merges
    val other = Bpe.encode(Seq("lower").toDF("text"), col("text"), merges)
      .select("bpe_tokens").as[Seq[String]].head()
    assert(other.head == "low" && other.map(_.length).sum == "lower".length + 4)
    // symbols containing backslashes/quotes survive merge application (the
    // merge fold is Column DSL, never SQL-string splicing)
    val tricky = Seq("""p\q p\q p'r""").toDF("text")
    val m2 = Bpe.learnMerges(tricky, col("text"), 2)
    assert(m2.length == 2)
    val enc2 = Bpe.encode(tricky, col("text"), m2)
      .select("bpe_tokens").as[Seq[String]].head()
    assert(enc2.mkString == """p\q</w>p\q</w>p'r</w>""")
  }

  test("Bpe.encode: native Column path ≡ imperative mapPartitions path " +
      "(incl. null text) on real documents") {
    import graft.text.Bpe
    val docs = Tables.documents(spark, sf001).limit(50).select("doc_id", "text")
    val merges = Bpe.learnMerges(docs, col("text"), 5)
    def run(maxNative: Int) =
      Bpe.encode(docs, col("text"), merges, maxNativeMerges = maxNative)
        .select("doc_id", "bpe_tokens", "n_bpe_tokens")
        .as[(Long, Seq[String], Int)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
    val native = run(64)
    val imperative = run(0) // force the mapPartitions branch
    assert(native.nonEmpty && native == imperative,
      "encode paths diverged on real text")
    // null text → empty token list on BOTH paths
    val nulls = Seq((1L, null.asInstanceOf[String])).toDF("doc_id", "text")
    for (m <- Seq(64, 0)) {
      val r = Bpe.encode(nulls, col("text"), merges, maxNativeMerges = m)
        .select("bpe_tokens", "n_bpe_tokens").as[(Seq[String], Int)].head()
      assert(r._1.isEmpty && r._2 == 0, s"null text mishandled at maxNative=$m")
    }
    // the native path is UDF-free
    val plan = Bpe.encode(docs, col("text"), merges)
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("ScalaUDF"), "native encode fell back to a UDF")
  }

  test("Bpe merges: save/load round-trip preserves order; encode with the " +
      "loaded table equals encode with the learned one") {
    import graft.text.Bpe
    val docs = Tables.documents(spark, sf001).limit(40).select("doc_id", "text")
    val merges = Bpe.learnMerges(docs, col("text"), 6)
    val dir = java.nio.file.Files.createTempDirectory("bpe-merges").toString + "/m"
    Bpe.saveMerges(spark, merges, dir)
    val loaded = Bpe.loadMerges(spark, dir)
    assert(loaded == merges, "merge table mutated across the round-trip")
    val a = Bpe.encode(docs, col("text"), merges)
      .select("doc_id", "bpe_tokens").as[(Long, Seq[String])].collect().toMap
    val b = Bpe.encode(docs, col("text"), loaded)
      .select("doc_id", "bpe_tokens").as[(Long, Seq[String])].collect().toMap
    assert(a == b)
  }

  test("luhnValid: classic check-digit vectors; luhnValidCount ignores " +
      "invalid candidates and separator styles") {
    import graft.text.Curation
    val cases = Seq(
      ("4111111111111111", true),   // Visa test number
      ("4111111111111112", false),  // off-by-one check digit
      ("378282246310005", true),    // Amex test number
      ("5500005555555559", true),
      ("1234567890123456", false))
    val got = cases.map(_._1).toDF("d")
      .select(Curation.luhnValid(col("d"))).as[Boolean].collect().toSeq
    assert(got == cases.map(_._2), s"luhn vectors diverged: $got")
    val text = "pay 4111 1111 1111 1111 or 3782-8224-6310-005 " +
      "but never 1234 5678 9012 3456 ok"
    val n = Seq(text).toDF("t")
      .select(Curation.luhnValidCount(col("t"))).as[Int].head()
    assert(n == 2, s"expected 2 valid cards, got $n")
  }

  test("scriptCount/dominantScript: real multilingual strings route to " +
      "their writing system; ties break alphabetically; digits are none") {
    val rows = Seq(
      (1L, "\u4F60\u597D\u4E16\u754C"),              // Chinese
      (2L, "\u041F\u0440\u0438\u0432\u0435\u0442"),  // Russian
      (3L, "\u03B3\u03B5\u03B9\u03AC \u03C3\u03BF\u03C5"), // Greek
      (4L, "\uC548\uB155\uD558\uC138\uC694"),        // Korean (Hangul)
      (5L, "\u0645\u0631\u062D\u0628\u0627"),        // Arabic
      (6L, "abc \u4F60\u597D def"),                  // Latin-dominant mix
      (7L, "123 456 !!!"),                           // no script at all
      (8L, "a\u0410"))                               // 1 latin + 1 cyrillic tie
      .toDF("id", "t")
    val counts = TextAnalysis.ScriptRanges.map { case (n, r) =>
      n -> TextAnalysis.scriptCount(col("t"), r)
    }
    val got = rows.select(col("id"),
      TextAnalysis.dominantScript(counts).as("dom"),
      counts.find(_._1 == "cjk").get._2.as("cjk"),
      counts.find(_._1 == "latin").get._2.as("latin"))
      .as[(Long, String, Int, Int)].collect().map(r => r._1 -> r).toMap
    assert(got(1L)._2 == "cjk" && got(1L)._3 == 4)
    assert(got(2L)._2 == "cyrillic")
    assert(got(3L)._2 == "greek")
    assert(got(4L)._2 == "hangul")
    assert(got(5L)._2 == "arabic")
    assert(got(6L)._2 == "latin" && got(6L)._3 == 2 && got(6L)._4 == 6)
    assert(got(7L)._2 == "none")
    assert(got(8L)._2 == "cyrillic", "tie must break to the smaller name")
  }

  test("scriptCounts (fused one-pass CharClassCounts) == per-script " +
      "scriptCount regex form on nulls, empties, surrogates, and mixes") {
    val rows = Seq(
      (1L, "你好世界"),
      (2L, "Привет abc"),
      (3L, "γειά σου"),
      (4L, "안녕 ᄀᇿ 가힯 edges"),
      (5L, "مرحبا ݐݿ"),
      (6L, "abc ABC Àɏ xyz 123"),
      (7L, ""),                                       // empty
      (8L, null.asInstanceOf[String]),                // null -> null array
      (9L, "a😀b𝕏"),             // emoji + math bold:
      // surrogates match NO class in either form (regex drops the
      // codepoint; the char loop counts neither surrogate)
      (10L, "؀ۿЀӿͰϿ mixed boundary chars"))
      .toDF("id", "t")
    val regexCols = TextAnalysis.ScriptRanges.map { case (n, r) =>
      TextAnalysis.scriptCount(col("t"), r).as(s"rx_$n")
    }
    val fused = TextAnalysis.scriptCounts(col("t")).as("sc")
    val got = rows.select(col("id") +: fused +: regexCols: _*).collect()
    got.foreach { r =>
      val id = r.getLong(0)
      if (r.isNullAt(1)) {
        // null text: every regex count is null too
        (2 until r.length).foreach(i => assert(r.isNullAt(i),
          s"id=$id: fused null but regex col $i is not"))
      } else {
        val sc = r.getSeq[Int](1)
        TextAnalysis.ScriptRanges.indices.foreach { i =>
          assert(sc(i) == r.getInt(2 + i),
            s"id=$id script ${TextAnalysis.ScriptRanges(i)._1}: " +
              s"fused ${sc(i)} != regex ${r.getInt(2 + i)}")
        }
      }
    }
    // non-vacuity: the surrogate row counted exactly its BMP latin chars
    val row9 = got.find(_.getLong(0) == 9L).get
    assert(row9.getSeq[Int](1).sum == 2, "only 'a' and 'b' count in row 9")
  }

  test("htmlToText: scripts/styles/comments vanish, blocks break, entities decode once") {
    import graft.text.HtmlText
    val html = """<HTML><head><TITLE> My &amp; Title </TITLE>
      |<SCRIPT type="x">if (a<b && c>d) { alert("<p>not text</p>") }</SCRIPT>
      |<style>p { color: red }</style></head>
      |<body><!-- <p>commented out</p> -->
      |<h1>Header</h1><p>one &amp;lt; two</p><ul><li>item</li></ul>
      |<p>line<br/>break&nbsp;&#39;quoted&#39;</p></body></HTML>""".stripMargin
    val got = Seq(html).toDF("h")
      .select(HtmlText.htmlToText($"h").as("t"), HtmlText.htmlTitle($"h").as("ti"))
      .as[(String, String)].head()
    assert(got._2 == "My &amp; Title")  // title is extracted, not decoded
    assert(!got._1.contains("alert") && !got._1.contains("color"), got._1)
    assert(!got._1.contains("commented"), got._1)
    assert(got._1.contains("Header\n"), got._1)          // block closer → newline
    // single-pass decode: &amp;lt; becomes the literal "&lt;", not "<"
    assert(got._1.contains("one &lt; two"), got._1)
    assert(got._1.contains("line\nbreak 'quoted'"), got._1)
    assert(!got._1.contains("  "), got._1)               // collapsed spaces
  }

  test("canonicalizeUrl collapses case/port/tracking/order/slash/fragment variants") {
    import graft.text.UrlOps
    val urls = Seq(
      "HTTPS://WWW.Example.COM:443/Path/a/?utm_source=x&b=2&a=1#frag",
      "https://example.com/Path/a?a=1&b=2",
      "http://example.com:80/Path/a?a=1&b=2",     // different scheme survives
      "https://example.com/Path/A?a=1&b=2",       // path case survives
      null)
    val got = urls.toDF("u").select(UrlOps.canonicalizeUrl($"u")).as[String].collect()
    assert(got(0) == "https://example.com/Path/a?a=1&b=2")
    assert(got(1) == got(0))
    assert(got(2) == "http://example.com/Path/a?a=1&b=2")
    assert(got(3) == "https://example.com/Path/A?a=1&b=2")
    assert(got(4) == null)
    // NOT the scheme's default port → a real distinct service, kept
    val cross = Seq("http://example.com:443/x", "https://example.com:80/x")
      .toDF("u").select(UrlOps.canonicalizeUrl($"u")).as[String].collect()
    assert(cross(0) == "http://example.com:443/x")
    assert(cross(1) == "https://example.com:80/x")
  }

  test("compressionRatio orders repetitive < natural < random; codegen + SQL agree") {
    val rep = "spam spam spam " * 60
    val nat = "the quick brown fox jumps over the lazy dog and then wanders " +
      "slowly home across nineteen quiet frozen meadows before sunrise " * 4
    val rnd = (new scala.util.Random(42)).alphanumeric.take(900).mkString
    val df = Seq(("rep", rep), ("nat", nat), ("rnd", rnd), ("empty", ""))
      .toDF("k", "t")
    val got = df.select($"k", TextAnalysis.compressionRatio($"t").as("r"))
      .as[(String, Double)].collect().toMap
    assert(got("rep") < got("nat") && got("nat") < got("rnd"),
      s"ordering violated: $got")
    assert(got("rep") < 0.2 && got("rnd") > 0.7 && got("empty") == 1.0)
    // SQL registration path computes the identical value
    graft.functions.GraftFunctions.register(spark)
    df.createOrReplaceTempView("cr_docs")
    val viaSql = spark.sql(
      "SELECT k, graft_compression_ratio(t) AS r FROM cr_docs")
      .as[(String, Double)].collect().toMap
    assert(viaSql == got)
  }

  test("inverted index: postings round-trip, bucket pruning reads only wanted buckets") {
    import graft.text.Retrieval
    val docs = Tables.documents(spark, sf001).filter($"doc_id" < 200)
    val dir = java.nio.file.Files.createTempDirectory("inv-idx").toString + "/idx"
    Retrieval.buildInvertedIndex(docs, "doc_id", $"text", dir, buckets = 16)
    val postings = Retrieval.lookupPostings(spark, dir, Seq("spark", "window"), 16)
    // ground truth from a straight recount
    val truth = docs.select($"doc_id", explode(split($"text", " ")).as("term"))
      .filter($"term".isin("spark", "window"))
      .groupBy("term", "doc_id").count()
      .as[(String, Long, Long)].collect().toSet
    val got = postings.select($"term", $"doc_id", $"tf")
      .as[(String, Long, Long)].collect().toSet
    assert(got == truth && got.nonEmpty)
    // partition pruning: the scan only touches the wanted bucket dirs
    val scanned = postings.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString
    assert(scanned.contains("bucket"), "bucket partition filter missing from scan")
  }

  test("bm25: docs containing more query terms outscore docs with none") {
    import graft.text.Retrieval
    val docs = Seq(
      (1L, "spark shuffle window spark spark"),
      (2L, "spark alone here"),
      (3L, "nothing relevant at all whatsoever")).toDF("doc_id", "text")
    val got = Retrieval.bm25(docs, "doc_id", $"text", Seq("spark", "shuffle", "window"))
      .as[(Long, Double)].collect().toMap
    assert(got(1L) > got(2L) && !got.contains(3L))
  }

  test("bloomKeyProbe honors requested sizing past the runtime bloom-join " +
      "conf caps (false-positive rate stays near fpp)") {
    // shrink the caps to a degenerate sketch; the probe build must raise
    // them for the requested 20k/1% sizing or fp-rate goes to ~100%
    val conf = spark.conf
    val keys = Seq("spark.sql.optimizer.runtime.bloomFilter.maxNumItems",
      "spark.sql.optimizer.runtime.bloomFilter.maxNumBits")
    val saved = keys.map(k => k -> conf.getOption(k))
    try {
      conf.set(keys(0), "64")
      conf.set(keys(1), "512")
      val existing = spark.range(20000).select(md5(col("id").cast("string")).as("__key"))
      val probe = DedupOps.bloomKeyProbe(existing, 20000L, 0.01)
      val fresh = spark.range(20000, 40000)
        .select(md5(col("id").cast("string")).as("__key"))
      val fpRate = fresh.filter(probe(col("__key"))).count().toDouble / 20000
      assert(fpRate < 0.05, f"false-positive rate $fpRate%.3f — sizing was capped")
      // and the caps are restored afterwards
      assert(conf.get(keys(0)) == "64" && conf.get(keys(1)) == "512")
      // hits still probe true
      val hits = existing.filter(probe(col("__key"))).count()
      assert(hits == 20000L, "a planted key failed the probe")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("connectedComponentsDistributed: pointer jumping on a multi-partition " +
      "long-diameter graph matches the local union-find exactly") {
    // chain 0-1-…-79 (diameter 79: pointer jumping must converge in O(log)
    // rounds inside the default maxIter=30, where plain min-propagation
    // would need 79), plus an island and isolated docs; edges spread over
    // 8 partitions so the distributed path actually shuffles
    val chain = (0L until 79L).map(i => (i, i + 1))
    val island = Seq((200L, 201L), (201L, 202L))
    val pairs = (chain ++ island).toDF("d1", "d2").repartition(8)
    val docs = ((0L to 79L) ++ (200L to 202L) ++ Seq(500L)).toDF("doc")
    // driverMaxPairs=0 forces the distributed pointer-jumping path
    val dist = DedupOps.connectedComponents(pairs, docs, driverMaxPairs = 0L)
      .as[(Long, Long)].collect().toMap
    val local = DedupOps.connectedComponents(pairs, docs)
      .as[(Long, Long)].collect().toMap
    assert(dist == local, "distributed labels diverged from the local union-find")
    assert((0L to 79L).forall(dist(_) == 0L), "chain must collapse to min id 0")
    assert((200L to 202L).forall(dist(_) == 200L))
    assert(dist(500L) == 500L, "isolated doc labels itself")
  }

  test("sharedSpans: a verbatim shared sentence surfaces as one aligned span; " +
      "unrelated docs stay silent") {
    val shared = "the quick brown fox jumps over the lazy dog near the river bank"
    val d1 = "zzz first preamble junk 111 " + shared + " tail one xyz"
    val d2 = "different lead-in text 22222 here " + shared + " other tail"
    val d3 = "completely unrelated content about spark shuffles and parquet files"
    val docs = Seq((1L, d1), (2L, d2), (3L, d3)).toDF("doc_id", "text")
    val spans = DedupOps.sharedSpans(docs, "doc_id", col("text"))
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(spans.nonEmpty, "shared sentence not detected")
    assert(spans.forall(s => s._1 == 1L && s._2 == 2L), "span on unrelated pair")
    val best = spans.maxBy(_._5)
    val (o1, o2) = (d1.indexOf(shared) + 1L, d2.indexOf(shared) + 1L)
    // fingerprint granularity: the recovered span must sit inside the true
    // region (± window slack) and cover most of it
    assert(math.abs(best._3 - o1) <= 11, s"start1 ${best._3} far from $o1")
    assert(math.abs(best._4 - o2) <= 11, s"start2 ${best._4} far from $o2")
    assert(best._6 >= shared.length - 11 && best._6 <= shared.length + 22,
      s"approx_chars ${best._6} vs true ${shared.length}")
    // both docs aligned at the same relative offset: one island only
    assert(spans.count(s => s._5 == best._5) == 1)
  }

  test("rrfFuse: duplicated id within one list counts once, at its best rank") {
    import graft.text.Retrieval
    val a = Seq((1L, 1L), (1L, 3L), (2L, 2L)).toDF("doc_id", "rank") // dup id 1
    val b = Seq((1L, 2L), (2L, 1L)).toDF("doc_id", "rank")
    val got = Retrieval.rrfFuse(Seq(a, b), "doc_id", "rank")
      .select($"doc_id", $"rrf", $"n_lists").as[(Long, Double, Long)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    // id 1: 1/(60+1) + 1/(60+2), NOT + 1/(60+3); n_lists stays 2
    // (rrf carries the round-6 output contract, hence the 1e-6 tolerance)
    assert(got(1L)._2 == 2L && got(2L)._2 == 2L)
    assert(math.abs(got(1L)._1 - (1.0 / 61 + 1.0 / 62)) < 1e-6)
    assert(math.abs(got(2L)._1 - (1.0 / 62 + 1.0 / 61)) < 1e-6)
  }

  test("lshCandidatePairs: bucket cap keeps clusters connected without quadratic pairs") {
    // 60 identical docs -> every band bucket holds all 60
    val clones = (0 until 60).map(i => (i.toLong, "same words all the way down here"))
    val df = (clones :+ (999L, "completely different text payload")).toDF("doc_id", "text")
    val sig = DedupOps.minhashSignatures(df, "doc_id", $"text", 2)
    val uncapped = DedupOps.lshCandidatePairs(sig, "doc_id")
      .as[(Long, Long)].collect().toSet
    assert(uncapped.size == 60 * 59 / 2)
    // cap 10 -> oversized buckets chain: O(m) pairs, same single component
    val capped = DedupOps.lshCandidatePairs(sig, "doc_id", maxBucket = 10)
      .as[(Long, Long)].collect().toSet
    assert(capped.size == 59, s"expected 59 chain pairs, got ${capped.size}")
    val docs = df.select($"doc_id".as("doc"))
    val labels = DedupOps.connectedComponents(capped.toSeq.toDF("d1", "d2"), docs)
      .as[(Long, Long)].collect().toMap
    assert((0L until 60L).forall(labels(_) == 0L) && labels(999L) == 999L)
    // under the cap, output is exactly the uncapped pair set
    val same = DedupOps.lshCandidatePairs(sig, "doc_id", maxBucket = 60)
      .as[(Long, Long)].collect().toSet
    assert(same == uncapped)
  }

  test("deterministicSample: exact k per group, invariant to partitioning, seed-sensitive") {
    import graft.text.Curation
    val docs = Tables.documents(spark, sf001).select("doc_id", "source")
    def sample(df: org.apache.spark.sql.DataFrame, seed: String) =
      Curation.deterministicSample(df, "source", "doc_id", 3, seed)
        .as[(Long, String)].collect().toSet
    val a = sample(docs, "42")
    val b = sample(docs.repartition(17), "42")   // layout must not matter
    assert(a == b && a.groupBy(_._2).forall(_._2.size == 3))
    assert(sample(docs, "43") != a)              // different seed, different subset
  }

  test("weightedSample: exact k, dominant weight wins, layout-invariant") {
    import graft.text.Curation
    // one row with overwhelming weight: its log-priority ln(u)/1e12 ≈ 0
    // beats every tiny-weight row (ln(u)/0.001 is hugely negative)
    val rows = (1L to 10L).map(i => (i, if (i == 7L) 1e12 else 0.001))
    val df = rows.toDF("id", "w")
    val got = Curation.weightedSample(df, "id", $"w", k = 3)
      .select("id").as[Long].collect().toSeq
    assert(got.size == 3 && got.head == 7L, got.toString)
    val shuffled = Curation.weightedSample(df.repartition(7), "id", $"w", k = 3)
      .select("id").as[Long].collect().toSeq
    assert(got == shuffled, "partition layout changed the weighted sample")
  }

  test("stratifiedAllocation: Hamilton hand case — targets sum to k, " +
      "largest remainder wins, ties toward smaller name") {
    import graft.text.Curation
    // counts a=7, b=2, c=1, k=5: bases 3/1/0, rems 5/0/5 -> one seat,
    // tie a-vs-c on rem 5 goes to 'a' -> targets 4/1/0
    val df = (Seq.fill(7)("a") ++ Seq.fill(2)("b") ++ Seq("c")).toDF("s")
    val got = Curation.stratifiedAllocation(df, "s", 5)
      .orderBy("s").as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("a", 7L, 4L), ("b", 2L, 1L), ("c", 1L, 0L)), got.toString)
    assert(got.map(_._3).sum == 5L)
  }

  test("stratifiedSample: kept counts equal the allocation targets") {
    import graft.text.Curation
    val docs = Tables.documents(spark, sf001).select("doc_id", "source")
    val targets = Curation.stratifiedAllocation(docs, "source", 50)
      .as[(String, Long, Long)].collect().map(t => t._1 -> t._3).toMap
    val kept = Curation.stratifiedSample(docs, "source", "doc_id", 50)
      .groupBy("source").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(targets.values.sum == 50L)
    targets.foreach { case (s, t) =>
      assert(kept.getOrElse(s, 0L) == t, s"stratum $s kept ${kept.get(s)} want $t")
    }
  }

  test("dsirLogWeights: target-like raw docs outweigh off-target docs") {
    import graft.text.Curation
    val target = Seq.tabulate(8)(i => (100L + i, "the cat sat on the mat"))
      .toDF("doc_id", "text")
    val raw = Seq(
      (1L, "the cat sat on the mat again"),   // mostly target n-grams
      (2L, "zq xv qqq zzz kkk vvv www"))      // none
      .toDF("doc_id", "text")
    val byId = Curation.dsirLogWeights(raw, target, "doc_id", col("text"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(byId(1L)._1 > byId(2L)._1)
    // n_feats = unigrams + bigrams: 7 tokens -> 7 + 6 = 13
    assert(byId(1L)._2 == 13L && byId(2L)._2 == 13L)
  }

  test("hashedLinearScore: constant weights hit the closed-form sigmoid, " +
      "empty docs drop, threshold keeps inclusively") {
    import graft.text.Curation
    val docs = Seq(
      (1L, "the cat sat"),   // 3 unigrams + 2 bigrams = 5 features
      (2L, ""),              // no features -> no row
      (3L, "zq xv"))         // 2 + 1 = 3 features
      .toDF("doc_id", "text")
    // constant weight w: score = sigmoid(w) regardless of features
    val up = Curation.hashedLinearScore(docs, "doc_id", col("text"),
      _ => lit(0.25)).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getBoolean(3)))
      .toMap
    assert(up.keySet == Set(1L, 3L))
    val sig025 = math.round(1.0 / (1.0 + math.exp(-0.25)) * 1e6) / 1e6
    assert(up(1L) == ((5L, sig025, true)) && up(3L) == ((3L, sig025, true)))
    // negative constant scores below 0.5 -> dropped by keep
    val dn = Curation.hashedLinearScore(docs, "doc_id", col("text"),
      _ => lit(-0.25)).collect().map(r => r.getBoolean(3))
    assert(dn.forall(_ == false))
    // zero weight lands exactly ON the threshold: keep is inclusive
    val eq = Curation.hashedLinearScore(docs, "doc_id", col("text"),
      _ => lit(0.0)).collect().map(r => (r.getDouble(2), r.getBoolean(3)))
    assert(eq.forall(_ == ((0.5, true))))
  }

  test("normalizeText: every fold rule pinned; plain ASCII is a fixpoint") {
    import graft.text.TextAnalysis.normalizeText
    val cases = Seq(
      "he said \u201Chi\u201D" -> "he said \"hi\"",          // curly double quotes
      "it\u2019s \u2018x\u2019" -> "it's 'x'",               // curly single quotes
      "a\u2014b \u2013 c" -> "a-b - c",                       // em/en dash
      "wait\u2026 ok" -> "wait... ok",                         // ellipsis
      "a\u00A0b\u2009c" -> "a b c",                           // NBSP + thin space
      "z\u200Bw\uFEFFq" -> "zwq",                             // zero-width, BOM
      "x\u0007y\u001Fz" -> "xyz",                             // control chars
      "5\u2032 9\u2033" -> "5' 9\"",                            // primes -> ascii quotes
      "a\u2028b\u0085c" -> "a b c",                           // LINE SEP + NEL -> space
      "x\u009Cy" -> "xy",                                        // C1 control
      "  a\t\tb  " -> "a b",                                  // collapse + trim
      "plain ascii text." -> "plain ascii text.")               // fixpoint
    val df = cases.map(_._1).zipWithIndex.map { case (t, i) => (i, t) }
      .toDF("i", "t")
    val got = df.select($"i", normalizeText($"t").as("n"))
      .as[(Int, String)].collect().toMap
    cases.zipWithIndex.foreach { case ((_, want), i) =>
      assert(got(i) == want, s"case $i: got '${got(i)}' want '$want'")
    }
    // idempotent: normalizing a normal form changes nothing
    val twice = df.select(normalizeText(normalizeText($"t")).as("n2"),
      normalizeText($"t").as("n1")).filter($"n1" =!= $"n2").count()
    assert(twice == 0L)
  }

  test("ngramContainmentPairs: full quote scores 1.0 toward the quoter " +
      "while symmetric Jaccard stays low") {
    import graft.text.DedupOps
    // doc 2 is doc 1 verbatim plus a long unique tail
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta x1 x2 x3 x4 x5 x6 x7 x8 x9 x10 x11 x12"),
      (3L, "unrelated words only here"))
      .toDF("doc_id", "text")
    val c = DedupOps.ngramContainmentPairs(docs, "doc_id", col("text"), 2, 0.1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(c((1L, 2L)) == 1.0)             // doc 1's 3 bigrams all inside doc 2
    assert(c((2L, 1L)) == 0.2)             // 3 of doc 2's 15 bigrams
    assert(!c.contains((3L, 1L)) && !c.contains((1L, 3L)))
    val j = DedupOps.ngramJaccardPairs(docs, "doc_id", col("text"), 2, 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(j((1L, 2L)) == 0.2)             // symmetric view buries the quote
  }

  test("temperatureMixShares: T=1 is natural, T>1 boosts the small group " +
      "and shrinks the large one") {
    import graft.text.Curation
    val docs = Seq.tabulate(90)(i => (i.toLong, "en", "a b c d")) ++
      Seq.tabulate(10)(i => (100L + i, "zh", "x y"))
    val df = docs.toDF("doc_id", "lang", "text")
    val toks = graft.text.TextAnalysis.tokenCount(col("text")).cast("long")
    val t1 = Curation.temperatureMixShares(df, "lang", toks, temperature = 1.0)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    // en: 90*4=360 tokens, zh: 10*2=20 -> natural 360/380, 20/380
    assert(t1("en")._1 == 360L && t1("zh")._1 == 20L)
    assert(t1.values.forall(v => v._2 == v._3 && v._4 == 1.0))
    val t4 = Curation.temperatureMixShares(df, "lang", toks, temperature = 4.0)
      .collect().map(r => r.getString(0) -> (r.getDouble(3), r.getDouble(4))).toMap
    assert(t4("zh")._2 > 1.0 && t4("en")._2 < 1.0) // low-resource boosted
    assert(math.abs(t4.values.map(_._1).sum - 1.0) < 1e-5) // shares sum to 1
  }

  test("gumbelTopK: deterministic, exact k, and a dominant weight always wins") {
    import graft.text.Curation
    val w = Seq((1L, 100.0), (2L, 0.0), (3L, -1.0), (4L, 0.5), (5L, -3.0))
      .toDF("doc_id", "logw")
    def draw() = Curation.gumbelTopK(w, "doc_id", "logw", k = 3)
      .select("doc_id").as[Long].collect().toSeq
    val a = draw()
    assert(a == draw() && a.size == 3)          // pure function of (seed, id)
    // logw=100 dwarfs any Gumbel draw from the md5 uniform range
    assert(a.contains(1L))
    // a different seed may pick a different subset but stays exact-k
    val b = Curation.gumbelTopK(w, "doc_id", "logw", k = 3, seed = "7")
      .select("doc_id").as[Long].collect().toSeq
    assert(b.size == 3 && b.contains(1L))
  }

  test("blocklistFlags: parent domains block subdomains, never substring-siblings") {
    import graft.text.UrlOps
    val rows = Seq(
      (1L, "https://tracker.net/x"),        // exact
      (2L, "https://ads.tracker.net/x"),    // subdomain
      (3L, "https://nottracker.net/x"),     // substring sibling - NOT blocked
      (4L, "https://safe.org/x"),
      (5L, "https://a.b.spam.co:8080/x"),   // deep subdomain + port
      (6L, "www.ads.tracker.net/x"),        // scheme-less - still blocked
      (7L, "spam.co"),                      // bare host, no path
      (8L, "https://u:p@tracker.net/x"),    // userinfo must not mask the host
      (9L, "evil@spam.co/x"),               // scheme-less userinfo form
      (10L, "https://u@x@tracker.net/p"))   // WHATWG: host after the LAST @
      .toDF("id", "url")
    val bl = Seq("tracker.net", "spam.co").toDF("domain")
    val got = UrlOps.blocklistFlags(rows, "id", col("url"), bl)
      .select("id", "blocked").as[(Long, Boolean)].collect().toMap
    assert(got == Map(1L -> true, 2L -> true, 3L -> false, 4L -> false,
      5L -> true, 6L -> true, 7L -> true, 8L -> true, 9L -> true,
      10L -> true))
  }

  test("Md5Long ≡ conv(substring(md5,1,8),16,10) on real text; SQL-registered") {
    val docs = Tables.documents(spark, sf001)
    val mismatches = docs.select(
      TextAnalysis.md5Int32($"text").as("fast"),
      conv(substring(md5($"text"), 1, 8), 16, 10).cast("long").as("ref"))
      .filter($"fast" =!= $"ref").count()
    assert(mismatches == 0L)
    graft.functions.GraftFunctions.register(spark)
    val viaSql = spark.sql("SELECT graft_md5_long('abc') AS h").as[Long].head()
    val expected = java.lang.Long.parseLong(
      org.apache.commons.codec.digest.DigestUtils.md5Hex("abc").take(8), 16)
    assert(viaSql == expected)
  }

  test("splitAssign: deterministic, partition-invariant, fractions roughly hold") {
    import graft.text.Curation
    val docs = Tables.documents(spark, sf01).select("doc_id")
    def splits(df: org.apache.spark.sql.DataFrame) =
      Curation.splitAssign(df, "doc_id").as[(Long, String)].collect().toMap
    val a = splits(docs)
    assert(a == splits(docs.repartition(13)))    // layout must not matter
    val n = a.size.toDouble
    val frac = a.values.groupBy(identity).view.mapValues(_.size / n).toMap
    assert(math.abs(frac("train") - 0.8) < 0.1)
    assert(frac.keySet == Set("train", "val", "test"))
  }

  test("editDistancePairs: finds small in-place edits within a block, " +
      "respects the block cap, misses cross-prefix edits (documented)") {
    import graft.text.DedupOps
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (1L, base),
      (2L, base.replace("jumps", "jumped")),           // dist 2, same block
      (3L, "a totally different document body here"),  // far from everything
      (4L, "xx" + base.drop(2))                        // first-2-char edit
    ).toDF("doc_id", "text")
    val got = DedupOps.editDistancePairs(docs, "doc_id", $"text")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 2L)),
      s"expected only the (1,2) typo pair, got $got")

    // a hot block larger than maxBlock is dropped entirely
    val hot = (1L to 5L).map(i => (i, base)).toDF("doc_id", "text")
    val capped = DedupOps.editDistancePairs(hot, "doc_id", $"text",
      maxBlock = 4)
    assert(capped.count() == 0, "block over the cap must be skipped")
    val uncapped = DedupOps.editDistancePairs(hot, "doc_id", $"text")
    assert(uncapped.count() == 10, "5 identical docs -> C(5,2) zero-dist pairs")
  }

  test("prefixFilterJaccardPairs: equals the brute-force pair set (no " +
      "false negatives from pruning); plan never goes all-pairs") {
    import graft.text.DedupOps
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val got = DedupOps.prefixFilterJaccardPairs(docs, "doc_id", $"text",
      threshold = 0.5, shingle = 3)
    val plan = got.queryExecution.executedPlan.toString()
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"prefix join must stay equi-keyed:\n$plan")

    // brute force on the same shingle sets
    val arrs = docs.filter($"text".isNotNull)
      .select($"doc_id".cast("long").as("id"),
        array_sort(DedupOps.shingles($"text", 3)).as("arr"))
      .filter(size($"arr") > 0)
    val brute = arrs.select($"id".as("a"), $"arr".as("aa"))
      .crossJoin(arrs.select($"id".as("b"), $"arr".as("ab")))
      .filter($"a" < $"b")
      .withColumn("i", size(array_intersect($"aa", $"ab")).cast("bigint"))
      .filter($"i".cast("double") / (size($"aa") + size($"ab") - $"i") >= 0.5)
      .select($"a", $"b").as[(Long, Long)].collect().toSet
    val pruned = got.select($"doc_a", $"doc_b")
      .as[(Long, Long)].collect().toSet
    assert(pruned == brute,
      s"pruned=${pruned.size} brute=${brute.size}: sets must be identical")
  }

  test("vocab coverage cum_frac is nondecreasing and bounded by 1") {
    val rows = SparkEntry.queries("q107_vocab_coverage")(spark, sf001)
      .select("cum_frac").as[Double].collect()
    assert(rows.nonEmpty && rows.sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
    assert(rows.last <= 1.0 + 1e-9)
  }

  test("boilerplateStrip: flagged lines vanish from EVERY doc (first copy " +
      "included), low-df lines survive the minDf floor, all-boiler docs stay") {
    import graft.text.Curation
    // src a: 4 docs, "nav" in all 4 (df=4 > 0.5*4 -> strip), "rare" in 2
    // (df=2 passes minDf but 2 == 0.5*4 is NOT > threshold -> keep)
    val docs = Seq(
      (1L, "a", "nav\nalpha\nrare"),
      (2L, "a", "nav\nbeta\nrare"),
      (3L, "a", "nav\ngamma"),
      (4L, "a", "nav"), // every line boiler -> must survive as empty doc
      // src b: 2 docs sharing "nav" (df=2 > 0.5*2? 2 > 1 yes AND df>=2 ->
      // stripped even in a 2-doc group; the minDf floor is for df=2..k
      // only when the fraction test fails)
      (5L, "b", "nav\ndelta"),
      (6L, "b", "nav\nepsilon"))
      .toDF("doc_id", "source", "text")
    val out = Curation.boilerplateStrip(docs, "doc_id", "source", col("text"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out(1L) == (("alpha\nrare", 3L, 1L))) // first copy of nav gone too
    assert(out(2L) == (("beta\nrare", 3L, 1L)))
    assert(out(3L) == (("gamma", 2L, 1L)))
    assert(out(4L) == (("", 1L, 1L))) // fully-boiler doc preserved, empty
    assert(out(5L) == (("delta", 2L, 1L)))
    assert(out(6L) == (("epsilon", 2L, 1L)))
    assert(out.size == 6)
  }

  test("boilerplateStrip: a line duplicated WITHIN one doc counts df=1 " +
      "(doc frequency, not occurrence count) and is kept") {
    import graft.text.Curation
    val docs = Seq(
      (1L, "a", "echo\necho\necho\nbody1"),
      (2L, "a", "body2"), (3L, "a", "body3"), (4L, "a", "body4"))
      .toDF("doc_id", "source", "text")
    val out = Curation.boilerplateStrip(docs, "doc_id", "source", col("text"))
      .filter(col("doc_id") === 1L).collect().head
    assert(out.getString(2) == "echo\necho\necho\nbody1" && out.getLong(4) == 0L)
  }

  test("exactSubstrSpans: equals a brute-force gram-count + interval-merge " +
      "reference (cross-doc, within-doc, unique and too-short fixtures)") {
    val shared = "the quick brown fox jumps over the lazy dog again and again"
    val rep = "repeated-block-of-text-long-enough-to-span "
    val texts = Map(
      1L -> s"first document unique opening $shared tail one ends here",
      2L -> s"second doc opens differently!! $shared closing words differ",
      3L -> "entirely unique content with no twenty-four char overlaps at all",
      4L -> s"prefix $rep$rep suffix",
      5L -> "tiny")
    val docs = texts.toSeq.toDF("doc_id", "text")
    val L = 24
    val got = DedupOps.exactSubstrSpans(docs, "doc_id", col("text"), sub = L)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    // brute force: count every L-gram corpus-wide, mark positions whose
    // gram occurs >= 2 times, merge marked positions with gap <= L
    val counts = scala.collection.mutable.Map.empty[String, Int]
      .withDefaultValue(0)
    texts.values.foreach { t =>
      if (t.length >= L)
        (0 to t.length - L).foreach(p => counts(t.substring(p, p + L)) += 1)
    }
    val expected = texts.flatMap { case (id, t) =>
      val marked =
        if (t.length < L) Seq.empty[Int]
        else (0 to t.length - L).filter(p => counts(t.substring(p, p + L)) >= 2)
      val islands = marked.foldLeft(Vector.empty[Vector[Int]]) { (acc, p) =>
        acc.lastOption match {
          case Some(run) if p - run.last <= L => acc.init :+ (run :+ p)
          case _ => acc :+ Vector(p)
        }
      }
      islands.map { run =>
        val (s0, e0) = (run.head + 1, run.last + L) // 1-based inclusive chars
        (id, s0.toLong, e0.toLong, (e0 - s0 + 1).toLong, run.size.toLong)
      }
    }.toSet
    assert(expected.exists(_._1 == 1L) && expected.exists(_._1 == 4L),
      "fixture must plant cross-doc and within-doc duplication")
    assert(!expected.exists(r => r._1 == 3L || r._1 == 5L),
      "fixture docs 3/5 must be clean")
    assert(got == expected, s"got $got\nexpected $expected")
    // a doc-1 span covers the whole planted shared text (it may extend a
    // char on each side — the flanking spaces are shared with doc 2 too)
    val i1 = texts(1L).indexOf(shared)
    assert(got.exists { case (id, s, e, _, _) =>
      id == 1L && s <= i1 + 1 && e >= i1 + shared.length },
      s"no doc-1 span covers [${i1 + 1}, ${i1 + shared.length}]: $got")
    // consistency with the fingerprint-sampled q126 rung: every winnowing
    // shared span between docs 1 and 2 overlaps an exact span char range
    val winn = DedupOps.sharedSpans(docs, "doc_id", col("text"))
      .filter(col("d1") === 1L && col("d2") === 2L)
      .select("start1", "approx_chars").as[(Long, Long)].collect()
    assert(winn.nonEmpty, "winnowing must also see the planted span")
    val exact1 = got.filter(_._1 == 1L).map(r => (r._2, r._3))
    winn.foreach { case (s, len) =>
      assert(exact1.exists { case (es, ee) => s <= ee && s + len - 1 >= es },
        s"winnowing span at $s len $len outside every exact span $exact1")
    }
  }

  test("exactSubstrCard + exactSubstrCut: card fractions agree with the " +
      "span sum, clean docs keep verbatim, dup spans splice out exactly") {
    val shared = "the quick brown fox jumps over the lazy dog again and again"
    val rep = "repeated-block-of-text-long-enough-to-span "
    val texts = Map(
      1L -> s"first document unique opening $shared tail one ends here",
      2L -> s"second doc opens differently!! $shared closing words differ",
      3L -> "entirely unique content with no twenty-four char overlaps at all",
      4L -> s"prefix $rep$rep suffix",
      5L -> "tiny",
      6L -> "identical twin documents with fully duplicated text bodies!",
      7L -> "identical twin documents with fully duplicated text bodies!")
    val docs = texts.toSeq.toDF("doc_id", "text")
    val L = 24
    val spans = DedupOps.exactSubstrSpans(docs, "doc_id", col("text"),
        sub = L)
      .as[(Long, Long, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3)).sorted).toMap

    val card = DedupOps.exactSubstrCard(docs, "doc_id", col("text"),
        sub = L, maxDupFrac = 0.2)
      .collect().map(r => r.getAs[Long]("doc") ->
        (r.getAs[Long]("n_chars"), r.getAs[Long]("n_spans"),
          r.getAs[Long]("dup_chars"), r.getAs[Double]("dup_frac"),
          r.getAs[Boolean]("keep"))).toMap
    assert(card.keySet == texts.keySet, "every doc gets a card row")
    texts.foreach { case (id, t) =>
      val ss = spans.getOrElse(id, Array.empty[(Long, Long)])
      val (nc, ns, dc, frac, keep) = card(id)
      assert(nc == t.length)
      assert(ns == ss.length && dc == ss.map { case (s, e) => e - s + 1 }.sum)
      assert(math.abs(frac - dc.toDouble / nc) < 1e-6)
      assert(keep == (frac < 0.2), s"doc $id keep mismatch")
    }
    // planted expectations: clean/short docs keep, the self-repeating and
    // fully-duplicated docs drop
    assert(card(3L)._5 && card(5L)._5 && !card(4L)._5 && !card(6L)._5)
    assert(card(6L)._4 == 1.0, "identical twin should be 100% duplicated")

    val clean = DedupOps.exactSubstrCut(docs, "doc_id", col("text"),
        sub = L)
      .collect().map(r => r.getAs[Long]("doc") ->
        r.getAs[String]("clean_text")).toMap
    assert(clean.keySet == texts.keySet)
    texts.foreach { case (id, t) =>
      val ss = spans.getOrElse(id, Array.empty[(Long, Long)])
      // independent splice: drop 1-based inclusive [s, e] ranges
      val drop = ss.flatMap { case (s, e) => (s.toInt to e.toInt) }.toSet
      val expect = t.zipWithIndex
        .collect { case (ch, i) if !drop.contains(i + 1) => ch }.mkString
      assert(clean(id) == expect, s"doc $id spliced wrong: " +
        s"'${clean(id)}' vs '$expect'")
    }
    assert(clean(3L) == texts(3L) && clean(5L) == texts(5L))
    assert(clean(6L).isEmpty && clean(7L).isEmpty,
      "fully-duplicated docs must cut to empty, not vanish")
  }

  test("lshClusterEdges: transitive closure identical to the clique pairs " +
      "(same clusters), with linear edge volume") {
    val docs = spark.read.parquet(s"$sf01/documents.parquet")
      .filter(col("doc_id") < 400)
    val sig = DedupOps.minhashSignatures(docs, "doc_id", col("text"), 2)
    val clique = DedupOps.lshCandidatePairs(sig, "doc_id")
    val chain = DedupOps.lshClusterEdges(sig, "doc_id")
    val (nClique, nChain) = (clique.count(), chain.count())
    assert(nChain <= nClique, s"chain $nChain > clique $nClique")
    def comps(pairs: org.apache.spark.sql.DataFrame) =
      DedupOps.connectedComponents(pairs,
          docs.select(col("doc_id").as("doc")))
        .as[(Long, Long)].collect().toSeq.sorted
    assert(comps(chain) == comps(clique),
      "chain edges must yield identical connected components")
  }

  test("exactSubstrContamSpans/Card: brute-force equality on a planted " +
      "train/eval fixture; eval-internal duplication alone never flags") {
    val trainShared =
      "this exact training sentence appears verbatim in evaluation data"
    val rep = "eval-only-repeated-segment-long-enough-for-detection "
    val train = Map(
      10L -> s"train document one carries $trainShared inside its body",
      11L -> "train document two with its own unrelated content entirely")
    val ev = Map(
      20L -> s"eval doc leading text $trainShared trailing text here",
      21L -> s"prefix $rep$rep suffix unrelated to training corpus data",
      22L -> "wholly original evaluation content with zero overlap anywhere")
    val trainDf = train.toSeq.toDF("doc_id", "text")
    val evalDf = ev.toSeq.toDF("doc_id", "text")
    val L = 24
    val got = DedupOps.exactSubstrContamSpans(evalDf, trainDf, "doc_id",
        col("text"), sub = L)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    // brute force: eval positions whose 24-gram appears ANYWHERE in train
    val trainGrams = train.values.flatMap(t =>
      if (t.length < L) Nil
      else (0 to t.length - L).map(p => t.substring(p, p + L))).toSet
    val expected = ev.flatMap { case (id, t) =>
      val marked =
        if (t.length < L) Seq.empty[Int]
        else (0 to t.length - L)
          .filter(p => trainGrams.contains(t.substring(p, p + L)))
      val islands = marked.foldLeft(Vector.empty[Vector[Int]]) { (acc, p) =>
        acc.lastOption match {
          case Some(run) if p - run.last <= L => acc.init :+ (run :+ p)
          case _ => acc :+ Vector(p)
        }
      }
      islands.map { run =>
        val (s0, e0) = (run.head + 1, run.last + L)
        (id, s0.toLong, e0.toLong, (e0 - s0 + 1).toLong, run.size.toLong)
      }
    }.toSet
    assert(got == expected, s"got $got\nexpected $expected")
    assert(got.exists(_._1 == 20L), "planted train overlap must be found")
    assert(!got.exists(r => r._1 == 21L || r._1 == 22L),
      "eval-internal repetition / clean docs must not flag")
    // the flagged span covers the planted shared sentence
    val i20 = ev(20L).indexOf(trainShared)
    assert(got.exists { case (id, s, e, _, _) =>
      id == 20L && s <= i20 + 1 && e >= i20 + trainShared.length })

    val card = DedupOps.exactSubstrContamCard(evalDf, trainDf, "doc_id",
        col("text"), sub = L, maxContamFrac = 0.05)
      .collect().map(r => r.getAs[Long]("doc") ->
        (r.getAs[Long]("n_chars"), r.getAs[Long]("n_spans"),
          r.getAs[Long]("contam_chars"), r.getAs[Double]("contam_frac"),
          r.getAs[Boolean]("clean"))).toMap
    assert(card.keySet == ev.keySet)
    assert(!card(20L)._5 && card(20L)._3 >= trainShared.length)
    assert(card(21L) == (ev(21L).length.toLong, 0L, 0L, 0.0, true))
    assert(card(22L) == (ev(22L).length.toLong, 0L, 0L, 0.0, true))
  }

}
