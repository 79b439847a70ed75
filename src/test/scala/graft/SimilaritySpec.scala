package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.sim.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine of a vector with itself is 1") {
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(1.0f, 2.0f, 3.0f))).toDF("a", "b")
    val got = df.select(
      Similarity.cosine(Similarity.asDouble($"a"), Similarity.asDouble($"b")))
      .as[Double].head()
    assert(math.abs(got - 1.0) < 1e-12)
  }

  test("mmrSelect: diversifies — skips the near-copy of the first pick that " +
      "plain top-k would take, and rank 1 is the max-relevance item") {
    // query along e1; candidates: 1 ≈ e1 (top rel), 2 = near-copy of 1
    // (sim-to-1 ≈ 1), 3 = still relevant (rel 0.8) but diverse
    // (sim-to-1 ≈ 0.83). Plain top-2 by rel = {1, 2}; at λ = 0.4 the
    // diversity penalty flips the second pick to 3:
    //   score(2) = .4·.9982 − .6·.9999 ≈ −0.201
    //   score(3) = .4·.8    − .6·.829  ≈ −0.177  > score(2)
    val q = Seq((0L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val cands = Seq(
      (1L, Seq(1.0f, 0.05f)),
      (2L, Seq(1.0f, 0.06f)),
      (3L, Seq(0.8f, 0.6f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.mmrSelect(cands, "vec_id", "embedding", q,
        k = 2, lambda = 0.4)
      .as[(Int, Long, Double, Double)].collect().toSeq
    assert(got.map(_._2) == Seq(1L, 3L), s"got ${got.map(_._2)}")
    assert(got.head._1 == 1 && got.head._3 > got(1)._3) // rank-1 has top rel
    // and with λ = 1 (no diversity pressure) it degenerates to top-k by rel
    val pure = Similarity.mmrSelect(cands, "vec_id", "embedding", q,
      k = 2, lambda = 1.0)
    assert(pure.as[(Int, Long, Double, Double)].collect().map(_._2).toSeq
      == Seq(1L, 2L))
  }

  test("bruteForceTopK returns k ranked neighbors per query") {
    val e = Tables.embeddings(spark, sf001)
    val topk = Similarity.bruteForceTopK(
      e.filter($"vec_id" < 5), e, "vec_id", "embedding", 3)
    val byQ = topk.groupBy("qid").agg(count(lit(1)).as("n"), max("rank").as("mx"))
      .as[(Long, Long, Int)].collect()
    assert(byQ.length == 5 && byQ.forall(r => r._2 == 3 && r._3 == 3))
    // ranks ordered by descending sim
    val sims = topk.filter($"qid" === 0).orderBy("rank").select("sim").as[Double].collect()
    assert(sims.sorted.reverse.sameElements(sims))
  }

  test("lshTopK achieves nonzero overlap with brute force (approximate)") {
    val e = Tables.embeddings(spark, sf001)
    val q = e.filter($"vec_id" < 10)
    val exact = Similarity.bruteForceTopK(q, e, "vec_id", "embedding", 3)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshTopK(q, e, "vec_id", "embedding", 3, nPlanes = 4)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    assert(approx.nonEmpty, "LSH returned nothing")
    assert(exact.intersect(approx).nonEmpty, "LSH found none of the true top-k")
  }

  test("zero-norm vectors have no cosine: excluded from top-k and pairs, " +
      "no ANSI divide-by-zero crash") {
    val corpus = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.9f, 0.1f)),
      (2L, Seq(0.0f, 0.0f)), // zero norm -> sim undefined (NULL)
      (3L, Seq(0.5f, 0.5f))).toDF("vec_id", "embedding")
    val q = corpus.filter($"vec_id" === 0)
    val top = Similarity.bruteForceTopK(q, corpus, "vec_id", "embedding", 3)
      .orderBy("rank").select("cid").as[Long].collect().toSeq
    assert(top == Seq(1L, 3L), s"zero-norm vector should be excluded, got $top")
    val pairs = Similarity.cosineNearDupPairs(corpus, "vec_id", "embedding",
      threshold = -1.0, strategy = "blocked")
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L),
      "zero-norm vector should pair with nothing")
    assert(pairs.contains((0L, 1L)))
  }

  test("cosineNearDupPairs: every strategy reproduces the all-pairs result " +
      "on the fixture (blocked always; LSH at recall-1 parameters)") {
    val e = Tables.embeddings(spark, sf001)
    def got(strategy: String, bandBits: Int = 8, bands: Int = 0) =
      Similarity.cosineNearDupPairs(e, "vec_id", "embedding", 0.3,
        bandBits = bandBits, bands = bands, strategy = strategy)
        .select("d1", "d2", "sim").as[(Long, Long, Double)].collect().toSet
    // ground truth: explicit all-pairs with the identical sim expression
    val v = e.select($"vec_id".as("id"), Similarity.asDouble($"embedding").as("v"))
      .withColumn("n", Similarity.norm($"v"))
    val exact = v.toDF("d1", "v1", "n1").crossJoin(v.toDF("d2", "v2", "n2"))
      .filter($"d1" < $"d2")
      .withColumn("sim", round(Similarity.dot($"v1", $"v2") / ($"n1" * $"n2"), 6))
      .filter($"sim" >= 0.3)
      .select("d1", "d2", "sim").as[(Long, Long, Double)].collect().toSet
    assert(exact.nonEmpty, "fixture has no pairs over the threshold")
    // auto at threshold 0.3 dispatches to blocked-exact: always recall 1
    val auto = got("auto")
    assert(auto == exact, s"auto: missed ${(exact -- auto).size}, extra ${(auto -- exact).size}")
    val blocked = got("blocked")
    assert(blocked == exact, "blocked-exact diverged")
    // permissive banding (2 bits × 24 bands) reaches recall 1.0 here too
    val lsh = got("lsh", bandBits = 2, bands = 24)
    assert(lsh == exact, s"lsh: missed ${(exact -- lsh).size}, extra ${(lsh -- exact).size}")
  }

  test("cosineNearDupPairs: the blocked-exact rung enforces its pair " +
      "budget (raises past maxPairs, pointing at the sub-quadratic rungs; " +
      "in-budget plans are untouched)") {
    val e = Tables.embeddings(spark, sf001) // 500 vectors -> 124 750 pairs
    val err = intercept[Exception] {
      Similarity.cosineNearDupPairs(e, "vec_id", "embedding", 0.3,
        strategy = "blocked", maxPairs = 1000L).count()
    }
    assert(err.getMessage.contains("maxPairs"), err.getMessage)
    assert(err.getMessage.contains("cellScopedNearDupPairs"), err.getMessage)
    // a budget exactly at n(n-1)/2 passes, and results match the default
    val inBudget = Similarity.cosineNearDupPairs(e, "vec_id", "embedding",
        0.3, strategy = "blocked", maxPairs = 500L * 499 / 2)
      .select("d1", "d2", "sim").as[(Long, Long, Double)].collect().toSet
    val default = Similarity.cosineNearDupPairs(e, "vec_id", "embedding",
        0.3, strategy = "blocked")
      .select("d1", "d2", "sim").as[(Long, Long, Double)].collect().toSet
    assert(inBudget == default)
    // the LSH rung never consults the budget
    assert(Similarity.cosineNearDupPairs(e, "vec_id", "embedding", 0.9,
      strategy = "lsh", maxPairs = 1L).count() >= 0L)
  }

  test("semDedup / cellScopedNearDupPairs enforce the within-cell pair " +
      "budget (raise past maxCellPairs pointing at the q293/q294 " +
      "maintenance rungs; in-budget results are untouched)") {
    val e = Tables.embeddings(spark, sf001) // 500 vectors over 8 seed cells
    val cents = Similarity.seedCentroids(e, "vec_id", "embedding", 8)
    val errSem = intercept[Exception] {
      Similarity.semDedup(e, "vec_id", "embedding", cents, 0.4,
        maxCellPairs = 10L).count()
    }
    assert(errSem.getMessage.contains("maxCellPairs"), errSem.getMessage)
    assert(errSem.getMessage.contains("splitOversizedCells"), errSem.getMessage)
    val errPairs = intercept[Exception] {
      Similarity.cellScopedNearDupPairs(e, "vec_id", "embedding", cents,
        0.4, maxCellPairs = 10L).count()
    }
    assert(errPairs.getMessage.contains("maxCellPairs"), errPairs.getMessage)
    // a budget exactly at Sigma |cell|(|cell|-1)/2 passes, and results match
    // the default budget bit for bit (cell sizes read off semDedup's own
    // per-vector output — the same assignment the guard aggregates)
    val cellPairSpace = Similarity.semDedup(e, "vec_id", "embedding",
        cents, 0.4)
      .groupBy("cell").count().as[(Int, Long)].collect()
      .map { case (_, c) => c * (c - 1) / 2 }.sum
    def semdedupRows(budget: Long) =
      Similarity.semDedup(e, "vec_id", "embedding", cents, 0.4,
          maxCellPairs = budget)
        .as[(Long, Int, Long, Boolean)].collect().toSet
    assert(semdedupRows(cellPairSpace) == semdedupRows(2000000000L))
    def pairRows(budget: Long) =
      Similarity.cellScopedNearDupPairs(e, "vec_id", "embedding", cents,
          0.4, maxCellPairs = budget)
        .as[(Int, Long, Long, Double)].collect().toSet
    val exact = pairRows(cellPairSpace)
    assert(exact.nonEmpty, "fixture has no within-cell pairs over threshold")
    assert(exact == pairRows(2000000000L))
  }

  test("ivfTopK: probed-cell search returns k ranked rows per query and " +
      "overlaps the exact top-k") {
    val e = Tables.embeddings(spark, sf001)
    val q = e.filter($"vec_id" < 10)
    val ivf = Similarity.ivfTopK(q, e, "vec_id", "embedding", k = 3,
      nLists = 8, nProbe = 3)
    val byQ = ivf.groupBy("qid").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect()
    assert(byQ.length == 10 && byQ.forall(_._2 == 3))
    val exact = Similarity.bruteForceTopK(q, e, "vec_id", "embedding", 3)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    val approx = ivf.select("qid", "cid").as[(Long, Long)].collect().toSet
    assert(exact.intersect(approx).nonEmpty, "IVF found none of the true top-k")
  }

  test("lloydIvfTopK: probing ALL cells reduces to exact brute force; " +
      "quantizer is deterministic") {
    val e = Tables.embeddings(spark, sf001)
    val q = e.filter($"vec_id" < 10)
    // nProbe = nLists → every cell probed → must EQUAL exhaustive search
    val all = Similarity.lloydIvfTopK(q, e, "vec_id", "embedding", k = 3,
      nLists = 4, iters = 2, nProbe = 4)
      .select("qid", "rank", "cid", "sim").as[(Long, Int, Long, Double)]
      .collect().toSet
    val exact = Similarity.bruteForceTopK(q, e, "vec_id", "embedding", 3)
      .select("qid", "rank", "cid", "sim").as[(Long, Int, Long, Double)]
      .collect().toSet
    assert(all == exact, "all-cell probe diverged from brute force")
    // the refined centroids are a pure function of the data
    val c1 = Similarity.lloydCentroids(e, "vec_id", "embedding", 4, 2)
    val c2 = Similarity.lloydCentroids(e, "vec_id", "embedding", 4, 2)
    assert(c1 == c2)
    assert(c1.size <= 4 && c1.forall(_._2.size == 64))
    // every component carries the round-6 contract
    assert(c1.forall(_._2.forall(x => (math.round(x * 1e6) / 1e6) == x)))
  }

  test("buildIvfIndexLloyd + queryIvfIndex: all-cell probe equals brute " +
      "force; matches the inline lloydIvfTopK composition") {
    val e = Tables.embeddings(spark, sf001)
    val q = e.filter($"vec_id" < 10)
    val idx = Similarity.buildIvfIndexLloyd(e, "vec_id", "embedding",
      nLists = 4, iters = 2)
    // nProbe = nLists → every cell probed → must EQUAL exhaustive search
    val all = Similarity.queryIvfIndex(idx, q, "vec_id", "embedding",
      k = 3, nProbe = 4)
      .select("qid", "rank", "cid", "sim").as[(Long, Int, Long, Double)]
      .collect().toSet
    val exact = Similarity.bruteForceTopK(q, e, "vec_id", "embedding", 3)
      .select("qid", "rank", "cid", "sim").as[(Long, Int, Long, Double)]
      .collect().toSet
    assert(all == exact, "all-cell probe via the index diverged from brute force")
    // the index API and the inline composition are the same operator
    val viaApi = Similarity.queryIvfIndex(idx, q, "vec_id", "embedding",
      k = 3, nProbe = 2)
      .select("qid", "rank", "cid", "sim").as[(Long, Int, Long, Double)]
      .collect().toSet
    val inline = Similarity.lloydIvfTopK(q, e, "vec_id", "embedding",
      k = 3, nLists = 4, iters = 2, nProbe = 2)
      .select("qid", "rank", "cid", "sim").as[(Long, Int, Long, Double)]
      .collect().toSet
    assert(viaApi == inline, "index API diverged from lloydIvfTopK")
  }

  test("hammingTopK: popcount ranking and k-bounded cosine rerank on " +
      "handcrafted sign patterns") {
    val rows = Seq(
      (0L, Array.fill(64)(1.0f).toSeq),
      (1L, Array.fill(64)(1.0f).toSeq),                          // 0 flips
      (2L, (Array.fill(32)(1.0f) ++ Array.fill(32)(-1.0f)).toSeq), // 32 flips
      (3L, Array.fill(64)(-1.0f).toSeq))                         // 64 flips
      .toDF("vec_id", "embedding")
    val got = Similarity.hammingTopK(rows.filter($"vec_id" === 0), rows,
      "vec_id", "embedding", dim = 64, k = 3)
      .orderBy("rank")
      .select("rank", "cid", "hamming", "cosine")
      .as[(Int, Long, Int, Double)].collect().toSeq
    assert(got == Seq((1, 1L, 0, 1.0), (2, 2L, 32, 0.0), (3, 3L, 64, -1.0)))
  }

  test("truncateRenorm: unit-norm prefix, zero-prefix safety, energy bounds") {
    import graft.sim.Quantization
    val rows = Seq(
      (1L, (1 to 64).map(_.toFloat)),                       // generic vector
      (2L, Seq.fill(16)(0.0f) ++ (1 to 48).map(_.toFloat)), // zero prefix
      (3L, (1 to 16).map(_.toFloat) ++ Seq.fill(48)(0.0f))) // all mass in prefix
      .toDF("vec_id", "embedding")
    val v = col("embedding").cast("array<double>")
    val got = rows.select(col("vec_id"),
      Quantization.truncateRenorm(v, 16).as("t"),
      Quantization.prefixEnergy(v, 16).as("er"))
      .orderBy("vec_id")
      .as[(Long, Seq[Double], Double)].collect()
    assert(got(0)._2.length == 16)
    assert(math.abs(got(0)._2.map(x => x * x).sum - 1.0) < 1e-12, "not unit norm")
    assert(got(1)._2.forall(_ == 0.0), "zero prefix must renormalize to zeros")
    assert(got(1)._3 == 0.0)
    assert(got(2)._3 == 1.0, "all-prefix vector must have energy 1")
    assert(got(0)._3 > 0.0 && got(0)._3 < 1.0)
  }

  test("incrementalSemDupStats: batch dups flagged against the corpus only, " +
      "per matching cell") {
    val corpus = Seq((0L, Seq(1.0f, 0.0f)), (1L, Seq(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val batch = Seq(
      (10L, Seq(1.0f, 0.01f)),   // near-copy of corpus 0 -> dup in cell 0
      (11L, Seq(-1.0f, 1.0f)))   // cell 1, but only ~0.707 similar -> clean
      .toDF("vec_id", "embedding")
    val cents = Similarity.seedCentroids(corpus, "vec_id", "embedding", 2)
    val got = Similarity.incrementalSemDupStats(
      batch, corpus, "vec_id", "embedding", cents, 0.9)
      .as[(Int, Long, Long, Option[Double])].collect().toSeq
    assert(got.map(r => (r._1, r._2, r._3)) == Seq((0, 1L, 1L), (1, 1L, 0L)))
    assert(got.head._4.exists(_ > 0.99) && got(1)._4.exists(s => s > 0.7 && s < 0.72))
  }

  test("semDedup: cell-scoped groups, diversity-keep picks farthest from centroid") {
    // centroids: c0=(1,0), c1=(0,1). 10/11/12 are near-identical vectors in
    // cell 0 (pairwise cos > 0.999, but only ~0.95 to the centroid, so the
    // seed stays outside the group); 12 has the lowest centroid similarity
    // → the kept representative. 20 lands in cell 1 at cos 0.98 to the
    // seed (< 0.99 threshold) → singleton.
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.0f, 1.0f)),          // seeds
      (10L, Seq(10.0f, 3.0f)), (11L, Seq(10.0f, 3.1f)),      // dup group, cell 0
      (12L, Seq(10.0f, 3.2f)),                               // farthest from c0
      (20L, Seq(1.0f, 5.0f))                                 // singleton, cell 1
    ).toDF("vec_id", "embedding")
    val cents = Similarity.seedCentroids(vecs, "vec_id", "embedding", 2)
    val got = Similarity.semDedup(vecs, "vec_id", "embedding", cents, 0.99)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getBoolean(3)))
    // seeds 0,1 join their own cells; 10/11/12 group in cell 0 (pairwise
    // cos > 0.99); group rep = 12 (lowest simc to centroid); 20 survives
    val kept = got.filter(_._3).map(_._1).toSet
    assert(got.find(_._1 == 10L).get._2 == 0 && got.find(_._1 == 20L).get._2 == 1)
    assert(!kept.contains(10L) && !kept.contains(11L) && kept.contains(12L))
    assert(kept.contains(20L) && kept.contains(0L) && kept.contains(1L))
  }

  test("semDedup with TRAINED IVF centroids: output partitions the corpus validly") {
    // the production path: swap seed centroids for the KMeans quantizer's
    val e = spark.read.parquet(s"$sf001/embeddings.parquet")
    val idx = Similarity.buildIvfIndex(e, "vec_id", "embedding", nLists = 4)
    val out = Similarity.semDedup(e, "vec_id", "embedding",
      idx.centroids.select(col("cell"), col("centroid")), 0.4).cache()
    val n = e.count()
    assert(out.count() == n, "one row per input vector")
    assert(out.select("id").distinct().count() == n, "ids unique")
    // every dup group keeps exactly one member; singletons keep themselves
    val perCluster = out.groupBy("cluster")
      .agg(sum(when(col("keep"), 1).otherwise(0)).as("kept"))
      .select("kept").as[Long].collect()
    assert(perCluster.forall(_ == 1L), "exactly one representative per cluster")
    // groups never span cells (pairs are cell-scoped)
    val cellsPerCluster = out.groupBy("cluster")
      .agg(countDistinct("cell").as("nc")).select("nc").as[Long].collect()
    assert(cellsPerCluster.forall(_ == 1L), "a dup group crossed cells")
    out.unpersist()
  }

  test("bandingFor: more selective bands need more of them") {
    val l8 = Similarity.bandingFor(0.8, 8)
    val l4 = Similarity.bandingFor(0.8, 4)
    assert(l8 > l4 && l4 >= 1)
  }

  test("multimodal: features have the declared dim and are deterministic") {
    val media = Multimodal.fakeMediaFromDocs(Tables.documents(spark, sf001).limit(50))
    val f1 = Multimodal.extractFeatures(media, dim = 16).orderBy("media_id")
      .select("features").as[Seq[Float]].collect()
    val f2 = Multimodal.extractFeatures(media, dim = 16).orderBy("media_id")
      .select("features").as[Seq[Float]].collect()
    assert(f1.length == 50 && f1.forall(_.length == 16))
    assert(f1.zip(f2).forall { case (a, b) => a == b })
    assert(f1.flatten.forall(v => v >= 0.0f && v < 1.0f))
  }

  test("multimodal: resize stub rewrites payload + dims, keeps id/format") {
    val media = Multimodal.fakeMediaFromDocs(Tables.documents(spark, sf001).limit(10))
    val resized = Multimodal.resizeStub(media, targetW = 32, targetH = 16)
    val rows = resized.orderBy("media_id").collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val meta = r.getStruct(2)
      assert(meta.getInt(1) == 32 && meta.getInt(2) == 16)
      assert(r.getAs[Array[Byte]]("content").length == (32 * 16) / 64)
    }
    // deterministic
    val again = Multimodal.resizeStub(media, 32, 16).orderBy("media_id").collect()
    assert(rows.zip(again).forall { case (a, b) =>
      java.util.Arrays.equals(a.getAs[Array[Byte]]("content"), b.getAs[Array[Byte]]("content"))
    })
  }

  test("multimodal: frame sampling emits every stride-th frame") {
    val media = Multimodal.fakeMediaFromDocs(Tables.documents(spark, sf001).limit(20))
    val frames = Multimodal.sampleFrames(media, stride = 4)
    val bad = frames.filter($"frame_idx" % 4 =!= 0).count()
    assert(bad == 0 && frames.count() > 0)
  }
  test("IVF index save/load round-trip: loaded index answers like the built one") {
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
    val queries = emb.filter($"vec_id" < 5)
    val idx = Similarity.buildIvfIndex(emb, "vec_id", "embedding", nLists = 8)
    val direct = Similarity.queryIvfIndex(idx, queries, "vec_id", "embedding", k = 10)
      .select("qid", "rank", "cid").as[(Long, Int, Long)].collect().toSet
    val dir = java.nio.file.Files.createTempDirectory("ivf-idx").toString
    Similarity.saveIvfIndex(idx, dir)
    val loaded = Similarity.loadIvfIndex(spark, dir)
    val viaDisk = Similarity.queryIvfIndex(loaded, queries, "vec_id", "embedding", k = 10)
      .select("qid", "rank", "cid").as[(Long, Int, Long)].collect().toSet
    assert(viaDisk == direct && direct.nonEmpty)
    // cells live under cell=N partition dirs -> probed reads prune files
    val parts = new java.io.File(s"$dir/cells").listFiles()
      .filter(_.getName.startsWith("cell="))
    assert(parts.length == 8, s"expected 8 cell partitions, got ${parts.length}")
  }

  test("addToIvfIndex: build-on-half then add ≡ assigning the full corpus " +
      "under the frozen quantizer; saved append answers identically") {
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
    val even = emb.filter($"vec_id" % 2 === 0)
    val odd = emb.filter($"vec_id" % 2 === 1)
    val idx = Similarity.buildIvfIndexLloyd(even, "vec_id", "embedding",
      nLists = 8, iters = 2)
    val grown = Similarity.addToIvfIndex(idx, odd, "vec_id", "embedding")
    // the pinned invariant: add uses the build's own nearest-cell
    // projection, so the grown cells relation equals a from-scratch
    // assignment of the union under the same centroids
    val fullAssign = Similarity.addToIvfIndex(
      idx.copy(cells = idx.cells.limit(0)), emb, "vec_id", "embedding")
    val a = grown.cells.select("cid", "cell").as[(Long, Int)].collect().toSet
    val b = fullAssign.cells.select("cid", "cell").as[(Long, Int)].collect().toSet
    assert(a == b && a.nonEmpty)

    // saved-index append path: save even-built, append odd, reload —
    // queries answer exactly like the in-memory grown index
    val queries = emb.filter($"vec_id" < 5)
    val expect = Similarity.queryIvfIndex(grown, queries, "vec_id",
      "embedding", k = 5).select("qid", "rank", "cid")
      .as[(Long, Int, Long)].collect().toSet
    val dir = java.nio.file.Files.createTempDirectory("ivf-add").toString
    Similarity.saveIvfIndex(idx, dir)
    val n = Similarity.appendToSavedIvfIndex(spark, dir, odd, "vec_id", "embedding")
    assert(n == odd.count())
    val reloaded = Similarity.loadIvfIndex(spark, dir)
    val got = Similarity.queryIvfIndex(reloaded, queries, "vec_id",
      "embedding", k = 5).select("qid", "rank", "cid")
      .as[(Long, Int, Long)].collect().toSet
    assert(got == expect && got.nonEmpty)
  }

  test("rangeSearchIvfIndex: exactly the probed-cell neighbors at or above " +
      "the threshold — the threshold-filtered top-k candidate set") {
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
    val queries = emb.filter($"vec_id" < 5)
    val idx = Similarity.buildIvfIndexLloyd(emb, "vec_id", "embedding",
      nLists = 8, iters = 2)
    // k larger than any cell: top-k over the same probes = full candidate set
    val all = Similarity.queryIvfIndex(idx, queries, "vec_id", "embedding",
      k = 100000, nProbe = 2)
    val expect = all.filter($"sim" >= 0.2).select("qid", "cid", "sim")
      .as[(Long, Long, Double)].collect().toSet
    val got = Similarity.rangeSearchIvfIndex(idx, queries, "vec_id",
      "embedding", minSim = 0.2, nProbe = 2)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == expect && got.nonEmpty)
    assert(got.forall(_._3 >= 0.2))
  }

  test("int8 quantization: error bounded by scale/2, top-k recall stays high") {
    import graft.sim.Quantization
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
    val v = col("embedding").cast("array<double>")
    val q = emb.withColumn("__s", Quantization.int8Scale(v))
      .withColumn("__c", Quantization.quantizeInt8(v, col("__s")))
    // per-element reconstruction error <= scale/2 (+ fp slack)
    val viol = q.filter(
      Quantization.maxAbsError(v, col("__c"), col("__s")) > col("__s") / 2 + 1e-9)
      .count()
    assert(viol == 0L)
    // ANN over dequantized vectors keeps most of the exact top-10
    val deq = q.select(col("vec_id"),
      Quantization.dequantizeInt8(col("__c"), col("__s")).as("embedding"))
    val queries = emb.filter($"vec_id" < 10)
    def top(c: org.apache.spark.sql.DataFrame) =
      Similarity.bruteForceTopK(queries, c, "vec_id", "embedding", 10)
        .select("qid", "cid").as[(Long, Long)].collect().toSet
    val exact = top(emb)
    val approx = top(deq)
    val overlap = exact.intersect(approx).size.toDouble / exact.size
    assert(overlap >= 0.8, s"quantized recall $overlap")
  }

  test("DotProductRewrite: the HOF dot-product pattern optimizes to the " +
      "codegen expression with identical results and null semantics") {
    graft.functions.GraftFunctions.register(spark)
    val df = Tables.embeddings(spark, sf001).limit(50)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val hof = df.select($"vec_id",
      aggregate(zip_with($"v", $"v", (x, y) => x * y), lit(0.0),
        (acc, x) => acc + x).as("d"))
    assert(hof.queryExecution.optimizedPlan.toString.toLowerCase
      .contains("dotproduct"), "rewrite did not fire")
    val direct = df.select($"vec_id",
      graft.sim.Similarity.dot($"v", $"v").as("d"))
      .as[(Long, Double)].collect().toMap
    assert(hof.as[(Long, Double)].collect().toMap == direct)
    // zip_with null-pads mismatched lengths, nulling the fold — the strict
    // rewrite must reproduce that, not fold the common prefix
    val mm = spark.sql(
      """SELECT aggregate(zip_with(array(1.0D, 2.0D), array(3.0D),
        (x, y) -> x * y), 0.0D, (acc, v) -> acc + v) AS d""")
    assert(mm.head().isNullAt(0))
    // a null ELEMENT nulls the stock fold too — strict mode must match,
    // not read the slot as 0.0
    val ne = spark.sql(
      """SELECT aggregate(zip_with(array(1.0D, CAST(NULL AS DOUBLE)),
        array(2.0D, 3.0D), (x, y) -> x * y), 0.0D, (acc, v) -> acc + v) AS d""")
    assert(ne.head().isNullAt(0))
  }

  test("hardNegatives: every hit has a different label and is the best such hit") {
    val emb = Tables.embeddings(spark, sf001)
    val queries = emb.filter($"vec_id" < 5)
    val negs = Similarity.hardNegatives(queries, emb, "vec_id", "embedding", "label", 3)
    val labels = emb.select($"vec_id", $"label").as[(Long, Int)].collect().toMap
    val rows = negs.select("qid", "rank", "cid", "sim")
      .as[(Long, Int, Long, Double)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (q, _, c, _) => labels(q) != labels(c) })
    // vs the unconstrained top-k: any shared (qid, cid) must score identically
    val free = Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", 3)
      .select("qid", "cid", "sim").as[(Long, Long, Double)].collect()
      .map { case (q, c, s) => (q, c) -> s }.toMap
    assert(rows.forall { case (q, _, c, s) => free.get((q, c)).forall(_ == s) })
  }

  test("labelNoiseScreen: a point planted inside the other cluster tops " +
      "the margin ranking and flags mislabeled; clean points do not") {
    val rows = Seq(
      (1L, Array(0.0f, 0.0f), 0), (2L, Array(1.0f, 0.0f), 0),
      (3L, Array(0.0f, 1.0f), 0),
      (4L, Array(10.0f, 10.0f), 1), (5L, Array(11.0f, 10.0f), 1),
      (6L, Array(10.0f, 11.0f), 1),
      (7L, Array(10.0f, 10.5f), 0)) // labeled 0, sits in cluster 1
      .toDF("vec_id", "embedding", "label")
    val got = graft.sim.Similarity.labelNoiseScreen(rows, "vec_id",
        "embedding", "label")
      .select("vec_id", "mislabeled", "nearest_other")
      .as[(Long, Boolean, Int)].collect().toSeq
    assert(got.head._1 == 7L && got.head._2 && got.head._3 == 1,
      s"planted point must rank first and flag: $got")
    assert(got.count(_._2) == 1, s"only the planted point flags: $got")
  }

  test("pq: when every vector seeds its own sub-centroid, encoding is " +
      "lossless and ADC ranking equals exact L2 ranking") {
    import spark.implicits._
    // 8 well-separated vectors (ids 0-7 = all seeds, dim 8, m=2):
    // Lloyd keeps each point its own centroid, so ADC distances are the
    // exact (round-6) squared L2 and the top-k must match brute force
    val vecs = (0 until 8).map { i =>
      (i.toLong, (0 until 8).map(p =>
        (if (p == i) 10.0 else 0.0) + i * 0.25).toArray)
    }.toDF("vec_id", "embedding")
    val got = graft.sim.Pq.pqAdcTopK(vecs.filter($"vec_id" < 3), vecs,
        "vec_id", "embedding", k = 2, dim = 8, m = 2, ksub = 8, iters = 1)
      .as[(Long, Int, Long, Double)].collect().toSeq
      .sortBy(r => (r._1, r._2))
    // exact reference computed locally
    def d2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val byId = vecs.as[(Long, Array[Double])].collect().toMap
    for (q <- 0L until 3L) {
      val want = byId.keys.filter(_ != q).toSeq
        .sortBy(c => (d2(byId(q), byId(c)), c)).take(2)
      val gotQ = got.filter(_._1 == q).sortBy(_._2).map(_._3)
      assert(gotQ == want, s"q$q: adc ranking $gotQ != exact $want")
    }
    // ADC distance itself must be the exact rounded d2 (lossless codes)
    got.foreach { case (q, _, c, adc) =>
      val exact = {
        val (a, b) = (byId(q), byId(c))
        val h1 = math.rint(d2(a.take(4), b.take(4)) * 1e6) / 1e6
        val h2 = math.rint(d2(a.drop(4), b.drop(4)) * 1e6) / 1e6
        math.rint((h1 + h2) * 1e6) / 1e6
      }
      assert(math.abs(adc - exact) < 1e-9, s"($q,$c): adc $adc != $exact")
    }
  }

  test("VecSub: bit-identical to the zip_with subtraction it replaces, " +
      "non-nullable elements, null on length mismatch; SQL-registered") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val df = Tables.embeddings(spark, sf001).limit(50)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val viaHof = df.select($"vec_id",
        zip_with($"v", reverse($"v"), (a, b) => a - b).as("r"))
      .as[(Long, Seq[Double])].collect().toMap
    val viaExpr = df.select($"vec_id",
        graft.sim.Similarity.vecSub($"v", reverse($"v")).as("r"))
      .as[(Long, Seq[Double])].collect().toMap
    assert(viaExpr == viaHof, "VecSub diverged from zip_with subtraction")
    val schema = df.select(
      graft.sim.Similarity.vecSub($"v", $"v").as("r")).schema
    assert(!schema("r").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType].containsNull,
      "VecSub must declare containsNull=false (the fast-path contract)")
    // length mismatch -> whole result null (documented divergence from
    // zip_with's null padding, which would need nullable elements back)
    val mm = spark.sql(
      "SELECT graft_vec_sub(array(1.0D, 2.0D), array(3.0D)) AS r")
    assert(mm.head().isNullAt(0))
    // the SQL registration is STRICT: elements are read ignoring null
    // flags (null reads as 0.0), so nullable-element arrays — which only
    // external SQL callers can produce — are rejected at analysis time
    val strict = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_vec_sub(array(1.0D, CAST(NULL AS DOUBLE)), " +
        "array(1.0D, 2.0D)) AS r").collect()
    }
    assert(strict.getMessage.contains("non-nullable"),
      s"wrong strictness error: ${strict.getMessage}")
  }

  test("NearestCentroid: identical assignment to the least(struct) tree " +
      "it replaces, including rounded-d2 ties broken toward smaller cell") {
    import spark.implicits._
    // centroid 0 and 1 EQUIDISTANT from (1.5): tie must pick cell 0;
    // plus a batch of points against an unsorted centroid input
    val cents = Seq((1, Seq(2.0)), (0, Seq(1.0)), (2, Seq(9.0)))
    val pts = Seq(0.5, 1.5, 2.2, 8.0, 100.0, -3.0).toDF("x")
      .select(array($"x").as("v"))
    def leastTree(v: org.apache.spark.sql.Column) =
      least(cents.map { case (cell, cv) =>
        struct(round(
          graft.sim.Similarity.dot(v, v)
            - lit(2.0) * graft.sim.Similarity.dot(v, typedLit(cv))
            + lit(cv.map(x => x * x).sum), 6).as("d2"),
          lit(cell).as("cell"))
      }: _*).getField("cell")
    val got = pts.select(
        graft.sim.Similarity.nearestCell($"v", cents).as("c"),
        leastTree($"v").as("ref"))
      .as[(Int, Int)].collect().toSeq
    got.foreach { case (c, ref) => assert(c == ref, s"got $c want $ref") }
    // the 1.5 tie specifically: equidistant to cells 0 and 1 -> 0
    assert(got(1)._1 == 0, s"tie must break toward the smaller cell: $got")
  }

  test("NearestChildCell: identical assignment (incl. rounded-d2 ties " +
      "toward the smaller cell) to NearestCentroid over the same table") {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val cents = Seq((0, Seq(1.0)), (1, Seq(2.0)), (2, Seq(9.0)))
    // same table as a column-borne sorted struct array
    val childLit = typedLit(cents.map { case (c, v) => (c.toLong, v) })
    val pts = Seq(0.5, 1.5, 2.2, 8.0, 100.0, -3.0).toDF("x")
      .select(array($"x").as("v"))
    val got = pts.select(
        Similarity.nearestCell($"v", cents).as("lit_cell"),
        ColumnBridge.column(graft.functions.NearestChildCell(
          ColumnBridge.expression($"v"),
          ColumnBridge.expression(childLit))).as("col_cell"))
      .as[(Int, Long)].collect().toSeq
    got.foreach { case (l, c) => assert(c == l.toLong, s"col $c != lit $l") }
    assert(got(1)._2 == 0L, s"1.5 equidistant to cells 0/1 must pick 0: $got")
    // empty child array -> null (the caller's fallback branch)
    val empty = pts.limit(1).select(
      ColumnBridge.column(graft.functions.NearestChildCell(
        ColumnBridge.expression($"v"),
        ColumnBridge.expression(typedLit(Seq.empty[(Long, Seq[Double])]))))
        .isNull.as("n")).as[Boolean].head()
    assert(empty, "empty children must yield null, not a crash")
  }

  test("NearestCentroid / NearestChildCell: NaN distances sort LAST (the " +
      "SQL ORDER BY contract) and null child elements are skipped") {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    def childCol(v: org.apache.spark.sql.Column,
        ch: org.apache.spark.sql.Column) =
      ColumnBridge.column(graft.functions.NearestChildCell(
        ColumnBridge.expression(v), ColumnBridge.expression(ch)))
    val pts = Seq(2.0).toDF("x").select(array($"x").as("v"))
    // centroid 0 is all-NaN -> its d2 is NaN for every input; the finite
    // centroid 1 (farther in id order) must still win in BOTH variants
    val nanCents = Seq((0, Seq(Double.NaN)), (1, Seq(9.0)))
    val gotLit = pts.select(
      Similarity.nearestCell($"v", nanCents).as("c")).as[Int].head()
    assert(gotLit == 1, s"literal variant let NaN shadow a finite d2: $gotLit")
    val gotCol = pts.select(childCol($"v",
        typedLit(nanCents.map { case (c, cv) => (c.toLong, cv) })).as("c"))
      .as[Long].head()
    assert(gotCol == 1L, s"column variant let NaN shadow a finite d2: $gotCol")
    // every d2 NaN (NaN input vector): ties break to the SMALLEST cell in
    // both variants — exactly ORDER BY d2, cell with NaN sorted last
    val nanV = Seq(Double.NaN).toDF("x").select(array($"x").as("v"))
    val allNanLit = nanV.select(
      Similarity.nearestCell($"v", Seq((3, Seq(1.0)), (7, Seq(2.0)))).as("c"))
      .as[Int].head()
    assert(allNanLit == 3, s"all-NaN must tie-break to the smaller cell: $allNanLit")
    val allNanCol = nanV.select(childCol($"v",
        typedLit(Seq((3L, Seq(1.0)), (7L, Seq(2.0))))).as("c")).as[Long].head()
    assert(allNanCol == 3L, s"all-NaN must tie-break to the smaller cell: $allNanCol")
    // a null element inside the child array is SKIPPED, not an NPE
    val withNull = typedLit(Seq(Option.empty[(Long, Seq[Double])],
      Some((5L, Seq(1.9)))))
    val gotNull = pts.select(childCol($"v", withNull).as("c")).as[Long].head()
    assert(gotNull == 5L, s"null child element must be skipped: $gotNull")
  }

  test("hierAssignCells: identical supers reduce to the flat argmin over " +
      "the whole child pool (degenerate one-region parity)") {
    // first g=2 seeds identical at x=0 -> every vector's super is 0 (the
    // rounded-d2 tie-break), children of super 0 = ids < k=4, so the hier
    // cell IS the flat single-level argmin over seeds {0,1,2,3}
    val pts = Map(0L -> 0.0, 1L -> 0.0, 2L -> 5.0, 3L -> 10.0,
      4L -> 5.2, 5L -> 9.1)
    val a = pts.toSeq.toDF("vec_id", "x")
      .select($"vec_id", array($"x").as("embedding"))
    val got = Similarity.hierAssignCells(a, "vec_id", "embedding", k = 4)
      .select("id", "cell").as[(Long, Long)].collect().toMap
    def round6(d: Double) = java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val seeds = pts.filter(_._1 < 4L)
    def flat(x: Double): Long = seeds.toSeq.sortBy(_._1)
      .minBy { case (id, c) => (round6((x - c) * (x - c)), id) }._1
    val want = pts.map { case (id, x) => id -> flat(x) }
    assert(got == want, s"hier $got != flat $want")
  }

  test("saveHierQuantizer -> hierAssignSaved reproduces the inline " +
      "hierAssignCells relation exactly, and the artifact carries the " +
      "(supers, children-by-super, meta) layout") {
    val pts = Seq(0L -> 0.0, 1L -> 0.0, 2L -> 5.0, 3L -> 10.0,
        4L -> 5.2, 5L -> 9.1, 6L -> 0.4, 7L -> 7.7)
      .toDF("vec_id", "x").select($"vec_id", array($"x").as("embedding"))
    val dir = java.nio.file.Files
      .createTempDirectory("hierq").toString
    Similarity.saveHierQuantizer(pts, "vec_id", "embedding", k = 4, dir)
    def rel(df: org.apache.spark.sql.DataFrame) = df
      .select("id", "cell").as[(Long, Long)].collect().toSet
    val inline = rel(Similarity.hierAssignCells(
      pts, "vec_id", "embedding", k = 4))
    val saved = rel(Similarity.hierAssignSaved(
      spark, dir, pts, "vec_id", "embedding"))
    assert(saved == inline, s"saved $saved != inline $inline")
    assert(inline.map(_._2).size > 1, "fixture must use more than one cell")
    // layout: supers has g = ceil(sqrt(4)) = 2 rows; children partitioned
    val supers = spark.read.parquet(s"$dir/supers")
    assert(supers.count() == 2L)
    val childDirs = new java.io.File(s"$dir/children").listFiles()
      .filter(_.isDirectory).map(_.getName)
    assert(childDirs.nonEmpty && childDirs.forall(_.startsWith("super=")))
    val meta = spark.read.parquet(s"$dir/meta").head()
    assert(meta.getInt(0) == 4 && meta.getInt(1) == 2)
    // a NEW batch (not in the training corpus) assigns from the artifact
    // without touching the corpus: nearest child of x=4.8 is seed 2 (x=5)
    val batch = Seq(100L -> 4.8).toDF("vec_id", "x")
      .select($"vec_id", array($"x").as("embedding"))
    val b = rel(Similarity.hierAssignSaved(
      spark, dir, batch, "vec_id", "embedding"))
    assert(b == Set((100L, 2L)), s"batch assign: $b")
  }

  test("hierAssignCells / saveHierQuantizer / hierAssignSaved: the " +
      "COLUMN-BORNE super carriage (superLiteralMax = 0) reproduces the " +
      "driver-literal relation exactly — the O(1)-driver scale path is " +
      "value-identical to the fixture path") {
    // covers both regimes the carriage must agree on: multi-super corpora
    // (k=9 -> g=3) AND the childless-super fallback fixture; the sf10
    // rung runs literals (g << 1024), so this pin is what licenses the
    // column path past the gate
    val pts = (0L to 11L).map(i => i -> (i * 1.3 % 7.0))
      .toDF("vec_id", "x").select($"vec_id", array($"x").as("embedding"))
    def rel(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "cell").as[(Long, Long)].collect().toSet
    for (k <- Seq(1, 4, 9)) {
      val lit = rel(Similarity.hierAssignCells(pts, "vec_id", "embedding", k))
      val colb = rel(Similarity.hierAssignCells(pts, "vec_id", "embedding",
        k, superLiteralMax = 0))
      assert(colb == lit, s"k=$k: column-borne $colb != literal $lit")
    }
    // childless-super fallback agrees across carriages too
    val b = Seq(0L -> 0.0, 1L -> 0.0005, 2L -> 0.0001, 5L -> 100.0)
      .toDF("vec_id", "x").select($"vec_id", array($"x").as("embedding"))
    assert(rel(Similarity.hierAssignCells(b, "vec_id", "embedding", 3,
        superLiteralMax = 0)) ==
      rel(Similarity.hierAssignCells(b, "vec_id", "embedding", 3)))
    // saved artifact: built AND assigned under the column carriage ==
    // built and assigned under literals (same bytes-on-disk contract)
    val dirL = java.nio.file.Files.createTempDirectory("hierq_lit").toString
    val dirC = java.nio.file.Files.createTempDirectory("hierq_col").toString
    Similarity.saveHierQuantizer(pts, "vec_id", "embedding", 9, dirL)
    Similarity.saveHierQuantizer(pts, "vec_id", "embedding", 9, dirC,
      superLiteralMax = 0)
    val savedL = rel(Similarity.hierAssignSaved(spark, dirL, pts,
      "vec_id", "embedding"))
    val savedC = rel(Similarity.hierAssignSaved(spark, dirC, pts,
      "vec_id", "embedding", superLiteralMax = 0))
    assert(savedC == savedL, s"saved column $savedC != saved literal $savedL")
    assert(savedL == rel(Similarity.hierAssignCells(
      pts, "vec_id", "embedding", 9)), "saved must equal inline")
  }

  test("hierAssignCells: a super left childless by round-6 ties takes the " +
      "fallback cell -1-super") {
    // Every super normally contains its own seed as a child (g <= k), so
    // the fallback needs rounding to empty one: supers c0 = 0.0 and
    // c1 = 0.0005 round-tie for EVERY pool member (d2 diffs < 5e-7 round
    // to equal -> tie-break to super 0), leaving super 1 childless, while
    // the far vector x = 100 is STRICTLY nearer c1 (9999.900000 <
    // 10000.000000 after round-6) and lands in the empty super.
    val b = Seq(0L -> 0.0, 1L -> 0.0005, 2L -> 0.0001, 5L -> 100.0)
      .toDF("vec_id", "x").select($"vec_id", array($"x").as("embedding"))
    val got = Similarity.hierAssignCells(b, "vec_id", "embedding", k = 3)
      .select("id", "cell").as[(Long, Long)].collect().toMap
    assert(got(5L) == -2L, s"childless super 1 must yield -1-1 = -2: $got")
    assert(got(0L) == 0L && got(1L) == 0L && got(2L) == 0L,
      s"near-identical pool members all round-tie into cell 0: $got")
  }

  test("hier3AssignCells: matches an independently-computed three-level " +
      "ground truth (all argmins round-6 d2, smaller-id ties, seed pools " +
      "routed through the levels above), in BOTH super carriages") {
    def round6(d: Double) = java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    def argmin(cands: Seq[(Long, Double)], x: Double): Option[Long] =
      if (cands.isEmpty) None
      else Some(cands.map { case (id, c) =>
        (round6((x - c) * (x - c)), id) }.min._2)
    def truth(pts: Map[Long, Double], k: Int): Map[Long, Long] = {
      val g1 = Similarity.cubeRootCeil(k)
      val g2 = g1.toLong * g1
      val supers = pts.filter(_._1 < g1).toSeq
      def s1(x: Double): Long = argmin(supers, x).get
      val mids = pts.filter(_._1 < g2).toSeq
        .map { case (i, c) => (i, c, s1(c)) }
      def mOf(x: Double): Long = {
        val s = s1(x)
        argmin(mids.filter(_._3 == s).map(m => (m._1, m._2)), x)
          .getOrElse(-1L - s)
      }
      val children = pts.filter(_._1 < k).toSeq
        .map { case (i, c) => (i, c, mOf(c)) }
      pts.map { case (id, x) =>
        val m = mOf(x)
        id -> argmin(children.filter(_._3 == m).map(c => (c._1, c._2)), x)
          .getOrElse(if (m >= 0) -1L - g1 - m else m)
      }
    }
    // spread fixture: k=9 -> g1=3, g2=9 — a real three-level tree
    val pts = (0L to 11L).map(i => i -> (i * 2.7 % 11.0)).toMap
    val df = pts.toSeq.toDF("vec_id", "x")
      .select($"vec_id", array($"x").as("embedding"))
    val want = truth(pts, 9)
    val got = Similarity.hier3AssignCells(df, "vec_id", "embedding", 9)
      .select("id", "cell").as[(Long, Long)].collect().toMap
    assert(got == want, s"hier3 $got != ground truth $want")
    assert(want.values.toSet.size > 1, "fixture must use more than one cell")
    val gotCol = Similarity.hier3AssignCells(df, "vec_id", "embedding", 9,
        superLiteralMax = 0)
      .select("id", "cell").as[(Long, Long)].collect().toMap
    assert(gotCol == want, s"column carriage $gotCol != ground truth $want")
    // level-2 fallback fixture (the two-level tie corpus): super 1 draws
    // no mids, so the far vector keeps the fallback cell -1-super = -2
    // as its FINAL cell (no children can claim a region with no id space)
    val b = Seq(0L -> 0.0, 1L -> 0.0005, 2L -> 0.0001, 5L -> 100.0)
      .toDF("vec_id", "x").select($"vec_id", array($"x").as("embedding"))
    val gotB = Similarity.hier3AssignCells(b, "vec_id", "embedding", 3)
      .select("id", "cell").as[(Long, Long)].collect().toMap
    val wantB = truth(Map(0L -> 0.0, 1L -> 0.0005, 2L -> 0.0001,
      5L -> 100.0), 3)
    assert(gotB == wantB, s"hier3 fallback $gotB != ground truth $wantB")
    assert(gotB(5L) == -2L, s"level-2 fallback must survive to the cell: $gotB")
  }

  test("hierLloydCentroids: with g=1 (scoping vacuous) the trajectory " +
      "equals flat lloydCentroids value for value — the build-parity " +
      "contract of the tree-seeded large-k path") {
    val e = Tables.embeddings(spark, sf001)
    val flat = Similarity.lloydCentroids(e, "vec_id", "embedding",
      nLists = 8, iters = 2)
    val tree = Similarity.hierLloydCentroids(e, "vec_id", "embedding",
        k = 8, iters = 2, g = 1)
      .select(col("ccell").cast("int").as("cell"), col("cv"))
      .orderBy("cell").collect()
      .map(r => (r.getInt(0),
        r.getSeq[Double](1).toIndexedSeq.asInstanceOf[Seq[Double]]))
      .toSeq
    assert(tree == flat,
      s"g=1 tree Lloyd diverged from flat Lloyd:\n$tree\nvs\n$flat")
    assert(flat.nonEmpty, "fixture must refine a non-empty centroid set")
  }

  test("hierLloydCentroids: a real tree (k=9, g=3, iters=2) matches an " +
      "independently-computed within-super Lloyd ground truth, in BOTH " +
      "super carriages; buildIvfIndexHierLloyd assigns members to their " +
      "own super's cells") {
    def round6(d: Double) = java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    def argmin(cands: Seq[(Long, Double)], x: Double): Option[Long] =
      if (cands.isEmpty) None
      else Some(cands.map { case (id, c) =>
        (round6((x - c) * (x - c)), id) }.min._2)
    val pts = (0L to 11L).map(i => i -> (i * 2.7 % 11.0)).toMap
    // ground truth: fixed supers (ids < 3), children seeded from ids < 9
    // routed through their super, two scoped Lloyd steps (argmin within
    // super, round-6 means per surviving (super, cell))
    val supers = pts.filter(_._1 < 3).toSeq
    def s1(x: Double): Long = argmin(supers, x).get
    var cents: Seq[(Long, Long, Double)] = pts.filter(_._1 < 9).toSeq
      .map { case (i, c) => (s1(c), i, c) }
    for (_ <- 1 to 2) {
      val assigned = pts.toSeq.flatMap { case (id, x) =>
        val local = cents.filter(_._1 == s1(x)).map(c => (c._2, c._3))
        argmin(local, x).map(cell => (s1(x), cell, x))
      }
      cents = assigned.groupBy(a => (a._1, a._2)).toSeq
        .map { case ((sup, cell), ms) =>
          (sup, cell, round6(ms.map(_._3).sum / ms.size)) }
    }
    val want = cents.map { case (s, c, v) => (s.toInt, c, Seq(v)) }.toSet
    val df = pts.toSeq.toDF("vec_id", "x")
      .select($"vec_id", array($"x").as("embedding"))
    def run(superLiteralMax: Int): Set[(Int, Long, Seq[Double])] =
      Similarity.hierLloydCentroids(df, "vec_id", "embedding",
          k = 9, iters = 2, g = 3, superLiteralMax = superLiteralMax)
        .collect()
        .map(r => (r.getInt(0), r.getLong(1),
          r.getSeq[Double](2).toIndexedSeq.asInstanceOf[Seq[Double]]))
        .toSet
    assert(run(1024) == want, s"literal carriage:\n${run(1024)}\nvs\n$want")
    assert(run(0) == want, s"column carriage:\n${run(0)}\nvs\n$want")
    assert(want.map(_._1).size > 1 || want.size > 1,
      "fixture must exercise more than one centroid")
    // the built index: every member's cell belongs to the member's super
    val idx = Similarity.buildIvfIndexHierLloyd(df, "vec_id", "embedding",
      k = 9, iters = 2)
    val cellSuper = cents.map(c => c._2 -> c._1).toMap
    idx.cells.select("cid", "cell").collect().foreach { r =>
      val (cid, cell) = (r.getLong(0), r.getInt(1))
      assert(cell >= 0, s"fixture should have no fallback cells: $cid -> $cell")
      assert(cellSuper(cell.toLong) == s1(pts(cid)),
        s"member $cid assigned across supers: cell $cell")
    }
  }

  test("ivfPq: one coarse cell + per-point residual codebooks is exact — " +
      "d2(q-c, x-c) = d2(q, x), so ranking matches brute-force L2") {
    import spark.implicits._
    val vecs = (0 until 8).map { i =>
      (i.toLong, (0 until 8).map(p =>
        (if (p == i) 10.0 else 0.0) + i * 0.25).toArray)
    }.toDF("vec_id", "embedding")
    val q = vecs.filter($"vec_id" < 3)
    val got = graft.sim.Pq.ivfPqTopK(q, vecs, "vec_id", "embedding",
        k = 2, dim = 8, nLists = 1, nProbe = 1, m = 2, ksub = 8, iters = 1)
      .as[(Long, Int, Long, Double)].collect().toSeq.sortBy(r => (r._1, r._2))
    val want = graft.sim.Similarity.bruteForceL2TopK(q, vecs, "vec_id",
        "embedding", 2)
      .as[(Long, Int, Long, Double)].collect().toSeq.sortBy(r => (r._1, r._2))
    assert(got.map(r => (r._1, r._2, r._3)) == want.map(r => (r._1, r._2, r._3)),
      s"ivfPq ranking $got != exact $want")
    // distances agree up to the per-subspace rounding
    got.zip(want).foreach { case (g, w) =>
      assert(math.abs(g._4 - w._4) < 1e-5, s"adc ${g._4} vs exact ${w._4}")
    }
  }

  test("IvfPqIndex: build -> save -> load -> query reproduces the inline " +
      "ivfPqTopK result exactly (codes partitioned by cell)") {
    import spark.implicits._
    import graft.sim.Pq
    val vecs = (0 until 24).map { i =>
      (i.toLong, (0 until 8).map(p =>
        ((i * 31 + p * 7) % 13).toDouble - 6.0).toArray)
    }.toDF("vec_id", "embedding")
    val q = vecs.filter($"vec_id" < 4)
    val inline = Pq.ivfPqTopK(q, vecs, "vec_id", "embedding",
        k = 3, dim = 8, nLists = 4, nProbe = 2, m = 2, ksub = 4, iters = 1)
      .as[(Long, Int, Long, Double)].collect().toSeq.sorted
    val dir = java.nio.file.Files.createTempDirectory("ivfpq").toString
    val built = Pq.buildIvfPqIndex(vecs, "vec_id", "embedding",
      dim = 8, nLists = 4, m = 2, ksub = 4, iters = 1)
    Pq.saveIvfPqIndex(built, dir)
    // the corpus-sized piece is partitioned by coarse cell on disk
    val cellDirs = new java.io.File(s"$dir/codes").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
    assert(cellDirs.nonEmpty, "codes must be parquet-partitioned by cell")
    val loaded = Pq.loadIvfPqIndex(spark, dir)
    assert(loaded.dim == 8 && loaded.books.size == 2)
    assert(loaded.coarse == built.coarse, "coarse quantizer must round-trip")
    assert(loaded.books == built.books, "sub-codebooks must round-trip")
    val viaIndex = Pq.queryIvfPqIndex(loaded, q, "vec_id", "embedding",
        k = 3, nProbe = 2)
      .as[(Long, Int, Long, Double)].collect().toSeq.sorted
    assert(viaIndex == inline,
      s"saved-index probe $viaIndex != inline $inline")
  }

  test("addToIvfPqIndex: build-on-even + add-odd equals a full-corpus " +
      "encode under the even-trained quantizer; saved append agrees") {
    import spark.implicits._
    import graft.sim.Pq
    val vecs = (0 until 24).map { i =>
      (i.toLong, (0 until 8).map(p =>
        ((i * 31 + p * 7) % 13).toDouble - 6.0).toArray)
    }.toDF("vec_id", "embedding")
    val even = vecs.filter($"vec_id" % 2 === 0)
    val odd = vecs.filter($"vec_id" % 2 === 1)
    val built = Pq.buildIvfPqIndex(even, "vec_id", "embedding",
      dim = 8, nLists = 4, m = 2, ksub = 4, iters = 1)
    val grown = Pq.addToIvfPqIndex(built, odd, "vec_id", "embedding")
    assert(grown.coarse == built.coarse && grown.books == built.books,
      "add must not touch training state")
    // the add invariant: same projections as the build's own assignment,
    // so grown.codes == encoding the UNION corpus under the frozen
    // quantizer (buildIvfPqIndex with trainOn = the even half)
    val full = Pq.buildIvfPqIndex(vecs, "vec_id", "embedding",
      dim = 8, nLists = 4, m = 2, ksub = 4, iters = 1, trainOn = Some(even))
    assert(full.coarse == built.coarse && full.books == built.books,
      "trainOn must reproduce the even-half quantizer")
    def codeSet(df: org.apache.spark.sql.DataFrame) =
      df.select("cid", "cell", "code_0", "code_1")
        .as[(Long, Int, Int, Int)].collect().toSeq.sorted
    assert(codeSet(grown.codes) == codeSet(full.codes),
      "build-then-add != build-over-union")
    // saved append: same rows land in the cell-partitioned parquet
    val dir = java.nio.file.Files.createTempDirectory("ivfpqadd").toString
    Pq.saveIvfPqIndex(built, dir)
    val n = Pq.appendToSavedIvfPqIndex(spark, dir, odd, "vec_id", "embedding")
    assert(n == odd.count(), s"appended $n rows, expected ${odd.count()}")
    val loaded = Pq.loadIvfPqIndex(spark, dir)
    assert(codeSet(loaded.codes) == codeSet(grown.codes),
      "saved append diverged from the in-memory add")
    // an empty index refuses the add with the real reason
    val e = intercept[IllegalArgumentException] {
      Pq.addToIvfPqIndex(Pq.IvfPqIndex(Nil, Nil, vecs.limit(0)), odd,
        "vec_id", "embedding")
    }
    assert(e.getMessage.contains("empty IVF-PQ index"))
  }

}
