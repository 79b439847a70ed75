package graft.sim

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis.md5Int32

/** One scored (corpus id, similarity) hit. */
case class ScoredHit(cid: Long, sim: Double)

/** Bounded top-k aggregate with MAP-SIDE partial reduction: each map task
  * keeps at most 2k hits per query and ships k, so the per-query merge
  * receives |map partitions|·k rows instead of the whole scored corpus —
  * the scale-safe replacement for a global `Window.partitionBy(qid)`
  * row_number, whose |Q| hot partitions each funnel the full corpus.
  * Ordering matches the window it replaces: sim DESC, cid ASC.
  */
class TopKAgg(k: Int) extends Aggregator[ScoredHit, Seq[ScoredHit], Seq[ScoredHit]] {
  // sim DESC via java.lang.Double.compare, which ranks a NaN as the largest
  // double — the same ordering Spark's desc() and DuckDB's ORDER BY ... DESC
  // use. graft's own scoring paths never feed NaN (zero-norm cosines become
  // NULL and are filtered), but user-supplied scores must not silently
  // invert the window ordering this aggregate replaces.
  private def ord: Ordering[ScoredHit] = new Ordering[ScoredHit] {
    override def compare(a: ScoredHit, b: ScoredHit): Int = {
      val c = java.lang.Double.compare(b.sim, a.sim)
      if (c != 0) c else java.lang.Long.compare(a.cid, b.cid)
    }
  }
  // amortized trim: let the buffer grow to 2k, then cut back to k
  private def trim(s: Seq[ScoredHit]): Seq[ScoredHit] =
    if (s.length <= 2 * k) s else s.sorted(ord).take(k)
  // Vector, not List: trim checks `length` (O(n) on List) and prepends
  // on EVERY update — with the 2k buffer that turned a 600k-row top-k
  // pass into ~70 s of list traversal (measured, 1M-vector IVF-PQ
  // smoke). Vector gives O(1) length and effectively-O(1) prepend; trim
  // sorts anyway, so buffer order never matters.
  override def zero: Seq[ScoredHit] = Vector.empty
  override def reduce(b: Seq[ScoredHit], a: ScoredHit): Seq[ScoredHit] = trim(a +: b)
  override def merge(x: Seq[ScoredHit], y: Seq[ScoredHit]): Seq[ScoredHit] =
    (x ++ y).sorted(ord).take(k)
  override def finish(r: Seq[ScoredHit]): Seq[ScoredHit] = r.sorted(ord).take(k)
  override def bufferEncoder: org.apache.spark.sql.Encoder[Seq[ScoredHit]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredHit]]()
  override def outputEncoder: org.apache.spark.sql.Encoder[Seq[ScoredHit]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredHit]]()
}

/** Similarity search over embedding columns (Array[Float]).
  *
  * Brute-force cosine top-k is the correctness baseline: broadcast the (small)
  * query set, one streaming pass over the corpus, per-query top-k. The LSH
  * variant is the scale path: random-hyperplane sign buckets shrink the
  * candidate set so the corpus-side join is bucket-local.
  *
  * All dot products fold left-to-right over the array (functions.aggregate),
  * making the double sums reproducible.
  */
object Similarity {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Cast Array[Float] → Array[Double] (exact). */
  def asDouble(c: Column): Column = c.cast("array<double>")

  /** Codegen'd left-to-right dot product (graft.functions.DotProduct) —
    * bit-identical to the HOF fold `aggregate(zip_with(a,b,_*_),0.0,_+_)`
    * it replaces, but runs inside whole-stage codegen.
    */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** Codegen'd element-wise subtraction with containsNull=false elements
    * (graft.functions.VecSub) — same values as `zip_with(a, b, _ - _)`,
    * but keeps consumers of the result on the primitive fast path. */
  def vecSub(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.VecSub(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** L2-normalize a vector column — the standard cosine-ANN pre-step
    * (q302's stage 1); the zero vector maps to itself. The norm is paired
    * with the elements through array_repeat BEFORE the lambda (the
    * Quantization.truncateRenorm lesson: a naive `transform(v, x => x/n)`
    * re-folds the O(d) norm per ELEMENT). Float contract: sqrt of the
    * strict left-to-right [[dot]], one IEEE division per element —
    * replayed verbatim by `list_transform(v, x -> x / sqrt(
    * list_dot_product(v, v)))` in external SQL. */
  def l2Normalize(vec: Column): Column = {
    val n = norm(vec)
    zip_with(vec, array_repeat(n, size(vec)),
      (x, nn) => when(nn =!= 0.0, x / nn).otherwise(lit(0.0)))
  }

  /** Null-safe rounded cosine from precomputed norms: a zero-norm operand
    * has no defined cosine → NULL (SQL division semantics; ANSI mode would
    * otherwise raise DIVIDE_BY_ZERO at runtime). Threshold filters drop the
    * NULLs naturally; ranked paths exclude them before the top-k aggregate.
    */
  private def safeSim(a: Column, b: Column, na: Column, nb: Column): Column =
    when(na * nb =!= 0.0, round(dot(a, b) / (na * nb), 6))

  /** Maximal Marginal Relevance selection: from a BOUNDED candidate pool,
    * pick k items one at a time by
    * score = λ·rel(d) − (1−λ)·max_{s∈selected} sim(d, s) — the diverse
    * re-rank a RAG pipeline runs after retrieval so the k results aren't k
    * near-copies of the best hit. rel and all pairwise sims are 6-rounded
    * cosines (the q48 contract); ties break on id, so selection is total.
    * Returns (rank, vec_id, rel, score) in selection order.
    *
    * Scale shape: the candidate POOL is the output of a distributed top-k
    * (q48/q65) and is small by construction — MMR is a rerank stage. Each
    * of the k rounds is one broadcast join of the ≤k selected vectors
    * against the pool + a TakeOrdered argmax; the only driver barrier is
    * ONE row per round. The penalty weight is computed as (1 − λ) in
    * DOUBLE on both engines (not a second literal) so the scores replay
    * bit-identically.
    */
  def mmrSelect(candidates: DataFrame, idCol: String, vecCol: String,
      query: DataFrame, k: Int, lambda: Double = 0.7): DataFrame = {
    val spark = candidates.sparkSession
    import spark.implicits._
    val rel = candidates
      .crossJoin(broadcast(query.select(asDouble(col(vecCol)).as("__qv"))))
      .select(col(idCol).cast("long").as("id"), asDouble(col(vecCol)).as("v"),
        round(cosine(asDouble(col(vecCol)), col("__qv")), 6).as("rel"))
      .filter(col("rel").isNotNull) // zero-norm candidates have no cosine
      .localCheckpoint(true)        // re-read by every argmax round
    val penW = 1.0 - lambda         // IEEE double, mirrored by (1 - λ) in SQL
    var selected = Vector.empty[(Long, Seq[Double], Double, Double)]
    for (_ <- 1 to k) {
      val selIds = selected.map(_._1)
      val pool = if (selIds.isEmpty) rel else rel.filter(!col("id").isin(selIds: _*))
      // score arithmetic runs in DECIMAL: rel/__pen are 6-decimal-rounded,
      // so λ·rel − (1−λ)·pen is EXACT at scale 12 and the final half-up
      // round is deterministic — in doubles, 0.7·rel−0.3·pen can land one
      // ulp either side of a .5·10⁻⁶ midpoint and flip the last digit
      // between engines (q178's 0.109992/0.109993 knife edge)
      def dec6(c: Column): Column = c.cast("decimal(18,6)")
      val scored =
        if (selected.isEmpty)
          pool.withColumn("__score", round(dec6(lit(lambda)) * dec6(col("rel")), 6).cast("double"))
        else {
          val selDf = selected.map(s => (s._1, s._2)).toDF("__sid", "__sv")
          val pen = pool.crossJoin(broadcast(selDf))
            .select(col("id"), round(cosine(col("v"), col("__sv")), 6).as("__sim"))
            .groupBy("id").agg(max(col("__sim")).as("__pen"))
          pool.join(pen, "id")
            .withColumn("__score",
              round(dec6(lit(lambda)) * dec6(col("rel"))
                - dec6(lit(penW)) * dec6(col("__pen")), 6).cast("double"))
        }
      scored.orderBy(col("__score").desc, col("id").asc).limit(1)
        .select(col("id"), col("v"), col("rel"), col("__score"))
        .collect().headOption.foreach { r =>
          selected :+= ((r.getLong(0), r.getSeq[Double](1), r.getDouble(2), r.getDouble(3)))
        }
    }
    selected.zipWithIndex
      .map { case ((id, _, r, s), i) => (i + 1, id, r, s) }
      .toDF("rank", "vec_id", "rel", "score")
  }

  /** Two-phase per-query top-k over a scored relation (qid, cid, sim):
    * map-side bounded heaps (TopKAgg partial) → one balanced shuffle of
    * |partitions|·|Q|·k partial states → per-qid merge → posexplode into
    * ranked rows. No |Q|-hot-partition window anywhere.
    */
  private[sim] def topKPerQuery(scored: DataFrame, k: Int): DataFrame = {
    val topk = udaf(new TopKAgg(k), Encoders.product[ScoredHit])
    scored.filter(col("sim").isNotNull) // zero-norm vectors have no cosine
      .groupBy("qid")
      .agg(topk(col("cid").cast("long"), col("sim")).as("hits"))
      .select(col("qid"), posexplode(col("hits")))
      .select(col("qid"), (col("pos") + 1).cast("int").as("rank"),
        col("col.cid").as("cid"), col("col.sim").as("sim"))
  }

  /** Brute-force cosine top-k: for each query vector, the k nearest corpus
    * vectors (excluding itself when ids collide). Output:
    * (qid, rank, cid, sim). The query side is broadcast; the corpus is
    * scanned once; per-query top-k is the two-phase partial aggregate
    * (map-side heaps), not a global window.
    */
  def bruteForceTopK(
      queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    // norms precomputed per side: one fold per pair instead of three, same
    // doubles (sqrt(dot(v,v)) is identical wherever it's evaluated)
    val q = queries.select(col(idCol).as("qid"), asDouble(col(vecCol)).as("qv"))
      .withColumn("qn", norm(col("qv")))
    val c = corpus.select(col(idCol).as("cid"), asDouble(col(vecCol)).as("cv"))
      .withColumn("cn", norm(col("cv")))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("qid") =!= col("cid"))
      .withColumn("sim", safeSim(col("qv"), col("cv"), col("qn"), col("cn")))
    topKPerQuery(scored, k)
  }

  /** Brute-force EXACT squared-L2 top-k (ascending, id tie-break) — the
    * ground-truth twin for distance-ranked ANN paths ([[graft.sim.Pq]]'s
    * ADC), as [[bruteForceTopK]] is for the cosine paths. Same shape:
    * broadcast queries, one corpus pass, map-side bounded heaps. d2 rounds
    * to 6 (the quantizer contract) so ranking replays cross-engine.
    * Output: (qid, rank, cid, d2). */
  def bruteForceL2TopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), asDouble(col(vecCol)).as("qv"))
    val c = corpus.select(col(idCol).as("cid"), asDouble(col(vecCol)).as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("qid") =!= col("cid"))
      .withColumn("sim", -round(dist2(col("qv"), col("cv")), 6))
    topKPerQuery(scored, k)
      .select(col("qid"), col("rank"), col("cid"),
        round(-col("sim"), 6).as("d2"))
  }

  /** Hamming-space ANN over binary (sign) quantized embeddings — the
    * 32×-compressed candidate generator: both sides pack into
    * ceil(dim/32) longs ([[Quantization.signBits]]), candidates rank by
    * XOR-popcount [[Quantization.hammingDistance]] (ascending, ties toward
    * the smaller cid) through the same broadcast-queries + map-side
    * bounded-heap shape as [[bruteForceTopK]] — but each pair costs ~dim/32
    * bit ops instead of dim multiplies, and at 100 TB the packed corpus is
    * the only thing scanned. Full-precision vectors are fetched ONLY for
    * the k-bounded result, carrying the exact rounded cosine for rerank —
    * the binary-quantize → Hamming-candidates → exact-rerank ladder used by
    * production vector stores. Output: (qid, rank, cid, hamming, cosine).
    */
  def hammingTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, dim: Int, k: Int, wordBits: Int = 32): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), asDouble(col(vecCol)).as("qv"))
      .withColumn("qbits", Quantization.signBits(col("qv"), dim, wordBits))
    val c = corpus.select(col(idCol).as("cid"), asDouble(col(vecCol)).as("cv"))
      .withColumn("cbits", Quantization.signBits(col("cv"), dim, wordBits))
    val scored = c.select(col("cid"), col("cbits"))
      .crossJoin(broadcast(q.select(col("qid"), col("qbits"))))
      .filter(col("qid") =!= col("cid"))
      .withColumn("sim",
        -Quantization.hammingDistance(col("qbits"), col("cbits")).cast("double"))
    // (qid, rank, cid, sim=-hamming); TopKAgg's sim-DESC/cid-ASC ordering is
    // exactly hamming-ASC/cid-ASC
    val top = topKPerQuery(scored, k)
    // k-bounded rerank: re-fetch full-precision vectors by id (the corpus
    // side is an equi join against the broadcast |Q|·k result)
    val withQ = top.join(broadcast(q.select(col("qid"), col("qv"))), Seq("qid"))
    c.select(col("cid"), col("cv")).join(broadcast(withQ), Seq("cid"))
      .withColumn("qn", norm(col("qv"))).withColumn("cn", norm(col("cv")))
      .select(col("qid"), col("rank"), col("cid"),
        (-col("sim")).cast("int").as("hamming"),
        safeSim(col("qv"), col("cv"), col("qn"), col("cn")).as("cosine"))
  }

  /** Hard-NEGATIVE mining for contrastive training: for each query, the k
    * most similar corpus vectors with a DIFFERENT label — near-misses are
    * the negatives that sharpen an embedding model. Same scale shape as
    * [[bruteForceTopK]] (broadcast queries, one corpus pass, map-side
    * bounded top-k heaps); the label inequality is evaluated inside the
    * same codegen stage as the dot product, so mismatched-label pairs never
    * reach the aggregate.
    */
  def hardNegatives(
      queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
      labelCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), asDouble(col(vecCol)).as("qv"),
        col(labelCol).as("qlbl"))
      .withColumn("qn", norm(col("qv")))
    val c = corpus.select(col(idCol).as("cid"), asDouble(col(vecCol)).as("cv"),
        col(labelCol).as("clbl"))
      .withColumn("cn", norm(col("cv")))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("qid") =!= col("cid") && col("clbl") =!= col("qlbl"))
      .withColumn("sim", safeSim(col("qv"), col("cv"), col("qn"), col("cn")))
    topKPerQuery(scored, k)
  }

  /** Deterministic pseudo-random hyperplane component for (plane j, dim i):
    * md5-derived value in [-1, 1). Reproducible anywhere, no RNG state.
    */
  private def planeComponent(j: Int, i: Column): Column =
    (md5Int32(concat_ws("_", lit(j), i)) % 2001L - 1000L).cast("double") / 1000.0

  /** Sign bit of vector · hyperplane_j. */
  private def planeBit(vec: Column, j: Int): Column = {
    val proj = aggregate(
      zip_with(vec, sequence(lit(0), size(vec) - 1),
        (x, i) => x * planeComponent(j, i)),
      lit(0.0), (acc, x) => acc + x)
    when(proj >= 0, lit(1L << j)).otherwise(0L)
  }

  /** Random-hyperplane LSH bucket id (nPlanes sign bits packed in a long). */
  def lshBucket(vec: Column, nPlanes: Int): Column =
    (0 until nPlanes).map(j => planeBit(vec, j)).reduce(_ + _)

  /** Bucketed approximate top-k: queries join only corpus vectors in the SAME
    * hyperplane bucket. Recall < 1 by construction; at scale the bucket join
    * replaces the full cross product (shuffle keyed on bucket id).
    */
  def lshTopK(
      queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, nPlanes: Int = 8): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), asDouble(col(vecCol)).as("qv"))
      .withColumn("bucket", lshBucket(col("qv"), nPlanes))
      .withColumn("qn", norm(col("qv")))
    val c = corpus.select(col(idCol).as("cid"), asDouble(col(vecCol)).as("cv"))
      .withColumn("bucket", lshBucket(col("cv"), nPlanes))
      .withColumn("cn", norm(col("cv")))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("qid") =!= col("cid"))
      .withColumn("sim", safeSim(col("qv"), col("cv"), col("qn"), col("cn")))
    topKPerQuery(scored, k)
  }

  /** IVF (inverted-file) ANN top-k — the coarse-quantizer scale path next to
    * hyperplane LSH: a seeded KMeans over the corpus learns `nLists`
    * centroids (the quantizer is tiny and driver-held); every corpus vector
    * is indexed under its nearest centroid cell ONCE; a query probes only its
    * `nProbe` closest cells, so the scoring join is cell-local — candidate
    * volume ≈ nProbe/nLists of the corpus instead of all of it. Recall < 1
    * by construction (a true neighbor can live in an unprobed cell); raise
    * nProbe to trade compute for recall. Output: (qid, rank, cid, sim).
    */
  def ivfTopK(
      queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, nLists: Int = 16, nProbe: Int = 2, seed: Long = 42,
      quantizerMaxIter: Int = 10): DataFrame =
    queryIvfIndex(
      buildIvfIndex(corpus, idCol, vecCol, nLists, seed, quantizerMaxIter),
      queries, idCol, vecCol, k, nProbe)

  /** A built IVF index: `centroids` is nLists rows of (cell, centroid) —
    * always broadcastable; `cells` is the corpus re-keyed by nearest cell
    * with precomputed norms. Build once, query many; [[saveIvfIndex]] /
    * [[loadIvfIndex]] persist it as parquet (cells partitioned BY CELL, so a
    * probed query's broadcast join prunes unprobed cells at the file level
    * via dynamic partition pruning — the index read scales with nProbe/
    * nLists, not corpus size).
    */
  final case class IvfIndex(centroids: DataFrame, cells: DataFrame)

  def buildIvfIndex(corpus: DataFrame, idCol: String, vecCol: String,
      nLists: Int = 16, seed: Long = 42, quantizerMaxIter: Int = 10): IvfIndex = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    // persisted: KMeans init + every Lloyd iteration + the cell-assign
    // transform below each re-read this projection — uncached that is
    // O(iterations) replays of the source scan + norm/vector conversion
    val c = corpus.select(col(idCol).as("cid"), asDouble(col(vecCol)).as("cv"))
      .withColumn("cn", norm(col("cv")))
      .withColumn("fv", array_to_vector(col("cv")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // a coarse quantizer doesn't need a converged clustering — cells just
    // need to be balanced-ish; cap Lloyd iterations accordingly
    val km = new KMeans().setK(nLists).setSeed(seed).setMaxIter(quantizerMaxIter)
      .setFeaturesCol("fv").setPredictionCol("cell")
    val model = km.fit(c)
    // assign cells in one pass (transform keeps all columns); materialized
    // via localCheckpoint so the corpus persist can be released eagerly —
    // downstream scoring joins re-read cells, not the persisted projection
    val cells = model.transform(c).drop("fv").localCheckpoint(true)
    c.unpersist(blocking = false)

    val spark = corpus.sparkSession
    import spark.implicits._
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (v, i) => (i, v.toArray.toSeq) }.toSeq.toDF("cell", "centroid")
    IvfIndex(centroids, cells)
  }

  /** Deterministic IVF index under the cross-engine float contract:
    * [[lloydCentroids]] quantizer (seeded init, unrolled round-6 Lloyd
    * steps, smaller-cell tie-breaks) + [[nearestCell]] assignment — the
    * same [[IvfIndex]] shape [[buildIvfIndex]] produces, so save / load /
    * [[queryIvfIndex]] are shared verbatim, but every build step is
    * replayable in external SQL (q65's DuckDB oracle replays init, both
    * Lloyd iterations, assignment, probing and scoring CTE for CTE).
    * Use this when index contents must be auditable cross-engine; prefer
    * the KMeans build when quantizer quality matters more than
    * replayability.
    */
  def buildIvfIndexLloyd(corpus: DataFrame, idCol: String, vecCol: String,
      nLists: Int = 8, iters: Int = 2): IvfIndex = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val cents = lloydCentroids(corpus, idCol, vecCol, nLists, iters)
    val cells = corpus
      .select(col(idCol).as("cid"), asDouble(col(vecCol)).as("cv"))
      .withColumn("cell", nearestCell(col("cv"), cents))
      .withColumn("cn", norm(col("cv")))
    IvfIndex(cents.toDF("cell", "centroid"), cells)
  }

  def saveIvfIndex(index: IvfIndex, dir: String): Unit = {
    index.centroids.write.mode("overwrite").parquet(s"$dir/centroids")
    index.cells.write.mode("overwrite").partitionBy("cell").parquet(s"$dir/cells")
  }

  def loadIvfIndex(spark: org.apache.spark.sql.SparkSession, dir: String): IvfIndex =
    IvfIndex(
      spark.read.parquet(s"$dir/centroids"),
      spark.read.parquet(s"$dir/cells")
        .select(col("cid"), col("cv"), col("cn"), col("cell").cast("int").as("cell")))

  /** Squared euclidean distance expanded to three in-order dot products —
    * the exact summation structure the DuckDB oracle replays
    * (`list_dot_product(a,a) - 2*list_dot_product(a,b) +
    * list_dot_product(b,b)`), so both engines produce the same double.
    */
  private[sim] def dist2(a: Column, b: Column): Column =
    dot(a, a) - lit(2.0) * dot(a, b) + dot(b, b)

  /** Nearest driver-held centroid as a pure per-row projection: a `least`
    * over nLists (rounded-d2, cell) structs — lexicographic struct ordering
    * IS argmin-with-smaller-cell-tie-break. No join, no explode, no
    * shuffle; the quantizer rides along as literals inside whole-stage
    * codegen.
    */
  private[graft] def nearestCell(v: Column, cents: Seq[(Int, Seq[Double])]): Column =
    cents match {
      // 1 and 0 centroids are degenerate but legal (a filtered-to-nothing
      // corpus must flow through, not crash)
      case Seq() => lit(null).cast("int")
      case Seq((cell, _)) => lit(cell)
      // one codegen'd argmin loop (graft.functions.NearestCentroid), NOT a
      // least(struct(round(dist2…)…)) tree: two or more of those trees in
      // one projection blow the generated method past the JIT threshold
      // and the stage runs interpreted (1.3 s → 39 s for the second tree,
      // measured on 1M×16). Identical values/tie-break — see the
      // expression's float-parity note.
      case _ =>
        val sorted = cents.sortBy(_._1)
        import org.apache.spark.sql.graftbridge.ColumnBridge
        ColumnBridge.column(graft.functions.NearestCentroid(
          ColumnBridge.expression(v), sorted.map(_._1), sorted.map(_._2)))
    }

  /** Deterministic Lloyd refinement of [[seedCentroids]]: `iters` unrolled
    * k-means steps under the cross-engine float contract — squared-L2
    * distances and element-wise centroid means are ROUNDED to 6 decimals
    * before any comparison, argmin ties break toward the smaller cell, and
    * a cell that loses all members drops out — so an external SQL engine
    * replays the exact centroid trajectory CTE-for-CTE (q117's DuckDB
    * oracle does). This is the fully-oracled counterpart of
    * [[buildIvfIndex]], whose k-means|| init is RNG-dependent and therefore
    * only recall-testable.
    *
    * Scale shape: centroids live on the driver (nLists×dim doubles —
    * bounded) and each iteration is ONE corpus pass: the narrow
    * [[nearestCell]] projection, then a map-side-combined (cell, pos) mean
    * whose shuffle volume is partitions·nLists·dim partial sums, never the
    * corpus. At 100 TB the quantizer trains on a sample with the same
    * two-step shape; assignment stays a full-scan projection.
    */
  def lloydCentroids(corpus: DataFrame, idCol: String, vecCol: String,
      nLists: Int, iters: Int): Seq[(Int, Seq[Double])] = {
    val init = seedCentroids(corpus, idCol, vecCol, nLists)
      .orderBy("cell").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toIndexedSeq.asInstanceOf[Seq[Double]]))
      .toSeq
    // an id filter can leave the corpus non-empty but the SEED set empty
    // (no ids < nLists); there is nothing to refine — degenerate, not a crash
    if (init.isEmpty) return Seq.empty
    lloydRefine(corpus.select(asDouble(col(vecCol)).as("cv")), init, iters)
  }

  /** The Lloyd iteration loop under the cross-engine float contract,
    * factored out of [[lloydCentroids]] so maintenance ops ([[splitCell]])
    * can refine an EXPLICIT init over a scoped vector set. `vecs` must
    * expose a single `cv` array<double> column. */
  private[graft] def lloydRefine(vecs: DataFrame,
      init: Seq[(Int, Seq[Double])], iters: Int): Seq[(Int, Seq[Double])] = {
    val e = vecs
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      (1 to iters).foldLeft(init) { (cents, _) =>
        // the assignment MUST evaluate once per input row, in its own
        // stage: projected next to a generator, the nLists-way
        // nearest-cell struct tree is re-evaluated per EXPLODED row — a
        // dim-fold blowup (measured 45 s vs 2 s on 100k×64 at 32 cells).
        // The lazy localCheckpoint is an evaluation barrier the optimizer
        // cannot collapse into the Generate; values are unchanged.
        val assigned = e
          .select(nearestCell(col("cv"), cents).as("cell"), col("cv"))
          .localCheckpoint(eager = false)
        assigned.select(col("cell"), posexplode(col("cv")))
          .groupBy("cell", "pos").agg(round(avg(col("col")), 6).as("val"))
          .groupBy("cell")
          .agg(transform(sort_array(collect_list(struct(col("pos"), col("val")))),
            p => p.getField("val")).as("centroid"))
          .orderBy("cell").collect()
          .map(r => (r.getInt(0), r.getSeq[Double](1).toIndexedSeq.asInstanceOf[Seq[Double]]))
          .toSeq
      }
    } finally e.unpersist(blocking = false)
  }

  /** Per-cell BALANCE AUDIT of an IVF index — the q134 lesson applied to
    * ANN maintenance: at corpus scale a skewed embedding distribution
    * makes one cell a straggler on every probe (its partition carries a
    * disproportionate share of every probed query's candidates), and
    * nothing in the write path surfaces that. One keyed count + a 1-row
    * totals broadcast: (cell, n_vecs, share, oversized) for every
    * centroid — EMPTY cells included via the left join (a cell that lost
    * all members is maintenance signal too), oversized =
    * n_vecs > oversizeFactor × (n_total / n_cells).
    */
  def cellBalanceAudit(index: IvfIndex,
      oversizeFactor: Double = 2.0): DataFrame = {
    val counts = index.cells.groupBy("cell")
      .agg(count(lit(1)).as("n_vecs"))
    val perCell = index.centroids.select("cell")
      .join(counts, Seq("cell"), "left")
      .select(col("cell"), coalesce(col("n_vecs"), lit(0L)).as("n_vecs"))
    val totals = perCell.agg(sum("n_vecs").as("n_total"),
      count(lit(1)).as("n_cells"))
    perCell.crossJoin(broadcast(totals))
      .select(col("cell"), col("n_vecs"),
        round(col("n_vecs").cast("double") / col("n_total").cast("double"), 6)
          .as("share"),
        (col("n_vecs").cast("double") >
          lit(oversizeFactor) * col("n_total").cast("double") /
            col("n_cells").cast("double")).as("oversized"))
  }

  /** SPLIT one oversized cell — the maintenance op [[cellBalanceAudit]]
    * feeds: re-Lloyd WITHIN the fat cell (2-means, the same round-6 /
    * smaller-cell-tie float contract as the build, so the whole op
    * replays in external SQL — q294's oracle), children take the ids
    * (maxCell+1, maxCell+2), the parent id is RETIRED (its centroid row
    * and cell rows are gone, so stale probes can never hit a half-moved
    * cell). Seeding is deterministic: the two smallest member ids.
    *
    * Scale shape: everything is scoped to the one cell's members — one
    * bounded 2-row seed collect, `iters` keyed mean aggregates over the
    * members, one narrow reassignment projection. The rest of the index
    * is untouched (and with a saved index, untouched PARTITIONS).
    */
  def splitCell(index: IvfIndex, cell: Int, iters: Int = 2): IvfIndex = {
    val spark = index.cells.sparkSession
    import spark.implicits._
    val members = index.cells.filter(col("cell") === cell)
      .select(col("cid"), col("cv"), col("cn"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val maxCell = index.centroids.agg(max("cell")).head().getInt(0)
      val seeds = members.orderBy("cid").limit(2).collect()
      require(seeds.length == 2,
        s"splitCell: cell $cell has ${seeds.length} members — nothing to split")
      val init = seeds.zipWithIndex.map { case (r, i) =>
        (maxCell + 1 + i,
          r.getSeq[Double](1).toIndexedSeq.asInstanceOf[Seq[Double]])
      }.toSeq
      val refined = lloydRefine(members.select(col("cv")), init, iters)
      val reassigned = members
        .withColumn("cell", nearestCell(col("cv"), refined))
        .select(index.cells.columns.map(col): _*)
        .localCheckpoint(true)
      val newCents = index.centroids.filter(col("cell") =!= cell)
        .unionByName(refined.toDF("cell", "centroid"))
      IvfIndex(newCents,
        index.cells.filter(col("cell") =!= cell).unionByName(reassigned))
    } finally members.unpersist(blocking = false)
  }

  /** IVF top-k over the [[lloydCentroids]] quantizer, exact-oracle
    * edition: corpus vectors index under their nearest refined centroid
    * (narrow projection), each query probes its `nProbe` closest cells
    * (another pure projection — sort an nLists-element struct array, slice,
    * explode), and exact rounded cosine runs only inside probed cells with
    * the two-phase [[TopKAgg]] merge. Candidate volume ≈ nProbe/nLists of
    * the corpus; nothing in the plan is all-pairs or |Q|-hot-partitioned.
    */
  def lloydIvfTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, nLists: Int = 8, iters: Int = 2,
      nProbe: Int = 2): DataFrame = {
    val cents = lloydCentroids(corpus, idCol, vecCol, nLists, iters)
    if (cents.isEmpty) {
      // empty/seedless corpus: empty result in the SAME schema the scored
      // path produces — qid keeps idCol's type, cid is the long topKPerQuery
      // emits — so empty shards union cleanly with scored ones
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(
        StructField("qid", queries.schema(idCol).dataType),
        StructField("rank", IntegerType, nullable = false),
        StructField("cid", LongType),
        StructField("sim", DoubleType)))
      val spark = queries.sparkSession
      return spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }
    val cells = corpus
      .select(col(idCol).as("cid"), asDouble(col(vecCol)).as("cv"))
      .withColumn("cell", nearestCell(col("cv"), cents))
      .withColumn("cn", norm(col("cv")))
    val probeRank = array_sort(array(cents.map { case (cell, cv) =>
      struct(round(dist2(col("qv"), typedLit(cv)), 6).as("d2"),
        lit(cell).as("cell"))
    }: _*))
    val probes = queries
      .select(col(idCol).as("qid"), asDouble(col(vecCol)).as("qv"))
      .withColumn("qn", norm(col("qv")))
      .select(col("qid"), col("qv"), col("qn"),
        explode(slice(probeRank, 1, nProbe)).as("probe"))
      .select(col("qid"), col("qv"), col("qn"), col("probe.cell").as("cell"))
    val scored = cells.join(broadcast(probes), Seq("cell"))
      .filter(col("qid") =!= col("cid"))
      .withColumn("sim", safeSim(col("qv"), col("cv"), col("qn"), col("cn")))
    topKPerQuery(scored, k)
  }

  /** Probe + score against a built index: each query finds its `nProbe`
    * nearest centroids (broadcast nLists-row table, bounded top-k
    * aggregate), then scores ONLY vectors in probed cells — candidate
    * volume ≈ nProbe/nLists of the corpus. Probe ranking carries the
    * cross-engine contract — squared-L2 as three in-order dot products,
    * rounded to 6, ties toward the smaller cell — so against a
    * [[buildIvfIndexLloyd]] index the whole query is replayable in
    * external SQL (q65's oracle); against a KMeans index the contract is
    * merely a deterministic tie-break.
    */
  def queryIvfIndex(index: IvfIndex, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nProbe: Int = 2): DataFrame = {
    // probe list per query: the nProbe closest centroids by euclidean
    // distance (the quantizer metric) via the same bounded top-k aggregate
    val q = queries.select(col(idCol).as("qid"), asDouble(col(vecCol)).as("qv"))
      .withColumn("qn", norm(col("qv")))
    val probeAgg = udaf(new TopKAgg(nProbe), Encoders.product[ScoredHit])
    val probes = q.crossJoin(broadcast(index.centroids))
      .withColumn("negd", -round(dist2(col("qv"), col("centroid")), 6))
      .groupBy("qid").agg(probeAgg(col("cell").cast("long"), col("negd")).as("hits"))
      .select(col("qid"), explode(col("hits.cid")).as("cell"))
      .select(col("qid"), col("cell").cast("int").as("cell"))

    // score only vectors in probed cells; queries re-joined by qid (broadcast)
    val scored = index.cells.join(broadcast(probes), Seq("cell"))
      .join(broadcast(q), Seq("qid"))
      .filter(col("qid") =!= col("cid"))
      .withColumn("sim", safeSim(col("qv"), col("cv"), col("qn"), col("cn")))
    topKPerQuery(scored, k)
  }

  /** RANGE search against a built index (FAISS `range_search` parity, in
    * the library's headline cosine metric): every probed-cell corpus vector
    * with rounded cosine ≥ `minSim` per query — no k cap, the result size
    * is data-dependent by definition. Probe ranking and scoring carry the
    * exact cross-engine contract of [[queryIvfIndex]] (rounded squared-L2
    * probes, smaller-cell ties, round-6 cosine), so against a
    * [[buildIvfIndexLloyd]] index the whole query replays in external SQL
    * (q270's oracle).
    *
    * Scale shape: identical to the top-k path — broadcast probe table, cell
    * equi join pruning candidates to ≈ nProbe/nLists of the corpus — except
    * the output is the threshold-filtered candidate set itself rather than
    * a bounded heap. A caller who needs bounded output per query composes
    * this with [[queryIvfIndex]] instead; range search is for radius
    * semantics (dedup sweeps, recall audits) where the full neighborhood is
    * the answer.
    */
  def rangeSearchIvfIndex(index: IvfIndex, queries: DataFrame,
      idCol: String, vecCol: String, minSim: Double,
      nProbe: Int = 2): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), asDouble(col(vecCol)).as("qv"))
      .withColumn("qn", norm(col("qv")))
    val probeAgg = udaf(new TopKAgg(nProbe), Encoders.product[ScoredHit])
    val probes = q.crossJoin(broadcast(index.centroids))
      .withColumn("negd", -round(dist2(col("qv"), col("centroid")), 6))
      .groupBy("qid").agg(probeAgg(col("cell").cast("long"), col("negd")).as("hits"))
      .select(col("qid"), explode(col("hits.cid")).as("cell"))
      .select(col("qid"), col("cell").cast("int").as("cell"))
    index.cells.join(broadcast(probes), Seq("cell"))
      .join(broadcast(q), Seq("qid"))
      .filter(col("qid") =!= col("cid"))
      .withColumn("sim", safeSim(col("qv"), col("cv"), col("qn"), col("cn")))
      .filter(col("sim") >= minSim)
      .select(col("qid"), col("cid"), col("sim"))
  }

  /** Incremental index ADD — the production write path a rebuild-per-batch
    * deployment lacks: new vectors take their nearest EXISTING centroid
    * (the same [[nearestCell]] projection the build used, so
    * build-then-add ≡ build-over-union for the cells table) and append to
    * the cells relation; centroids are untouched. Quantizer drift is the
    * caller's maintenance trade, exactly as in FAISS `IndexIVF.add`.
    *
    * Scale shape: one narrow projection over the batch (centroids ride
    * along as codegen literals — bounded nLists×dim driver collect), zero
    * shuffles, no touch of the existing cells data.
    */
  def addToIvfIndex(index: IvfIndex, batch: DataFrame,
      idCol: String, vecCol: String): IvfIndex =
    IvfIndex(index.centroids,
      index.cells.unionByName(assignToCells(index, batch, idCol, vecCol)))

  /** [[addToIvfIndex]] against a SAVED index: assigns the batch with the
    * stored quantizer and appends the new rows to the partitioned cells
    * parquet (dynamic partition overwrite is NOT used — this is a pure
    * append, so concurrent readers keep a consistent view of existing
    * cells). Returns the appended row count.
    */
  def appendToSavedIvfIndex(spark: org.apache.spark.sql.SparkSession,
      dir: String, batch: DataFrame, idCol: String, vecCol: String): Long = {
    val idx = loadIvfIndex(spark, dir)
    val assigned = assignToCells(idx, batch, idCol, vecCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = assigned.count()
    assigned.write.mode("append").partitionBy("cell").parquet(s"$dir/cells")
    assigned.unpersist(blocking = false)
    n
  }

  /** Batch → cells rows under an existing quantizer (shared by the add
    * paths): (cid, cv, cell, cn) in the cells-table shape. */
  private def assignToCells(index: IvfIndex, batch: DataFrame,
      idCol: String, vecCol: String): DataFrame = {
    val cents = index.centroids.orderBy("cell").collect() // bounded: nLists rows
      .map(r => (r.getInt(0),
        r.getSeq[Double](1).toIndexedSeq.asInstanceOf[Seq[Double]]))
      .toSeq
    batch.select(col(idCol).as("cid"), asDouble(col(vecCol)).as("cv"))
      .withColumn("cell", nearestCell(col("cv"), cents))
      .withColumn("cn", norm(col("cv")))
  }

  /** Bucket id of band `l`: the packed sign bits of hyperplanes
    * [l·bandBits, (l+1)·bandBits). Bands use disjoint global plane indices,
    * so bit positions never collide across bands.
    */
  private def bandBucket(vec: Column, l: Int, bandBits: Int): Column =
    (l * bandBits until (l + 1) * bandBits).map(j => planeBit(vec, j))
      .reduce(_ + _)

  /** Number of bands L such that a pair at exactly `threshold` cosine is
    * caught by at least one band with probability ≥ recallTarget
    * (hyperplane collision probability p = 1 − θ/π, band match p^bandBits,
    * miss-all-bands (1 − p^bandBits)^L).
    */
  def bandingFor(threshold: Double, bandBits: Int, recallTarget: Double = 0.999): Int = {
    val p = 1.0 - math.acos(math.min(1.0, math.max(-1.0, threshold))) / math.Pi
    val pBand = math.pow(p, bandBits)
    math.max(1, math.ceil(math.log1p(-recallTarget) / math.log1p(-pBand)).toInt)
  }

  /** Near-duplicate pairs by embedding cosine — the "embedding-cosine
    * near-dup" dedup mode, NEVER as a cross join. Two plans, picked by how
    * selective banded LSH can be at the requested threshold:
    *
    *  - '''banded-lsh''' (sub-quadratic; at the default bandBits=8 and
    *    recall 0.999 the dispatch criterion below selects it for
    *    threshold ≳ 0.72 — the real near-dup regime):
    *    candidate pairs from banded hyperplane LSH — same shape as
    *    `DedupOps.lshCandidatePairs` for text — with the exact cosine
    *    computed INLINE in the band join (joining vectors back to a deduped
    *    pair list would shuffle full vectors per candidate; measured 15×
    *    slower). Approximate: a pair at exactly `threshold` is caught with
    *    probability 1−(1−p^bandBits)^bands (see [[bandingFor]]).
    *  - '''blocked-exact''' (low thresholds): exact low-threshold cosine on
    *    dense smooth data is Ω(n²) — LSH bands selective enough to prune
    *    would lose recall, and permissive bands ENUMERATE MORE than all
    *    pairs (measured 6× all-pairs work at threshold 0.3). The right
    *    exact plan is block-replicated all-pairs (1-bucket-theta): ids
    *    hash into nBlocks blocks, each unordered block pair is one join key,
    *    so the n²/2 comparisons spread evenly over nBlocks·(nBlocks+1)/2
    *    keyed partitions — an equi join, no CartesianProduct, no hot task.
    *
    * `strategy` = "auto" (default; dispatch on the background collision rate
    * bands·2^−bandBits ≤ 0.25), "lsh", or "blocked". `bands` = 0 means
    * [[bandingFor]] (threshold, bandBits, recallTarget). Either plan emits
    * identical (d1 < d2, sim) rows when LSH recall reaches 1.
    *
    * '''Pair budget (the holtSmooth discipline for quadratic plans)''':
    * the blocked-exact rung compares n·(n−1)/2 pairs BY DESIGN — correct
    * and evenly spread, but quadratic. When the implied pair count
    * exceeds `maxPairs` (default 2·10⁹ ≈ a 63k-vector corpus, ~10× the
    * measured sf1 load) the plan raises at execution time instead of
    * silently burning a cluster-month: a 100 TB caller below the LSH
    * dispatch threshold must choose an explicitly sub-quadratic rung —
    * [[cellScopedNearDupPairs]] (cell-local exact, documented recall
    * contract) or `strategy="lsh"` (recallTarget-governed banding). The
    * in-budget path's rows are untouched; the LSH rung is sub-quadratic
    * and never guarded.
    */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, bandBits: Int = 8, bands: Int = 0,
      recallTarget: Double = 0.999, nBlocks: Int = 16,
      strategy: String = "auto",
      maxPairs: Long = 2000000000L): DataFrame = {
    val vecs = df.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .withColumn("n", norm(col("v")))
    val nBands = if (bands > 0) bands else bandingFor(threshold, bandBits, recallTarget)
    val bgFraction = nBands * math.pow(0.5, bandBits)
    val useLsh = strategy match {
      case "lsh"     => true
      case "blocked" => false
      case _         => bgFraction <= 0.25
    }
    log.info(f"cosineNearDupPairs: strategy=${if (useLsh) "banded-lsh" else "blocked-exact"}%s " +
      f"threshold=$threshold bandBits=$bandBits bands=$nBands bgCollisions=$bgFraction%.3f")
    if (useLsh) bandedLshPairs(vecs, threshold, bandBits, nBands)
    else blockedExactPairs(vecs, threshold, nBlocks, maxPairs)
  }

  /** Recall@k of an approximate top-k result against the exact one — the
    * quality gate that tunes nProbe / nPlanes / banding before an ANN
    * method ships. Per query: |approx ∩ exact| / |exact|. Two keyed
    * aggregates + one semi join on (qid, cid); never touches vectors, so
    * the evaluation costs |Q|·k rows regardless of corpus size.
    */
  def recallAtK(approx: DataFrame, exact: DataFrame, qidCol: String,
      idCol: String): DataFrame = {
    val a = approx.select(col(qidCol).as("qid"), col(idCol).as("cid"))
    val x = exact.select(col(qidCol).as("qid"), col(idCol).as("cid"))
    val hits = x.join(a, Seq("qid", "cid"), "left_semi")
      .groupBy("qid").agg(count(lit(1)).as("n_hit"))
    x.groupBy("qid").agg(count(lit(1)).as("n_exact"))
      .join(hits, Seq("qid"), "left")
      .na.fill(0L, Seq("n_hit"))
      .withColumn("recall",
        round(col("n_hit").cast("double") / col("n_exact"), 6))
  }

  /** Deterministic coarse quantizer for [[semDedup]]: the first `k` corpus
    * vectors (by id) ARE the cell centroids — a zero-iteration k-means||
    * style init that any engine reproduces exactly (no Lloyd fixpoint, no
    * RNG). For production quality swap in [[buildIvfIndex]]'s trained
    * centroids; the dedup semantics are identical for any centroid table.
    */
  def seedCentroids(df: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame =
    df.filter(col(idCol) < k)
      .select(col(idCol).cast("int").as("cell"), asDouble(col(vecCol)).as("centroid"))

  /** Nearest-centroid cell assignment by ROUNDED cosine (argmax; the
    * smaller cell breaks ties, so retries and external engines agree):
    * (id, v, n, cell, simc). The deterministic assignment step shared by
    * [[semDedup]] and [[incrementalSemDupStats]]. The per-id window spans
    * |centroids| rows — bounded, never a hot partition.
    */
  private def assignCells(df: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vecs = df.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .withColumn("n", norm(col("v")))
    val cents = centroids
      .select(col("cell"), asDouble(col("centroid")).as("cv"))
      .withColumn("cn", norm(col("cv")))
    vecs.crossJoin(broadcast(cents))
      .withColumn("simc", safeSim(col("v"), col("cv"), col("n"), col("cn")))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("simc").desc, col("cell"))))
      .filter(col("__rn") === 1)
      .select(col("id"), col("v"), col("n"), col("cell"), col("simc"))
  }

  /** Incremental semantic near-dup detection — the production daily-batch
    * mode of [[semDedup]]: NEW vectors are checked against the EXISTING
    * indexed corpus only (never batch-vs-batch, never all-pairs). Both
    * sides take their [[assignCells]] cell; a batch vector is a duplicate
    * when some same-cell corpus vector reaches `threshold` rounded cosine.
    * Output per cell: batch size, dup count, best batch→corpus similarity.
    * Scale shape: candidate volume is Σ|cell∩batch|·|cell∩corpus| via a
    * cell equi join — the increment never touches out-of-cell corpus
    * vectors (the same recall trade IVF probing makes), and a cell with no
    * corpus members simply yields no-dup batch rows (null best_sim).
    */
  def incrementalSemDupStats(batch: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, centroids: DataFrame,
      threshold: Double): DataFrame = {
    val b = assignCells(batch, idCol, vecCol, centroids)
    val c = assignCells(corpus, idCol, vecCol, centroids)
    // LEFT join keeps batch rows in corpus-empty cells as a single
    // null-sim row, so the batch assignment has ONE consumer — no second
    // evaluation of the centroid window, no persist needed
    b.select(col("cell"), col("id").as("bid"),
        col("v").as("bv"), col("n").as("bn"))
      .join(c.select(col("cell"), col("id").as("cid"),
        col("v").as("cv"), col("n").as("cn")), Seq("cell"), "left")
      .withColumn("sim", safeSim(col("bv"), col("cv"), col("bn"), col("cn")))
      .groupBy("cell", "bid").agg(max("sim").as("best_sim"))
      .groupBy("cell")
      .agg(count(lit(1)).as("n_batch"),
        sum(when(col("best_sim") >= threshold, 1L).otherwise(0L)).as("n_dups"),
        max("best_sim").as("max_sim"))
      .orderBy("cell")
  }

  /** Plan-embedded Σ|cell|·(|cell|−1)/2 budget guard for the within-cell
    * pair rungs — the [[blockedExactPairs]] maxPairs pattern applied to
    * the quantizer-cell pair space. The 1-row estimate aggregates the
    * CACHED assignment (cheap: one keyed count over in-memory rows),
    * broadcasts onto every left-side row, and the raise rides the vector
    * column so column pruning cannot drop it; in-budget values are
    * bit-identical to the unguarded plan. Why this exists: with the
    * quantizer's k fixed, 100× corpus = 100× cell size = ~10⁴× pair work
    * (measured 47-62×/decade at sf10 before the guard) — the production
    * posture is k∝n plus the q293 cell audit / q294 oversized-cell
    * split, and the raise message points there instead of silently
    * burning n²/k.
    */
  private def guardCellPairs(assigned: DataFrame, maxCellPairs: Long,
      op: String): DataFrame = {
    // Budget math in DOUBLE, not long: a cell past ~3.04e9 rows wraps
    // c*(c-1) negative in non-ANSI long arithmetic and the > check would
    // silently pass — defeating the guard in exactly the huge-cell regime
    // it defends. An approximate (double) pair count is fine for a budget.
    val budget = assigned.groupBy("cell").agg(count(lit(1)).as("__c"))
      .agg(coalesce(sum(col("__c").cast("double")
          * (col("__c") - lit(1L)).cast("double") / lit(2.0)),
        lit(0.0)).as("__cellPairs"))
    assigned.crossJoin(broadcast(budget))
      .withColumn("v",
        when(col("__cellPairs") > maxCellPairs,
          raise_error(concat(
            lit(s"$op: within-cell pair space of "), col("__cellPairs"),
            lit(s" comparisons exceeds maxCellPairs=$maxCellPairs — " +
              "audit cell balance (ivfCellBalance/q293) and split " +
              "oversized cells (splitOversizedCells/q294), move to a " +
              "quantizer that grows with the corpus " +
              "(cellScopedNearDupPairsL2/q297, hierCellNearDupPairs/q300, " +
              "or hier3CellNearDupPairs/q303 for O(k^(1/3))-per-row " +
              "assignment with linear pair volume), or raise maxCellPairs " +
              "deliberately")))
            .cast("array<double>"))
          .otherwise(col("v")))
      .drop("__cellPairs")
  }

  /** The guarded within-cell pair frame shared by [[semDedup]] and
    * [[cellScopedNearDupPairs]]: (cell, d1, d2, sim) with d1 < d2 and
    * round-6 sim ≥ threshold, the pair space budgeted by
    * [[guardCellPairs]]. The self-join is a keyed equi-join on cell —
    * never a CartesianProduct (PlanSpec-pinned via [[cellPairsPlanProbe]]).
    */
  private def cellPairs(assigned: DataFrame, threshold: Double,
      maxCellPairs: Long, op: String): DataFrame = {
    val l = guardCellPairs(assigned, maxCellPairs, op)
      .select(col("cell"), col("id").as("d1"),
        col("v").as("v1"), col("n").as("n1"))
    val r = assigned.select(col("cell"), col("id").as("d2"),
      col("v").as("v2"), col("n").as("n2"))
    l.join(r, Seq("cell")).filter(col("d1") < col("d2"))
      .withColumn("sim", safeSim(col("v1"), col("v2"), col("n1"), col("n2")))
      .filter(col("sim") >= threshold)
      .select(col("cell"), col("d1"), col("d2"), col("sim"))
  }

  /** UN-checkpointed guarded pair plan — exposed only so PlanSpec can pin
    * the guard shape (the public operators eagerly localCheckpoint, which
    * truncates the lineage a plan assertion needs). */
  private[graft] def cellPairsPlanProbe(df: DataFrame, idCol: String,
      vecCol: String, centroids: DataFrame, threshold: Double,
      maxCellPairs: Long = 2000000000L): DataFrame =
    cellPairs(assignCells(df, idCol, vecCol, centroids), threshold,
      maxCellPairs, "cellScopedNearDupPairs")

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic deduplication
    * scoped to quantizer cells. Each vector joins its nearest centroid
    * (broadcast k-row table; rounded cosine with smaller-cell tie-break, so
    * the assignment is reproducible cross-engine); exact pairwise cosine
    * runs ONLY within a cell; components at `threshold` form semantic-dup
    * groups; each group keeps its member FARTHEST from the centroid
    * (min cell-similarity, the paper's diversity-keep policy; id breaks
    * ties) and drops the rest. Singletons survive untouched.
    *
    * Scale shape: the O(n²) global pair space shrinks to Σ|cell|² — with a
    * real quantizer cells are ~n/k, so comparisons drop by ~k. The within-
    * cell self-join is a keyed equi-join on cell (no CartesianProduct), and
    * the pair space is BUDGETED: past `maxCellPairs` the plan raises with a
    * pointer to the q293/q294 cell-maintenance rungs ([[guardCellPairs]]),
    * the same in-plan defense [[blockedExactPairs]] and LshBandIndex's
    * probe cap carry.
    *
    * Returns one row per input vector: (id, cell, cluster, keep).
    */
  def semDedup(df: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, threshold: Double,
      maxCellPairs: Long = 2000000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val assigned = assignCells(df, idCol, vecCol, centroids)
      // four consumers below (budget, pairs ×2 sides, keep-join); one
      // shuffle in
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = cellPairs(assigned, threshold, maxCellPairs, "semDedup")
      .select("d1", "d2")
    val labels = graft.text.DedupOps.connectedComponents(
      pairs, assigned.select(col("id").as("doc")))
    // materialize the result eagerly while `assigned` is still cached, then
    // release the cache — repeated semDedup calls must not accumulate
    // persisted assignment tables for the session lifetime
    val out = assigned.join(labels, assigned("id") === labels("doc"))
      .select(col("id"), col("cell"), col("simc"), col("cluster"))
      .withColumn("keep", row_number().over(
        Window.partitionBy(col("cluster"))
          .orderBy(col("simc").asc, col("id"))) === 1)
      .select(col("id"), col("cell"), col("cluster"), col("keep"))
      .localCheckpoint(true)
    assigned.unpersist(blocking = false)
    out
  }

  /** Cell-scoped near-duplicate PAIRS: the pruned-rung pair generator for
    * embedding similarity graphs. q68-style exact clustering needs the
    * full pair relation, but all-pairs is O(n²) (measured 109x per data
    * decade in the sf1 spot-check, BENCH_SF1.json); scoping pairs to
    * quantizer cells shrinks the space to Σ|cell|² — SemDeDup's trade
    * (Abbas et al. 2023): cross-cell near-dups are forfeited, within-cell
    * recall is exact. Shares [[semDedup]]'s deterministic `assignCells`
    * (rounded-cosine argmax, smaller-cell ties) so an external engine can
    * replay the pair set verbatim. Output: (cell, d1, d2, sim) with
    * d1 < d2 and 6-rounded sim ≥ threshold.
    *
    * Scale shape: one broadcast centroid assignment over the data, one
    * cell equi-join (the only shuffle of the vectors), pairs filtered
    * before leaving the join, and the Σ|cell|² pair space budgeted by
    * [[guardCellPairs]] (raises past `maxCellPairs`, pointing at the
    * q293/q294 maintenance rungs). Eagerly checkpointed (the PRUNED pair
    * set is small) so the cached assignment can be released immediately.
    */
  def cellScopedNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, threshold: Double,
      maxCellPairs: Long = 2000000000L): DataFrame = {
    val assigned = assignCells(df, idCol, vecCol, centroids)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val out = cellPairs(assigned, threshold, maxCellPairs,
        "cellScopedNearDupPairs")
      .localCheckpoint(true)
    assigned.unpersist(blocking = false)
    out
  }

  /** SCALE-POSTURE variant of [[cellScopedNearDupPairs]] — the k∝n
    * quantizer posture the fixed-k rung's budget guard points at, made an
    * operator: cells are assigned by the codegen'd L2 argmin over
    * DRIVER-HELD centroids ([[nearestCell]] / graft.functions
    * .NearestCentroid — one narrow projection per row, round-6 d² with
    * the smaller-cell tie-break), so assignment is O(n·k) FLOPs inside
    * whole-stage codegen with NO n×k row materialization and no per-id
    * window — the [[buildIvfIndexLloyd]] assignment path. With k grown
    * ∝ corpus size, per-cell population stays ~constant and the
    * within-cell pair volume stays LINEAR in n (vs the fixed-k rung's
    * n²/k), which is exactly the trade q293/q294 maintain in production.
    * Pair semantics within a cell are identical to
    * [[cellScopedNearDupPairs]] (round-6 cosine ≥ threshold, d1 < d2),
    * and the same [[guardCellPairs]] budget raise applies.
    */
  def cellScopedNearDupPairsL2(df: DataFrame, idCol: String, vecCol: String,
      cents: Seq[(Int, Seq[Double])], threshold: Double,
      maxCellPairs: Long = 2000000000L): DataFrame = {
    val assigned = df
      .select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .withColumn("cell", nearestCell(col("v"), cents))
      .withColumn("n", norm(col("v")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val out = cellPairs(assigned, threshold, maxCellPairs,
        "cellScopedNearDupPairsL2")
      .localCheckpoint(true)
    assigned.unpersist(blocking = false)
    out
  }

  /** HIERARCHICAL (two-level) scale rung of [[cellScopedNearDupPairs]].
    * The flat k-grows-with-n posture ([[cellScopedNearDupPairsL2]]/q297)
    * balances its O(n·k) brute assignment against the O(n²/k) pair space
    * at k=√n → n^1.5 on BOTH legs, with n^1.5 PAIR VOLUME. Here the
    * quantizer is a TREE: g=⌈√k⌉ SUPER centroids assign every row in one
    * codegen'd argmin loop (driver literals while g ≤
    * [[SuperLiteralMax]]; past the gate a column-borne 1-row array
    * broadcast-joined in — driver state O(1), see [[SuperSide]]); the k
    * CHILD centroids stay a distributed relation grouped into one sorted
    * struct array per super-cell (g rows) that equi-joins onto the rows
    * of its super-cell (AQE broadcasts it while √k·d fits; past that
    * it's a plain shuffle join on g keys), where the codegen'd
    * [[graft.functions.NearestChildCell]] loop picks the final cell.
    *
    * The honest exponent: with k∝n (the documented k=⌈n/64⌉ posture),
    * assignment is O(n·2√k) = Θ(n^1.5) FLOPs — the SAME exponent as the
    * flat rung's total, but with a ~(2/√k)·k = 2√k-vs-k constant (≈1/16
    * at k=4096) and, decisively, LINEAR pair volume instead of n^1.5:
    * per-cell population stays ~constant, so the within-cell pair space
    * — the leg that dominates wall-clock and shuffle bytes — grows ∝ n.
    * The measured 2.0-2.1×/decade at sf10 is this constant-dominated
    * regime, not a sub-n^1.5 asymptote; a depth-ℓ generalization
    * (assignment O(n·ℓ·k^(1/ℓ))) would be genuinely sub-n^1.5 in FLOPs.
    * Nothing ever materializes n×k rows, and past the gate nothing
    * collects more than O(1) rows to the driver.
    *
    * Determinism (the oracle contract): super seeds are the first g
    * corpus ids ([[seedCentroids]]); child seeds are the first k corpus
    * ids, each attached to ITS OWN nearest super (so the child relation
    * is replayable in SQL from the same two argmin rules); both argmins
    * are round-6 d² with the smaller-cell tie-break. A super-cell that
    * drew no child seeds falls back to cell = −1−super (rows there pair
    * among themselves, exactly like a 1-child cell). Pair semantics and
    * the [[guardCellPairs]] budget are identical to the flat rungs.
    */
  def hierCellNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      k: Int, threshold: Double,
      maxCellPairs: Long = 2000000000L): DataFrame = {
    val assigned = hierAssignCells(df, idCol, vecCol, k)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val out = cellPairs(assigned, threshold, maxCellPairs,
        "hierCellNearDupPairs")
      .localCheckpoint(true)
    assigned.unpersist(blocking = false)
    out
  }

  /** Past this many super centroids the super argmin stops riding the
    * plan as driver literals (g·d doubles of codegen constants serialized
    * into every task) and instead joins a column-borne 1-row array —
    * broadcast once per executor, driver state O(1). Below the gate the
    * literal path stays: for small g it is strictly cheaper (no join, no
    * broadcast exchange) and is the shape every sf≤10 fixture takes. */
  private[graft] val SuperLiteralMax: Int = 1024

  /** The super-level quantizer, in one of two value-identical carriages
    * (spec-pinned parity): driver-literal centroids inside
    * [[nearestCell]]'s codegen loop, or a column-borne 1-row sorted
    * struct array fed to [[graft.functions.NearestChildCell]] via a 1-row
    * broadcast cross join (the children's own argmin, one level up). */
  private final case class SuperSide(lits: Option[Seq[(Int, Seq[Double])]],
      arr: Option[DataFrame]) {
    /** Adds int column `super` = nearest super centroid of `vcol`. */
    def assign(df: DataFrame, vcol: String): DataFrame = lits match {
      case Some(cs) => df.withColumn("super", nearestCell(col(vcol), cs))
      case None => df.crossJoin(broadcast(arr.get))
        .withColumn("super",
          nearestChild(col(vcol), col("__supers")).cast("int"))
        .drop("__supers")
    }
  }

  /** (cell int, centroid array<double>) relation → the 1-row sorted
    * struct-array form [[SuperSide]]'s column path consumes. */
  private def superArrOf(cents: DataFrame): DataFrame =
    cents.agg(sort_array(collect_list(struct(
      col("cell").cast("long").as("ccell"), col("centroid").as("cv"))))
      .as("__supers"))

  private def superSide(df: DataFrame, idCol: String, vecCol: String,
      g: Int, superLiteralMax: Int): SuperSide =
    if (g <= superLiteralMax)
      SuperSide(Some(seedCentroidsDriver(df, idCol, vecCol, g)), None)
    else SuperSide(None, Some(superArrOf(seedCentroids(df, idCol, vecCol, g))))

  /** Two-level assignment for [[hierCellNearDupPairs]]: (id, v, n, cell).
    * Package-private so the spec can pin flat==hier parity of the final
    * cells against an independently-computed ground truth, and force the
    * column-borne super path (superLiteralMax = 0) for literal-vs-column
    * parity at the super level. */
  private[graft] def hierAssignCells(df: DataFrame, idCol: String,
      vecCol: String, k: Int,
      superLiteralMax: Int = SuperLiteralMax): DataFrame = {
    require(k >= 1, s"hierAssignCells needs k >= 1 (got $k)")
    val g = math.max(1, math.ceil(math.sqrt(k.toDouble)).toInt)
    val sup = superSide(df, idCol, vecCol, g, superLiteralMax)
    // child pool: the first k ids, each under its own nearest super —
    // a pushed-down id<k filter (O(k) work), never a per-super top-m sort
    val children = sup.assign(df
      .filter(col(idCol) < k)
      .select(col(idCol).cast("long").as("ccell"),
        asDouble(col(vecCol)).as("cv")), "cv")
    hierAssign(df, idCol, vecCol, sup, groupChildren(children))
  }

  /** (super, ccell, cv) child relation → one sorted struct array per
    * super-cell (g rows; sorted ascending by ccell = the
    * [[graft.functions.NearestChildCell]] tie-break order). */
  private def groupChildren(children: DataFrame): DataFrame =
    children.groupBy("super")
      .agg(sort_array(collect_list(struct(col("ccell"), col("cv"))))
        .as("__children"))

  /** The shared two-stage assignment tail: the super argmin (literal or
    * column-borne per [[SuperSide]]), then the per-super child-array
    * argmin off the g-key equi join. */
  private def hierAssign(df: DataFrame, idCol: String, vecCol: String,
      sup: SuperSide, childArr: DataFrame): DataFrame =
    sup.assign(
        df.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
          .withColumn("n", norm(col("v"))), "v")
      .join(childArr, Seq("super"), "left")
      .withColumn("cell",
        coalesce(nearestChild(col("v"), col("__children")),
          lit(-1L) - col("super")))
      // narrow projection BEFORE the pair join: the √k·d child array must
      // not ride into the shuffle
      .select(col("id"), col("v"), col("n"), col("cell"))

  /** Persist the two-level quantizer — the build-once/assign-many form of
    * [[hierAssignCells]] (the save/load discipline every other index
    * here carries: q143 IVF, q264 IVF-PQ, q288 substring, q290 LSH
    * bands). Layout: `dir/meta` (k, g), `dir/supers` (cell, centroid —
    * g rows), `dir/children` (super, ccell, cv) partitioned by super
    * (bounded directory count: g = ⌈√k⌉). Assigning a batch from the
    * saved artifact reads g rows to the driver while g ≤
    * [[SuperLiteralMax]], and past the gate only the 1-row meta — the
    * supers stay a broadcast relation and the k child centroids stay
    * distributed (driver state O(1)).
    */
  def saveHierQuantizer(df: DataFrame, idCol: String, vecCol: String,
      k: Int, dir: String,
      superLiteralMax: Int = SuperLiteralMax): Unit = {
    require(k >= 1, s"saveHierQuantizer needs k >= 1 (got $k)")
    val spark = df.sparkSession
    import spark.implicits._
    val g = math.max(1, math.ceil(math.sqrt(k.toDouble)).toInt)
    // the supers relation is written from the DISTRIBUTED seed table —
    // past the gate nothing here collects g rows to the driver either
    val seeds = seedCentroids(df, idCol, vecCol, g)
    seeds.coalesce(1).write.mode("overwrite").parquet(s"$dir/supers")
    val sup =
      if (g <= superLiteralMax)
        SuperSide(Some(seedCentroidsDriver(df, idCol, vecCol, g)), None)
      else SuperSide(None, Some(superArrOf(seeds)))
    sup.assign(df.filter(col(idCol) < k)
        .select(col(idCol).cast("long").as("ccell"),
          asDouble(col(vecCol)).as("cv")), "cv")
      .write.mode("overwrite").partitionBy("super")
      .parquet(s"$dir/children")
    Seq((k, g)).toDF("k", "g")
      .write.mode("overwrite").parquet(s"$dir/meta")
  }

  /** Assign a batch from a SAVED quantizer: identical cells to
    * [[hierAssignCells]] when the quantizer was built on the same corpus
    * (spec-pinned relation equality) — the batch never re-derives seeds,
    * so assignment cost tracks the BATCH, not the training corpus. */
  def hierAssignSaved(spark: org.apache.spark.sql.SparkSession, dir: String,
      batch: DataFrame, idCol: String, vecCol: String,
      superLiteralMax: Int = SuperLiteralMax): DataFrame = {
    // O(1) driver read: g from the 1-row meta decides the carriage
    val g = spark.read.parquet(s"$dir/meta").head().getInt(1)
    val supers = spark.read.parquet(s"$dir/supers")
    val sup =
      if (g <= superLiteralMax)
        // bounded driver barrier: g = ceil(sqrt(k)) super centroids
        SuperSide(Some(supers.orderBy("cell").collect()
          .map(r => (r.getInt(0),
            r.getSeq[Double](1).toIndexedSeq.asInstanceOf[Seq[Double]]))
          .toSeq), None)
      else SuperSide(None, Some(superArrOf(supers)))
    val childArr = groupChildren(spark.read.parquet(s"$dir/children")
      .select(col("super").cast("int").as("super"), col("ccell"), col("cv")))
    hierAssign(batch, idCol, vecCol, sup, childArr)
  }

  /** [[hierCellNearDupPairs]] from a SAVED quantizer — same pair
    * semantics and [[guardCellPairs]] budget; the quantizer artifact is
    * built once and amortized across runs (the q298/q299 convention:
    * built on the same corpus, the results are identical, so the SAME
    * oracle applies and the timing delta is the amortized build cost). */
  def hierCellNearDupPairsSaved(spark: org.apache.spark.sql.SparkSession,
      dir: String, df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, maxCellPairs: Long = 2000000000L): DataFrame = {
    val assigned = hierAssignSaved(spark, dir, df, idCol, vecCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val out = cellPairs(assigned, threshold, maxCellPairs,
        "hierCellNearDupPairsSaved")
      .localCheckpoint(true)
    assigned.unpersist(blocking = false)
    out
  }

  /** UN-checkpointed hier pair plan — PlanSpec's probe (the
    * [[cellPairsPlanProbe]] convention: the public operator eagerly
    * localCheckpoints, truncating the lineage a plan assertion needs). */
  private[graft] def hierCellPairsPlanProbe(df: DataFrame, idCol: String,
      vecCol: String, k: Int, threshold: Double,
      maxCellPairs: Long = 2000000000L): DataFrame =
    cellPairs(hierAssignCells(df, idCol, vecCol, k), threshold,
      maxCellPairs, "hierCellNearDupPairs")

  /** Smallest integer whose CUBE reaches `k` — the depth-3 tree's branch
    * factor, defined by exact integer comparison (never float pow/cbrt:
    * `ceil(pow(k, 1/3))` rounds differently across engines on perfect
    * cubes, which would silently desynchronize the oracle's tree shape).
    * Mirrored in SQL as `MIN(i) FROM range(...) WHERE i*i*i >= k`. */
  private[graft] def cubeRootCeil(k: Int): Int =
    Iterator.from(1).find(i => i.toLong * i * i >= k).get

  /** DEPTH-3 rung of [[hierCellNearDupPairs]] — the genuinely sub-n^1.5
    * assignment the two-level tree cannot have. Branch factor
    * g1 = [[cubeRootCeil]](k); level-2 holds g2 = g1² mid centroids,
    * level-3 the k child centroids. A row assigns through three argmin
    * loops of ~g1 candidates each — O(n·3·k^(1/3)) FLOPs, so with k∝n
    * (constant per-cell population, linear pair volume) assignment grows
    * n^(4/3): at the sf10-posture k=4096, 3·16 = 48 FLOP-rows vs the
    * two-level's 2·64 = 128 and the flat rung's 4096. Driver state: g1
    * literals under [[SuperLiteralMax]] (column-borne past it — O(1)
    * either way at depth 3 since g1 = k^(1/3) stays tiny at any corpus
    * size: 10¹² vectors → g1 ≈ 250).
    *
    * Determinism (the oracle contract, extending the two-level rules):
    * level-j seeds are the first g_j corpus ids, each attached to its own
    * parent by replaying the assignment THROUGH the levels above it; all
    * argmins are round-6 d² with smaller-cell ties. Fallbacks keep
    * disjoint id spaces: a super with no mids routes to mid = −1−super
    * (∈ [−g1, −1]; child seeds can still attach THERE, degrading that
    * region to two-level); a non-negative mid with no children routes to
    * cell = −1−g1−mid (∈ [−g1−g2, −g1−1]); a fallback mid with no
    * children keeps its own (already unique, negative) id as the cell.
    * Pair semantics and the [[guardCellPairs]] budget match the other
    * rungs.
    *
    * EAGER contract (unlike the lazy q297/q300 siblings): the pairs are
    * materialized via localCheckpoint at call time, so the persisted
    * three-level assignment can be unpersisted before returning — a
    * composing caller pays the materialization up front. */
  def hier3CellNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      k: Int, threshold: Double,
      maxCellPairs: Long = 2000000000L): DataFrame = {
    val assigned = hier3AssignCells(df, idCol, vecCol, k)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val out = cellPairs(assigned, threshold, maxCellPairs,
        "hier3CellNearDupPairs")
      .localCheckpoint(true)
    assigned.unpersist(blocking = false)
    out
  }

  /** Three-level assignment for [[hier3CellNearDupPairs]]:
    * (id, v, n, cell). Package-private for the spec's independently-
    * computed ground truth and the carriage-parity pin. */
  private[graft] def hier3AssignCells(df: DataFrame, idCol: String,
      vecCol: String, k: Int,
      superLiteralMax: Int = SuperLiteralMax): DataFrame = {
    require(k >= 1, s"hier3AssignCells needs k >= 1 (got $k)")
    val g1 = cubeRootCeil(k)
    val g2 = g1.toLong * g1
    val sup = superSide(df, idCol, vecCol, g1, superLiteralMax)
    def seedPool(bound: Long): DataFrame = sup.assign(
      df.filter(col(idCol) < bound)
        .select(col(idCol).cast("long").as("ccell"),
          asDouble(col(vecCol)).as("cv")), "cv")
    // level-2 pool: first g2 ids under their own super, grouped per super
    val midArr = groupChildren(seedPool(g2))
    // level-3 pool: first k ids routed through super THEN mid
    val childSeeds = seedPool(k)
      .join(midArr, Seq("super"), "left")
      .withColumn("m", coalesce(nearestChild(col("cv"), col("__children")),
        lit(-1L) - col("super")))
      .select(col("m").as("super"), col("ccell"), col("cv"))
    val childArr = groupChildren(childSeeds)
      .withColumnRenamed("super", "__m")
      .withColumnRenamed("__children", "__c3")
    sup.assign(
        df.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
          .withColumn("n", norm(col("v"))), "v")
      .join(midArr, Seq("super"), "left")
      .withColumn("m", coalesce(nearestChild(col("v"), col("__children")),
        lit(-1L) - col("super")))
      .drop("__children")
      .join(childArr, col("m") === col("__m"), "left")
      .withColumn("cell", coalesce(nearestChild(col("v"), col("__c3")),
        when(col("m") >= 0, lit(-1L - g1) - col("m")).otherwise(col("m"))))
      // narrow projection BEFORE the pair join (the two-level rule): no
      // child array rides into the shuffle
      .select(col("id"), col("v"), col("n"), col("cell"))
  }

  /** UN-checkpointed depth-3 pair plan — PlanSpec's probe. */
  private[graft] def hier3CellPairsPlanProbe(df: DataFrame, idCol: String,
      vecCol: String, k: Int, threshold: Double,
      maxCellPairs: Long = 2000000000L): DataFrame =
    cellPairs(hier3AssignCells(df, idCol, vecCol, k), threshold,
      maxCellPairs, "hier3CellNearDupPairs")

  /** TREE-SEEDED Lloyd IVF build for LARGE k — [[lloydCentroids]] holds
    * k·dim doubles on the driver and every iteration ranks ALL k
    * centroids per row (O(n·k) FLOPs/iter): exactly the two costs that
    * sink a k∝n build. Here the hier machinery carries the BUILD, not
    * just the assignment: the supers stay FIXED across iterations (the
    * first g = ⌈√k⌉ seed ids, standard hierarchical k-means), the k child
    * centroids live in a DISTRIBUTED (super, ccell, cv) relation, and
    * each Lloyd step reassigns WITHIN supers — the per-row candidate list
    * is one super's ~k/g children, O(n·√k) FLOPs/iter — then recomputes
    * round-6 element means per surviving (super, cell) with one
    * map-side-combined shuffle of ≤ k·dim partial sums. Driver state:
    * O(g) literals under [[SuperLiteralMax]], O(1) past it; never k·dim.
    *
    * Float contract = [[lloydRefine]]'s exactly (round-6 d² argmin with
    * smaller-cell ties, round-6 element-wise means, a cell that loses all
    * members drops out), plus ONE scoping rule: points move only within
    * their super. With g = 1 the scoping is vacuous and the trajectory
    * equals the flat [[lloydCentroids]] value for value (spec-pinned);
    * every step replays in external SQL (q304's DuckDB oracle).
    *
    * The index has the [[IvfIndex]] shape, so save / load /
    * [[queryIvfIndex]] / [[cellBalanceAudit]] apply verbatim; the probe
    * ranks the flat k-row centroid relation per query (broadcast — query
    * cost tracks the QUERY batch). A super whose region drew no child
    * seeds contributes no centroids and its rows take fallback cell
    * −1−super (no centroid row → never probed; only reachable with
    * duplicate seed vectors, since each seed id < g ≤ k is its own
    * nearest super at d² = 0). */
  def buildIvfIndexHierLloyd(corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, iters: Int,
      superLiteralMax: Int = SuperLiteralMax): IvfIndex = {
    val g = math.max(1, math.ceil(math.sqrt(k.toDouble)).toInt)
    val cents = hierLloydCentroids(corpus, idCol, vecCol, k, iters, g,
      superLiteralMax)
    val sup = superSide(corpus, idCol, vecCol, g, superLiteralMax)
    val cells = hierAssign(corpus, idCol, vecCol, sup, groupChildren(
        cents.select(col("super"), col("ccell"), col("cv"))))
      .select(col("id").as("cid"), col("v").as("cv"), col("n").as("cn"),
        col("cell").cast("int").as("cell"))
    IvfIndex(
      cents.select(col("ccell").cast("int").as("cell"),
        col("cv").as("centroid")),
      cells)
  }

  /** The iterated within-super centroid relation for
    * [[buildIvfIndexHierLloyd]]: (super, ccell, cv) after `iters` scoped
    * Lloyd steps over a FIXED super level. Package-private: the explicit
    * `g` exists for the g=1 flat-parity spec (one super ⇒ the scoping is
    * vacuous ⇒ the trajectory must equal [[lloydCentroids]]). */
  private[graft] def hierLloydCentroids(df: DataFrame, idCol: String,
      vecCol: String, k: Int, iters: Int, g: Int,
      superLiteralMax: Int = SuperLiteralMax): DataFrame = {
    require(k >= 1, s"hierLloydCentroids needs k >= 1 (got $k)")
    require(iters >= 0, s"iters must be >= 0 (got $iters)")
    require(g >= 1, s"g must be >= 1 (got $g)")
    val sup = superSide(df, idCol, vecCol, g, superLiteralMax)
    val base = sup.assign(
        df.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v")), "v")
      .select(col("super"), col("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // seed children: the first k corpus ids, each under its own
      // nearest super (the hierAssignCells pool — replayable in SQL)
      val init = sup.assign(
          df.filter(col(idCol) < k)
            .select(col(idCol).cast("long").as("ccell"),
              asDouble(col(vecCol)).as("cv")), "cv")
        .select(col("super"), col("ccell"), col("cv"))
      (1 to iters).foldLeft(init) { (cents, _) =>
        // assignment in its own stage (the lloydRefine rule: projected
        // next to the posexplode Generate, the argmin re-evaluates per
        // exploded ELEMENT — a dim-fold blowup); the lazy localCheckpoint
        // is the evaluation barrier the optimizer cannot collapse
        val assigned = base
          .join(groupChildren(cents), Seq("super"), "left")
          .withColumn("cell", nearestChild(col("v"), col("__children")))
          // a super holding no centroids owns no cell this iteration —
          // its rows sit out of the means (they re-enter at final
          // assignment with the fallback id)
          .filter(col("cell").isNotNull)
          .select(col("super"), col("cell"), col("v"))
          .localCheckpoint(eager = false)
        assigned
          .select(col("super"), col("cell"), posexplode(col("v")))
          .groupBy("super", "cell", "pos")
          .agg(round(avg(col("col")), 6).as("val"))
          .groupBy("super", "cell")
          .agg(transform(
            sort_array(collect_list(struct(col("pos"), col("val")))),
            p => p.getField("val")).as("cv"))
          .select(col("super"), col("cell").as("ccell"), col("cv"))
          // ≤ k rows, eager: truncates the per-iteration lineage so plan
          // depth stays constant in iters
          .localCheckpoint(true)
      }
    } finally base.unpersist(blocking = false)
  }

  /** Column-borne nearest-centroid argmin (see
    * [[graft.functions.NearestChildCell]]). */
  private def nearestChild(v: Column, children: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.NearestChildCell(
      ColumnBridge.expression(v), ColumnBridge.expression(children)))
  }

  /** Driver-held seed centroids (the [[seedCentroids]] table collected in
    * cell order) for the [[nearestCell]] assignment path — bounded by k. */
  def seedCentroidsDriver(df: DataFrame, idCol: String, vecCol: String,
      k: Int): Seq[(Int, Seq[Double])] =
    seedCentroids(df, idCol, vecCol, k)
      .orderBy("cell").collect()
      .map(r => (r.getInt(0),
        r.getSeq[Double](1).toIndexedSeq.asInstanceOf[Seq[Double]]))
      .toSeq

  private def bandedLshPairs(vecs: DataFrame, threshold: Double,
      bandBits: Int, bands: Int): DataFrame = {
    val banded = vecs.select(col("id"), col("v"), col("n"),
      posexplode(array((0 until bands).map(l => bandBucket(col("v"), l, bandBits)): _*))
        .as(Seq("band", "bucket")))
    banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("d1"), col("y.id").as("d2"),
        safeSim(col("x.v"), col("y.v"), col("x.n"), col("y.n")).as("sim"))
      .filter(col("sim") >= threshold)
      .distinct()
  }

  /** Exact all-pairs via block replication: a row in block b joins under
    * keys {(b,q): q ≥ b} on the left and {(p,b): p ≤ b} on the right, so
    * every unordered pair meets exactly once (cross-block pairs in one
    * orientation; intra-block pairs filtered to id-order). dot/× are
    * orientation-symmetric bit-for-bit, so the emitted sim matches the
    * id-ordered form regardless of which side a row lands on.
    *
    * The `maxPairs` budget guard is plan-embedded (no extra job beyond a
    * pruned-column count): the 1-row corpus count broadcasts onto every
    * row and the raise rides the vector column, so column pruning can't
    * drop it and in-budget values are bit-identical to the unguarded plan.
    */
  private def blockedExactPairs(vecs: DataFrame, threshold: Double,
      nBlocks: Int, maxPairs: Long): DataFrame = {
    val budget = vecs.select(count(lit(1)).as("__nv"))
    val guarded = vecs.crossJoin(broadcast(budget))
      .withColumn("v",
        when(col("__nv") * (col("__nv") - lit(1L)) / 2 > maxPairs,
          raise_error(concat(
            lit("cosineNearDupPairs[blocked-exact]: corpus of "), col("__nv"),
            lit(s" vectors implies more than maxPairs=$maxPairs exact " +
              "comparisons — use cellScopedNearDupPairs or strategy=\"lsh\" " +
              "for corpora this size, or raise maxPairs deliberately")))
            .cast("array<double>"))
          .otherwise(col("v")))
      .drop("__nv")
    val withB = guarded.withColumn("blk", pmod(hash(col("id")), lit(nBlocks)))
    val l = withB.select(col("id").as("xid"), col("v").as("xv"),
      col("n").as("xn"), col("blk").as("xb"),
      explode(transform(sequence(col("blk"), lit(nBlocks - 1)),
        q => col("blk") * nBlocks + q)).as("bp"))
    val r = withB.select(col("id").as("yid"), col("v").as("yv"),
      col("n").as("yn"), col("blk").as("yb"),
      explode(transform(sequence(lit(0), col("blk")),
        p => p * nBlocks + col("blk"))).as("bp"))
    l.join(r, Seq("bp"))
      .filter(col("xb") =!= col("yb") || col("xid") < col("yid"))
      .select(
        least(col("xid"), col("yid")).as("d1"),
        greatest(col("xid"), col("yid")).as("d2"),
        safeSim(col("xv"), col("yv"), col("xn"), col("yn")).as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** Label-noise screen (the "confident-learning lite" curation pass):
    * per labeled vector, squared distance to its OWN label centroid vs the
    * nearest OTHER centroid; margin = d_own/d_other > 1 flags a point
    * sitting closer to a different class — the candidates a relabeling /
    * cleaning queue reviews first. Returns the top-k by margin.
    *
    * Exactness (oracle-replayable without a vector runtime): dims explode
    * once, centroid means are DECIMAL-sum averages, distances sum
    * round-8 squared terms as DECIMAL — order-independent on any
    * partitioning, mirrored verbatim in SQL. Scale shape: the distance
    * pass is |V|·L·D explode-join work with the L·D centroid table
    * BROADCAST and all sums map-side combined — the honest brute force
    * for label counts in the tens/hundreds; at larger L, route through
    * the IVF quantizer instead (buildIvfIndexLloyd) and screen within
    * probed cells. */
  def labelNoiseScreen(emb: DataFrame, idCol: String, vecCol: String,
      labelCol: String, k: Int = 20): DataFrame = {
    def nz(c: Column): Column = when(c =!= 0.0, c)
    // spread an under-partitioned scan before the D-way posexplode (the
    // sf10 lesson — see [[graft.ops.Spread.forAmplification]])
    val x = graft.ops.Spread.forHeavyAmplification(
        emb.filter(col(vecCol).isNotNull && col(labelCol).isNotNull)
          .select(col(idCol).as("vec_id"), col(labelCol).as("label"),
            asDouble(col(vecCol)).as("__v")), col("vec_id"))
      .select(col("vec_id"), col("label"),
        posexplode(col("__v")).as(Seq("pos", "v")))
    val cents = x.groupBy(col("label").as("lc"), col("pos"))
      .agg((sum(col("v").cast("decimal(38,8)")).cast("double")
        / count(lit(1))).as("cv"))
    val d = x.join(broadcast(cents), Seq("pos"))
      .groupBy("vec_id", "label", "lc")
      .agg(sum(round((col("v") - col("cv")) * (col("v") - col("cv")), 8)
        .cast("decimal(38,8)")).cast("double").as("d2"))
    val own = d.filter(col("label") === col("lc"))
      .select(col("vec_id"), col("label"), col("d2").as("d_own"))
    val w = Window.partitionBy("vec_id").orderBy(col("d2").asc, col("lc").asc)
    val nearest = d.filter(col("label") =!= col("lc"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("vec_id"), col("lc").as("nearest_other"),
        col("d2").as("d_other"))
    own.join(nearest, Seq("vec_id"))
      .withColumn("margin", round(col("d_own") / nz(col("d_other")), 6))
      .filter(col("margin").isNotNull)
      .withColumn("d_own", round(col("d_own"), 6))
      .withColumn("d_other", round(col("d_other"), 6))
      .withColumn("mislabeled", col("d_own") > col("d_other"))
      .select("vec_id", "label", "d_own", "nearest_other", "d_other",
        "margin", "mislabeled")
      .orderBy(col("margin").desc, col("vec_id"))
      .limit(k)
  }
}
