package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import Similarity.{asDouble, dist2, lloydCentroids, nearestCell, topKPerQuery}

/** Product quantization (Jégou et al. 2011): split each `dim`-vector into
  * `m` subspaces of dim/m components, train an independent `ksub`-centroid
  * codebook per subspace (the SAME deterministic seeded Lloyd the IVF
  * quantizer uses — ids < ksub seed, round-6 float contract), and encode
  * every vector as m small codes. Storage drops from dim doubles to m
  * bytes-ish per vector, and asymmetric-distance (ADC) scoring costs m
  * table lookups per pair instead of dim multiplies — the canonical ANN
  * compression rung below [[Quantization]]'s int8/sign bits.
  *
  * Scale shape: codebooks live on the driver (m·ksub·(dim/m) = ksub·dim
  * doubles — bounded; at 100 TB they train on a sample, like the IVF
  * note). Encoding is a pure projection (nearest sub-centroid when-trees).
  * ADC: each query's m×ksub distance TABLE is computed once on the query
  * row and broadcast as (qid, cell, d2) rows; the corpus is scanned once
  * and scored by m broadcast-hash joins on its codes; per-query top-k is
  * the two-phase TopKAgg heap — no |Q|-partition window, nothing
  * all-pairs.
  *
  * Determinism: per-subspace squared-L2 rounds to 6 (assignment and ADC),
  * the ADC sum rounds to 6 — bit-replayable in any engine with list ops.
  */
object Pq {

  /** Per-subspace codebooks: m entries, each (cell, centroid) like
    * [[Similarity.lloydCentroids]] (which this calls per subspace slice —
    * m bounded corpus passes; empty corpus yields empty books). */
  def pqCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
      dim: Int, m: Int, ksub: Int, iters: Int): Seq[Seq[(Int, Seq[Double])]] = {
    require(m >= 1 && dim % m == 0, s"pq needs m | dim (got $m, $dim)")
    val sub = dim / m
    (0 until m).map { j =>
      lloydCentroids(
        corpus.select(col(idCol),
          slice(asDouble(col(vecCol)), j * sub + 1, sub).as("__sv")),
        idCol, "__sv", ksub, iters)
    }
  }

  /** Encode the corpus: (idCol, code_0 … code_{m-1}) int codes. */
  def pqEncode(corpus: DataFrame, idCol: String, vecCol: String, dim: Int,
      books: Seq[Seq[(Int, Seq[Double])]]): DataFrame = {
    val m = books.size
    val sub = dim / m
    corpus.select(col(idCol) +: (0 until m).map(j =>
      nearestCell(slice(asDouble(col(vecCol)), j * sub + 1, sub), books(j))
        .as(s"code_$j")): _*)
  }

  /** ADC top-k: for each query, the k corpus vectors with the smallest
    * approximate squared L2 Σ_j d²(q_j, centroid_j[code_j]) (self-matches
    * on id excluded). Output (qid, rank, cid, adc_d2) ordered by rank
    * within qid, adc ascending with id tie-break. */
  def pqAdcTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, dim: Int, m: Int = 4, ksub: Int = 8,
      iters: Int = 1): DataFrame = {
    val books = pqCodebooks(corpus, idCol, vecCol, dim, m, ksub, iters)
    val sub = dim / m
    val enc = pqEncode(corpus, idCol, vecCol, dim, books)
      .withColumnRenamed(idCol, "cid")
    val qside = queries.select(col(idCol).as("qid"),
      asDouble(col(vecCol)).as("__qv"))
    // per-query distance tables: |Q|·ksub rows per subspace, broadcast
    val dts = (0 until m).map { j =>
      val entries = books(j).map { case (cell, cv) =>
        struct(lit(cell).as("cell"),
          round(dist2(slice(col("__qv"), j * sub + 1, sub), typedlit(cv)), 6)
            .as("d2v"))
      }
      if (entries.isEmpty) null
      else qside.select(col("qid").as(s"__q$j"),
        explode(array(entries: _*)).as("e"))
        .select(col(s"__q$j"), col("e.cell").as(s"__cell$j"),
          col("e.d2v").as(s"__d2_$j"))
    }
    if (dts.exists(_ == null))
      // empty codebooks (empty/seedless corpus): empty result, scored schema
      return topKPerQuery(
        qside.select(col("qid"), lit(0L).as("cid"), lit(0.0).as("sim"))
          .limit(0), k)
        .select(col("qid"), col("rank"), col("cid"),
          round(-col("sim"), 6).as("adc_d2"))
    val scored = (1 until m).foldLeft(
        enc.join(broadcast(dts(0)), col("code_0") === col("__cell0"))
          .withColumnRenamed("__q0", "qid")) { (acc, j) =>
      acc.join(broadcast(dts(j)),
        col("qid") === col(s"__q$j") && col(s"code_$j") === col(s"__cell$j"))
    }
    val adc = round((0 until m).map(j => col(s"__d2_$j")).reduce(_ + _), 6)
    topKPerQuery(
      scored.filter(col("cid") =!= col("qid"))
        .select(col("qid"), col("cid"), (-adc).as("sim")), k)
      .select(col("qid"), col("rank"), col("cid"),
        round(-col("sim"), 6).as("adc_d2"))
  }
}
