package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.multimodal.Multimodal
import graft.sim.Similarity

/** Similarity search over the embeddings table + the multimodal plumbing.
  * Brute-force cosine has a full DuckDB oracle; the LSH/ANN variant and the
  * mapPartitions feature extraction are rows-only (not SQL-expressible).
  */
object SimQueries extends QueryGroup {

  private def cosineSql(a: String, b: String): String =
    s"list_dot_product($a, $b) / (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b)))"

  /** Brute-force cosine top-3 for the first 10 query vectors. */
  val q48CosineTopK = QueryDef(
    "q48_cosine_topk",
    (s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.bruteForceTopK(e.filter(col("vec_id") < 10), e, "vec_id", "embedding", 3)
        .orderBy("qid", "rank")
    },
    Some(s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
              FROM embeddings),
      q AS (SELECT * FROM e WHERE vec_id < 10),
      scored AS (SELECT q.vec_id AS qid, c.vec_id AS cid,
          ROUND(${cosineSql("q.v", "c.v")}, 6) AS sim
        FROM e c, q WHERE q.vec_id <> c.vec_id),
      r AS (SELECT qid, cid, sim,
          CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, cid ASC) AS INT) AS rank
        FROM scored)
      SELECT qid, rank, cid, sim FROM r WHERE rank <= 3 ORDER BY qid, rank"""))

  /** Embedding-cosine near-duplicate pairs (threshold 0.3). */
  val q49CosineNearDup = QueryDef(
    "q49_cosine_neardup",
    (s, d) => Similarity.cosineNearDupPairs(
      Tables.embeddings(s, d), "vec_id", "embedding", 0.3)
      .orderBy("d1", "d2"),
    Some(s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
              FROM embeddings)
      SELECT d1, d2, sim FROM (
        SELECT a.vec_id AS d1, b.vec_id AS d2, ROUND(${cosineSql("a.v", "b.v")}, 6) AS sim
        FROM e a, e b WHERE a.vec_id < b.vec_id)
      WHERE sim >= 0.3 ORDER BY d1, d2"""))

  /** Hyperplane-LSH bucketed ANN (approximate; no SQL oracle — rows-only).
    * Recall vs the brute-force baseline is asserted in SimilaritySpec. */
  val q50AnnLsh = QueryDef(
    "q50_ann_lsh",
    (s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.lshTopK(e.filter(col("vec_id") < 10), e, "vec_id", "embedding",
        k = 3, nPlanes = 4)
        .orderBy("qid", "rank")
    },
    None)

  /** IVF coarse-quantizer ANN: KMeans cells + nProbe-cell search
    * (approximate; rows-only — the KMeans fit is not SQL-expressible).
    * Recall vs brute force is asserted in SimilaritySpec. */
  val q65IvfTopk = QueryDef(
    "q65_ivf_topk",
    (s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.ivfTopK(e.filter(col("vec_id") < 10), e, "vec_id", "embedding",
        k = 3, nLists = 8, nProbe = 3)
        .orderBy("qid", "rank")
    },
    None)

  /** Multimodal plumbing: binary media column → batched feature extraction
    * (stubbed decode) → per-format feature stats. Rows-only (mapPartitions). */
  val q51MultimodalFeatures = QueryDef(
    "q51_multimodal_features",
    (s, d) => {
      val media = Multimodal.fakeMediaFromDocs(Tables.documents(s, d))
      Multimodal.extractFeatures(media, dim = 16)
        .withColumn("f0", element_at(col("features"), 1))
        .groupBy("format")
        .agg(count(lit(1)).as("n"),
          round(avg(col("f0")), 6).as("avg_f0"))
        .orderBy("format")
    },
    None)

  /** Resize + frame sampling over video-like media: every 4th frame of the
    * stub-resized payloads. Rows-only. */
  val q52FrameSample = QueryDef(
    "q52_frame_sample",
    (s, d) => {
      val media = Multimodal.fakeMediaFromDocs(Tables.documents(s, d))
      val resized = Multimodal.resizeStub(media, targetW = 64, targetH = 64)
      Multimodal.sampleFrames(resized, stride = 4)
        .groupBy("format").agg(count(lit(1)).as("n_frames"))
        .orderBy("format")
    },
    None)

  override val defs: Seq[QueryDef] = Seq(
    q48CosineTopK, q49CosineNearDup, q50AnnLsh, q65IvfTopk,
    q51MultimodalFeatures, q52FrameSample)
}
