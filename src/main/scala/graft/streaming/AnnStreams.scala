package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.sim.Similarity

/** Stream-static ANN: the top-k probe of a SAVED Lloyd-IVF index over a
  * STREAM of query vectors — the read-path twin the batch q143 probe and
  * the round-13 saved-quantizer assignment stream left open. The shape a
  * production retrieval pipeline runs: the index is built/persisted once
  * (nightly), queries arrive continuously, every query costs bounded work.
  *
  * Legality/scale: the probe stage is per-row bounded (each query ranks
  * the broadcast nLists-row centroid table and scores only its nProbe
  * probed cells; the cells parquet is partitioned BY CELL, so the probe's
  * cell join prunes unprobed cells at the file level), and the per-query
  * top-k runs inside `foreachBatch` over exactly that batch's rows — a
  * query vector is ONE stream row, so per-batch top-k IS the global
  * per-query top-k, and batch==stream equality is exact (spec-pinned in
  * MlStreamingSpec). The sink is the idempotent keyed MERGE
  * ([[UpsertSink.applyBatch]], keys = qid+rank), so a replayed micro-batch
  * after crash/restart converges instead of duplicating hits — the same
  * exactly-once-effects recipe as the event upsert sink.
  */
object AnnStreams {

  /** Start the probe stream: `queries` is a streaming DataFrame bearing
    * `idCol` + `vecCol`; results (qid, rank, cid, sim) upsert into
    * `outDir` keyed on (qid, rank). The index at `indexDir` is the
    * [[Similarity.saveIvfIndex]] layout (q143's artifact). The index
    * snapshot is bound HERE, at start(): a nightly rebuild republishing
    * the artifact is adopted by restarting the stream (checkpoint-safe —
    * the upsert sink converges on replay), not mid-flight. */
  def probeSavedIvf(spark: SparkSession, indexDir: String,
      queries: DataFrame, idCol: String, vecCol: String, k: Int,
      nProbe: Int, outDir: String, ckptDir: String): StreamingQuery = {
    val idx = Similarity.loadIvfIndex(spark, indexDir)
    queries.writeStream
      .option("checkpointLocation", ckptDir)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val hits = Similarity.queryIvfIndex(idx, batch.toDF(), idCol,
          vecCol, k, nProbe)
        UpsertSink.applyBatch(batch.sparkSession, hits, outDir,
          Seq("qid", "rank"), "sim")
      }
      .start()
  }
}
