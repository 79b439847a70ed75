package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.Drift

/** Streaming distribution-drift monitoring: the production shape of the
  * batch drift suite (ops/Drift) — per-event-time-window bucket histograms
  * accumulate in the streaming aggregation state, and each CLOSED window
  * (append mode past the watermark) is scored against a FROZEN reference
  * distribution (e.g. the training corpus histogram) on its way into an
  * idempotent keyed sink. The alert a feature pipeline actually pages on:
  * "this hour's feature distribution no longer matches what the model saw."
  *
  * Scale shape: the only state is the (window × bucket) histogram —
  * report-sized per window, bounded by the watermark horizon; PSI math runs
  * per micro-batch over report-sized frames (Drift.psiAgainstReference);
  * the sink upserts by window key, so watermark-replay re-emissions
  * converge instead of duplicating.
  */
object DriftStreams {

  /** Watermarked tumbling-window bucket histogram (append mode): one row
    * per closed (window-start, bucket) with its count. `bucket` is any
    * deterministic expression over an event row.
    */
  def windowedHistogram(events: DataFrame, tsCol: String, bucket: Column,
      windowDur: String = "10 minutes",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur).as("win"), bucket.as("bucket"))
      .agg(count(lit(1)).as("n"))
      .select(col("win.start").as("w"), col("bucket"), col("n"))

  /** Running state of one CUSUM monitor key: observations seen and the
    * cumulative deviation from the frozen reference mean. */
  case class CusumState(n: Long, cusum: Double)

  /** Streaming CUSUM level-shift monitor: per key (a metric name, an
    * event type), the running cumulative deviation Σ(x − μ₀) against a
    * FROZEN per-key reference mean — the online twin of the batch
    * [[graft.ops.TimeSeries.cusumChangepoint]] (which uses the full-series
    * mean retrospectively; online you monitor against what the reference
    * corpus established). Emits one row per key per micro-batch:
    * (key, n_seen, cusum, alarm) with alarm = |cusum| > threshold.
    *
    * State is ONE (count, double) pair per key — O(#keys) total, no
    * per-event retention; keys absent from `refMeans` are dropped (no
    * reference, no monitor). Deterministic given the batch boundaries:
    * each micro-batch folds its rows in (no float-order guarantee across
    * partitions — the batch SUM is what accumulates, matching how the
    * batch CUSUM decimal-sums its prefix).
    */
  def cusumMonitor(events: DataFrame, keyCol: String, valueCol: String,
      refMeans: Map[String, Double], threshold: Double): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val keys = refMeans.keySet
    val typed = events
      .select(col(keyCol).cast("string").as("k"),
        col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull && col("k").isin(keys.toSeq: _*))
      .as[(String, Double)]
    typed.groupByKey(_._1)
      .mapGroupsWithState[CusumState, (String, Long, Double, Boolean)](
        GroupStateTimeout.NoTimeout) {
        case (k, rows, state: GroupState[CusumState]) =>
          val mu0 = refMeans(k)
          val prev = state.getOption.getOrElse(CusumState(0L, 0.0))
          var n = prev.n
          var c = prev.cusum
          rows.foreach { case (_, v) => n += 1; c += v - mu0 }
          state.update(CusumState(n, c))
          (k, n, math.round(c * 1e6) / 1e6.toDouble, math.abs(c) > threshold)
      }
      .toDF("key", "n_seen", "cusum", "alarm")
  }

  /** Attach the PSI scorer + upsert sink to a [[windowedHistogram]] stream:
    * every micro-batch of closed windows is scored against `ref`
    * ((bucket, q) probabilities, broadcast) and upserted into `targetDir`
    * keyed by window start — idempotent under batch replay (UpsertSink).
    */
  def psiSink(hist: DataFrame, ref: DataFrame, targetDir: String,
      checkpointDir: String): StreamingQuery = {
    val frozen = ref.select(col("bucket"), col("q"))
    hist.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val scored = Drift.psiAgainstReference(batch, frozen)
          // keyed by window start; orderCol n_events lets a late re-emission
          // of the same window (larger count) supersede the earlier row
          UpsertSink.applyBatch(batch.sparkSession, scored, targetDir,
            keys = Seq("w"), orderCol = "n_events")
        }
      }
      .start()
  }
}
