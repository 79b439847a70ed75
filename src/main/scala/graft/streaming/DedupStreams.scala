package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.text.DedupOps

/** Streaming near-duplicate DETECTION: MinHash-band candidate pairs emitted
  * as documents arrive, against everything seen so far in the stream.
  *
  * The batch pipeline (signatures → band self-join) cannot run on a stream —
  * a self-join against the stream's own past needs per-key state. Shape:
  * per-row signature projection (no aggregation upstream — Append-mode
  * stateful ops forbid it; see DedupOps.minhashSignatureProjection), explode
  * into band keys, then flatMapGroupsWithState keyed BY BAND VALUE holding
  * the (bounded) doc ids seen in that band. A new arrival emits one
  * candidate pair per stored id, then joins the store.
  *
  * Scale posture: state is keyed by band value, so it spreads across the
  * cluster like the batch band join's shuffle; per-band state is capped at
  * `maxIdsPerBand` (a band bucket that hot holds near-identical boilerplate
  * — pairing a newcomer against a bounded sample of it is the standard
  * cap); `stateTtl` evicts idle bands via processing-time timeout so state
  * doesn't grow with stream lifetime.
  */
object DedupStreams {

  final case class BandDoc(band_key: String, doc_id: Long)
  final case class BandState(ids: List[Long])
  final case class NearDupCandidate(d1: Long, d2: Long, band_key: String)

  /** (doc_id, text) stream → exploded (band_key, doc_id) stream. */
  def bandedDocs(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 2, bandsOf: Int = 2): Dataset[BandDoc] = {
    import docs.sparkSession.implicits._
    val sig = DedupOps.minhashSignatureProjection(docs, idCol, col(textCol), n)
    val k = DedupOps.MinhashSeeds.size
    val bandVals = (0 until k / bandsOf).map { j =>
      concat_ws(",", lit(j) +:
        (0 until bandsOf).map(o => col(s"sig_${j * bandsOf + o}")): _*)
    }
    sig.select(col(idCol).cast("long").as("doc_id"),
        explode(array(bandVals: _*)).as("band_key"))
      .select(col("band_key"), col("doc_id")).as[BandDoc]
  }

  /** Stateful band matcher. Emits each (d1 < d2) candidate at the moment the
    * later doc arrives; the same pair may surface from several bands
    * (`band_key` says which) — dedup downstream if single emission matters.
    */
  def nearDupCandidates(banded: Dataset[BandDoc],
      maxIdsPerBand: Int = 8,
      stateTtl: Option[String] = None): Dataset[NearDupCandidate] = {
    import banded.sparkSession.implicits._
    val timeoutConf = if (stateTtl.isDefined)
      GroupStateTimeout.ProcessingTimeTimeout() else GroupStateTimeout.NoTimeout()
    banded
      .groupByKey(_.band_key)
      .flatMapGroupsWithState[BandState, NearDupCandidate](
        OutputMode.Append(), timeoutConf) {
        (bandKey: String, rows: Iterator[BandDoc], state: GroupState[BandState]) =>
          if (stateTtl.isDefined && state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            // deterministic order within the micro-batch
            val arrivals = rows.map(_.doc_id).toSeq.sorted
            var ids = state.getOption.map(_.ids).getOrElse(Nil)
            val out = Seq.newBuilder[NearDupCandidate]
            arrivals.foreach { d =>
              if (!ids.contains(d)) {
                ids.foreach { prev =>
                  val (a, b) = if (prev < d) (prev, d) else (d, prev)
                  out += NearDupCandidate(a, b, bandKey)
                }
                ids = (d :: ids).take(maxIdsPerBand)
              }
            }
            state.update(BandState(ids))
            stateTtl.foreach(state.setTimeoutDuration)
            out.result().iterator
          }
      }
  }
}
