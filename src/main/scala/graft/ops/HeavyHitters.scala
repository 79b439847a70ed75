package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Exact heavy hitters (frequency > n/k) with bounded state.
  *
  * A plain groupBy-count finds them but shuffles EVERY distinct key — at
  * 100 TB with near-unique keys that is a full-corpus shuffle to answer a
  * ≤k-row question. The classical fix is two passes, both one scan:
  *
  *   1. Misra-Gries sketch (mergeable variant, Agarwal et al., "Mergeable
  *      summaries", PODS'12): each partition keeps ≤k counters; partial
  *      summaries merge by counter addition + subtract-the-(k+1)-th-largest
  *      trim. The surviving ≤k keys are a guaranteed SUPERSET of every key
  *      with true count > n/k. Only k counters per task ever exist — no
  *      shuffle of the key space, state is O(k) regardless of cardinality.
  *   2. Exact count of just the candidates: the ≤k keys broadcast into an
  *      `isin` filter (pushed to the scan), one keyed aggregate over the
  *      tiny surviving slice, keep count > n/k.
  *
  * The result is EXACT (pass 2 removes Misra-Gries false positives), so it
  * oracle-compares against a plain SQL GROUP BY/HAVING.
  */
object HeavyHitters {

  /** Mergeable Misra-Gries summary: processed-row count + ≤k counters. */
  final case class Summary(n: Long, counters: Map[String, Long])

  /** Typed Aggregator form so the sketch runs as a normal map-side-combined
    * aggregate (partials per partition, one merge at the driver-adjacent
    * reduce — identical shape to any other partial aggregate).
    */
  final class MisraGries(k: Int) extends Aggregator[String, Summary, Summary] {
    require(k > 0, "k must be positive")

    override def zero: Summary = Summary(0L, Map.empty)

    override def reduce(b: Summary, key: String): Summary = {
      val c = b.counters
      val next =
        if (c.contains(key)) c.updated(key, c(key) + 1L)
        else if (c.size < k) c.updated(key, 1L)
        else c.flatMap { case (x, v) => // decrement-all, drop zeros
          if (v > 1L) Some(x -> (v - 1L)) else None
        }
      Summary(b.n + 1L, next)
    }

    override def merge(a: Summary, b: Summary): Summary = {
      val sum = (a.counters.keySet ++ b.counters.keySet).iterator.map { x =>
        x -> (a.counters.getOrElse(x, 0L) + b.counters.getOrElse(x, 0L))
      }.toMap
      val trimmed =
        if (sum.size <= k) sum
        else {
          // subtract the (k+1)-th largest count from all, keep positive:
          // ≤k survivors, same error bound as sequential Misra-Gries
          val pivot = sum.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
          sum.flatMap { case (x, v) =>
            if (v - pivot > 0L) Some(x -> (v - pivot)) else None
          }
        }
      Summary(a.n + b.n, trimmed)
    }

    override def finish(r: Summary): Summary = r
    override def bufferEncoder: Encoder[Summary] = Encoders.product[Summary]
    override def outputEncoder: Encoder[Summary] = Encoders.product[Summary]
  }

  /** All keys with exact count > n/k, with their exact counts and shares.
    * Output: (key, cnt, share) ordered by cnt desc then key. Null keys are
    * ignored (sketch counters are keyed by value).
    */
  def heavyHitters(df: DataFrame, key: Column, k: Int): DataFrame = {
    val keyed = df.select(key.cast("string").as("key")).filter(col("key").isNotNull)
    val mg = udaf(new MisraGries(k), Encoders.STRING)
    val row = keyed.select(mg(col("key")).as("s"))
      .select(col("s.n"), col("s.counters")).head()
    val n = row.getLong(0)
    val candidates = row.getMap[String, Long](1).keys.toSeq.sorted

    if (candidates.isEmpty || n == 0L) {
      keyed.filter(lit(false))
        .select(col("key"), lit(0L).as("cnt"), lit(0.0).as("share"))
    } else {
      keyed.filter(col("key").isin(candidates: _*))
        .groupBy("key")
        .agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") > lit(n.toDouble / k))
        .withColumn("share", round(col("cnt") / lit(n.toDouble), 6))
        .orderBy(desc("cnt"), col("key"))
    }
  }
}
