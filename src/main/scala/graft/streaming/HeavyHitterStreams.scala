package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

import graft.ops.HeavyHitters.{MisraGries, Summary}

/** Streaming heavy hitters: the Misra-Gries sketch (ops/HeavyHitters) kept
  * as mapGroupsWithState state, sharded by key hash — the "what's trending
  * in the ingest stream RIGHT NOW" monitor (hot domains, hot templates,
  * spamming user-agents) with state O(shards · k), independent of both key
  * cardinality and stream length.
  *
  * Shards partition the key space, so a key's whole count lives in one
  * shard and the within-shard Misra-Gries guarantee lifts to the stream:
  * every key with true count > n/k survives in its shard's counters
  * (count > n/k ≥ n_shard/k). Merging the latest per-shard summaries
  * (disjoint key sets — pure union, no trim) yields the global candidate
  * superset; an exact count of just those candidates (the batch
  * HeavyHitters pass-2) removes false positives when exactness matters.
  */
object HeavyHitterStreams {

  /** Update-mode stream of (shard, summary): each micro-batch re-emits the
    * current summary of every shard that saw data. Also runs on a batch
    * Dataset (mapGroupsWithState executes on batch frames) for twin tests.
    */
  def shardSummaries(events: DataFrame, key: Column, k: Int,
      shards: Int = 8): Dataset[(Int, Summary)] = {
    val spark = events.sparkSession
    import spark.implicits._
    val mg = new MisraGries(k)
    events
      .select(
        pmod(xxhash64(key.cast("string")), lit(shards)).cast("int").as("shard"),
        key.cast("string").as("key"))
      .filter(col("key").isNotNull)
      .as[(Int, String)]
      .groupByKey(_._1)
      .mapGroupsWithState[Summary, (Int, Summary)](GroupStateTimeout.NoTimeout) {
        (shard: Int, rows: Iterator[(Int, String)], state) =>
          val prev = state.getOption.getOrElse(mg.zero)
          val next = rows.foldLeft(prev)((s, r) => mg.reduce(s, r._2))
          state.update(next)
          (shard, next)
      }
  }

  /** Merge the latest per-shard summaries into the global candidate
    * summary. Shards hold DISJOINT key sets, so this is a pure union —
    * counters never trim against each other and the superset guarantee is
    * preserved exactly.
    */
  def mergeShards(latest: Seq[Summary]): Summary =
    latest.foldLeft(Summary(0L, Map.empty)) { (acc, s) =>
      Summary(acc.n + s.n, acc.counters ++ s.counters)
    }

  /** Candidate keys whose sketch counter could exceed the n/k threshold —
    * the alert list a monitor shows between exact-count refreshes.
    */
  def candidates(merged: Summary, k: Int): Seq[String] =
    merged.counters.keys.toSeq.sorted
}
