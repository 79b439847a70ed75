package graft.ops

import org.apache.spark.sql.{Column, DataFrame}

/** Parallelism guard for EXPLODE-AMPLIFYING scans — the scan-side sibling
  * of [[EntityMatch]]'s spreadProbe (the round-10 q134 lesson, recurring
  * at the sf10 decade as q279/q286/q231/q232): an operator whose first
  * stage multiplies each input row into tens-to-hundreds of derived rows
  * (per-position gram explode, per-dimension posexplode, per-resample
  * explode) inherits the SCAN's partitioning — and a compact input (one
  * parquet file under `maxPartitionBytes`; the sf10 documents table is a
  * single 69 MB file) scans as ONE split, so the corpus-sized explode +
  * hash + shuffle-write map stage serializes on a single core while the
  * other 31 idle. The same trap at 100 TB is a handful of huge
  * unsplittable files (gzip'd JSONL dumps, consolidated exports) feeding a
  * 1000-executor job: the guard below is exactly how a cluster job
  * defends, too.
  *
  * One hash repartition of the NARROW pre-explode projection (id + text /
  * vector — strictly smaller than the explode output it unblocks) spreads
  * the amplification across every core. It applies ONLY when the input is
  * under-partitioned relative to the cluster (fewer planned splits than
  * `defaultParallelism`): a well-split 100 TB read (hundreds of thousands
  * of splits) passes through untouched and pays nothing. The partition
  * count is passed EXPLICITLY so AQE's coalescer — which sizes partitions
  * by the exchange's OWN bytes and cannot see the downstream amplification
  * — leaves the exchange alone (AQE only re-plans shuffles whose partition
  * count the user did not pin).
  *
  * Callers pass the operator's row key (doc id, vector id) as the
  * repartition column: hash-on-key needs no round-robin stabilization
  * sort, and every downstream stage here is a keyed aggregate / join whose
  * result is partitioning-independent by the repo's order-independence
  * contract.
  */
object Spread {

  /** Engagement floor for CHEAP explodes (tokens, shingles, split lines,
    * hashed n-gram features: a handful of derived rows per input byte,
    * each through codegen'd string ops). Below this the whole serialized
    * map stage is sub-second and the added exchange + 32-way task
    * scheduling costs MORE than it saves — measured: guarding the token
    * ops unconditionally made the 26 text queries 25.2 s → 29.8 s at
    * sf0.1 (584 KB documents), while the same guard at sf10 (69 MB) is
    * the difference between 1 core and 32. */
  final val DefaultMinBytes: Long = 8L << 20

  /** Engagement floor for HEAVY amplification (per-position window
    * hashing ~sub× per char, PCA's dim²/2 products per row, b-way
    * bootstrap resamples with an md5 per derived row): per-input-byte
    * work is 1-2 orders above the token ops, so serialization hurts from
    * a few hundred KB up — q279 at the 6.9 MB sf1 documents file was
    * 84.5 s serialized vs 9.4 s spread. */
  final val HeavyMinBytes: Long = 128L << 10

  def forAmplification(df: DataFrame, by: Column*): DataFrame =
    forAmplification(df, DefaultMinBytes, by: _*)

  def forHeavyAmplification(df: DataFrame, by: Column*): DataFrame =
    forAmplification(df, HeavyMinBytes, by: _*)

  /** r14: the same guard for HEAVY NON-AMPLIFYING per-row stages — exact
    * DECIMAL moment sums (a BigDecimal allocation chain per row per term),
    * per-row md5 split draws, percentile/median value buffers. These don't
    * multiply rows, but a compact single-split scan feeding them serializes
    * the whole O(n) pass on one core exactly like an explode does (measured:
    * q265's 12-term moment aggregate over the one-split sf0.1 lineitem ran
    * 4.5 s on 1 of 32 cores; spread, 0.6 s). Same no-op-at-scale property:
    * a well-split cluster read passes through untouched. Floor = the heavy
    * floor — per-byte cost of a decimal-sum chain sits with the hashing
    * amplifiers, well above the token ops the DefaultMinBytes floor serves.
    */
  def forHeavyStage(df: DataFrame, by: Column*): DataFrame =
    forAmplification(df, HeavyMinBytes, by: _*)

  def forAmplification(df: DataFrame, minBytes: Long,
      by: Column*): DataFrame = {
    // a streaming frame cannot be inspected via .rdd and inherits its
    // micro-batch partitioning from the source; pass through untouched
    if (df.isStreaming) return df
    // size gate first: the estimate needs only logical optimization,
    // while the partition probe below pays physical planning
    if (df.queryExecution.optimizedPlan.stats.sizeInBytes < minBytes)
      return df
    val p = df.sparkSession.sparkContext.defaultParallelism
    // queryExecution.toRdd, not df.rdd: both pay one physical-planning
    // pass for the probe (the caller's own action plans again either
    // way), but toRdd skips wrapping the lineage in a row deserializer —
    // the probe never computes the RDD, it only reads the partition count
    // from the planned scan splits
    if (df.queryExecution.toRdd.getNumPartitions >= p) df
    else if (by.isEmpty) df.repartition(p)
    else df.repartition(p, by: _*)
  }
}
