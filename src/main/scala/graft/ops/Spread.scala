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

  def forAmplification(df: DataFrame, by: Column*): DataFrame = {
    // a streaming frame cannot be inspected via .rdd and inherits its
    // micro-batch partitioning from the source; pass through untouched
    if (df.isStreaming) return df
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= p) df
    else if (by.isEmpty) df.repartition(p)
    else df.repartition(p, by: _*)
  }
}
