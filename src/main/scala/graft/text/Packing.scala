package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-data preparation: documents are
  * concatenated per stream (source/shard) in a deterministic order and cut
  * into fixed-size context windows. The planner below computes, per
  * document, which windows it lands in — the metadata a packing writer
  * needs — without materializing the concatenation.
  *
  * Scale shape: one running-sum window per stream (shuffle keyed by the
  * stream column; each stream's ordering is independent, so streams spread
  * across the cluster). No global sort, no collect. At 100 TB the stream
  * column is the shard key, so window state stays bounded per task.
  */
object Packing {

  /** Per-document packing plan: `start_off` (chars before it in its
    * stream), `chunk_first`/`chunk_last` (0-based window ids it spans at
    * `windowSize`), and `n_chunks` — documents longer than a window span
    * several (they are split across windows, the standard packing-with-
    * overflow used when concatenating corpora into fixed-length samples).
    * `sizeCol` is any additive length measure (chars, tokens).
    */
  def chunkPlan(df: DataFrame, streamCol: String, orderCol: String,
      sizeCol: Column, windowSize: Long): DataFrame = {
    val w = Window.partitionBy(col(streamCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withEnd = df.withColumn("__end_off", sum(sizeCol).over(w))
      .withColumn("start_off", col("__end_off") - sizeCol)
    withEnd
      .withColumn("chunk_first", floor(col("start_off") / windowSize))
      .withColumn("chunk_last",
        when(sizeCol > 0, floor((col("__end_off") - 1) / windowSize))
          .otherwise(floor(col("start_off") / windowSize)))
      .withColumn("n_chunks", col("chunk_last") - col("chunk_first") + 1)
      .drop("__end_off")
  }

  /** MATERIALIZE the packed windows: every output row is one fixed-size
    * context window of its stream — documents are cut at window boundaries
    * (overflow split) and fragments reassemble in stream order. The write
    * side of [[chunkPlan]]: explode each doc into the windows it spans,
    * slice the overlapping substring per window, regroup by window.
    * Shuffles: the per-stream running-sum window + one groupBy(stream,
    * window) — both keyed; fragment slicing is pure projection.
    */
  def packWindows(df: DataFrame, streamCol: String, orderCol: String,
      textCol: Column, windowSize: Long): DataFrame = {
    val w = Window.partitionBy(col(streamCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sized = df.select(col(streamCol), col(orderCol), textCol.as("__text"))
      .withColumn("__sz", length(col("__text")).cast("long"))
      .withColumn("__end", sum(col("__sz")).over(w))
      .withColumn("__start", col("__end") - col("__sz"))
      .filter(col("__sz") > 0)
    val frags = sized
      .withColumn("chunk_id", explode(sequence(
        floor(col("__start") / windowSize),
        floor((col("__end") - 1) / windowSize))))
      .withColumn("__fs", greatest(col("chunk_id") * windowSize - col("__start"), lit(0L)))
      .withColumn("__fl",
        least((col("chunk_id") + 1) * windowSize, col("__end"))
          - greatest(col("chunk_id") * windowSize, col("__start")))
      .withColumn("__frag", col("__text").substr(col("__fs") + 1, col("__fl")))
    frags.groupBy(col(streamCol), col("chunk_id"))
      .agg(
        array_join(transform(
          sort_array(collect_list(struct(col("__start"), col("__frag")))),
          s => s("__frag")), "").as("window_text"),
        count(lit(1)).as("n_docs"))
  }

  /** Per-document SLIDING-window chunking with overlap — the
    * embedding/retrieval prep step (chunk i covers [i·stride, i·stride+size);
    * stride < size ⇒ consecutive chunks overlap by size−stride so no
    * boundary context is lost). Pure projection + one explode; no shuffle,
    * no window — chunk geometry is arithmetic on the doc's own length.
    * Contrast [[packWindows]], which cuts a whole STREAM into disjoint
    * fixed windows across documents.
    */
  def chunkSliding(df: DataFrame, idCol: String, textCol: Column,
      size: Int, stride: Int): DataFrame = {
    require(stride > 0 && size >= stride, "need 0 < stride <= size")
    val n = length(col("__text"))
    val nChunks = when(n <= size, lit(1L)).otherwise(
      ceil((n - size).cast("double") / stride).cast("long") + 1L)
    // under-partitioned-scan guard: the chunk explode amplifies by
    // ~len/stride per doc straight off the scan (contrast packWindows,
    // whose explode runs AFTER the per-stream window shuffle and inherits
    // its partitioning)
    graft.ops.Spread.forAmplification(
        df.select(col(idCol), textCol.as("__text")), col(idCol))
      .withColumn("chunk_idx", explode(sequence(lit(0L), nChunks - 1)))
      .select(col(idCol), col("chunk_idx").cast("int").as("chunk_idx"),
        col("__text").substr(
          (col("chunk_idx") * stride + 1).cast("int"), lit(size)).as("chunk_text"))
  }

  /** Stream-level packing summary: windows needed, documents, payload, and
    * how many documents straddle a window boundary (each straddler costs a
    * split at write time — a packing-efficiency signal).
    */
  def chunkSummary(df: DataFrame, streamCol: String, orderCol: String,
      sizeCol: Column, windowSize: Long): DataFrame =
    chunkPlan(df, streamCol, orderCol, sizeCol, windowSize)
      .groupBy(col(streamCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(sizeCol).as("total_size"),
        (max(col("chunk_last")) + 1).as("n_windows"),
        sum(when(col("n_chunks") > 1, 1L).otherwise(0L)).as("n_straddlers"))

  /** Length-bucketed batching audit for padded inference/training: assign
    * each sequence to the next power-of-two length bucket (floored at
    * `minBucket`) and report per-bucket document count, payload, padding
    * tokens, and waste fraction — the "how much compute goes to pad
    * tokens" diagnostic that decides bucket boundaries. A pure projection
    * + one groupBy over ≤ log2(maxLen) buckets: no shuffle beyond the
    * bucket-sized aggregate.
    */
  def lengthBuckets(df: DataFrame, sizeCol: Column,
      minBucket: Int = 16): DataFrame = {
    val n = sizeCol.cast("long")
    // next power of two >= n by INTEGER math: 2^(bit length of n-1).
    // ceil(log2(n)) via doubles overshoots on exact powers of two where
    // ln(n)/ln(2) lands at k + 4e-16 (n = 2^29, 2^31, ...), which would
    // disagree with an engine computing log2 exactly — bin() length can't.
    // pow(2, k) is exact for integral k (powers of two are representable);
    // the Scala shiftleft() overload only takes a literal bit count
    val bucket = greatest(lit(minBucket.toLong),
      pow(lit(2.0), length(bin(n - 1)).cast("double")).cast("long"))
    df.select(when(n > 0, bucket).otherwise(lit(minBucket.toLong)).as("bucket"),
        sizeCol.cast("long").as("__n"))
      .groupBy("bucket")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("__n")).as("tok_total"),
        sum(col("bucket") - col("__n")).as("pad_total"))
      .withColumn("waste_frac", round(
        col("pad_total").cast("double") / (col("bucket") * col("n_docs")), 6))
  }
}
