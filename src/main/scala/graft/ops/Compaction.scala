package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Output-file compaction planning — the small-files problem at 100 TB.
  * A table written by many tasks accumulates skewed file sizes; compaction
  * groups items (files, row groups, documents) into target-sized output
  * bins WITHOUT reading payload bytes, from the size metadata alone —
  * the planning half of Delta/Iceberg OPTIMIZE.
  */
object Compaction {

  /** Sequential bin packing within each partition: items ordered by
    * `orderCol` (deterministic tie-free id), bin id = floor(exact running
    * size BEFORE this item / targetSize). Every bin except a partition's
    * last holds ≥ targetSize − max(item) and < targetSize + max(item)
    * bytes — the "next-fit by running sum" compaction strategy, chosen
    * over first-fit-decreasing because it is expressible as ONE keyed
    * prefix sum (no sequential bin state), preserves the input order
    * (range-readable output), and is within max(item)/target of optimal
    * when items are small vs the target.
    *
    * The running sum is DECIMAL (exact) and the window is keyed by the
    * partition columns — no global sort, no driver loop; at 100 TB this
    * plans millions of files in one shuffle.
    * Returns the input plus `bin` (0-based within partition).
    */
  def planBins(df: DataFrame, partCols: Seq[String], sizeCol: Column,
      orderCol: Column, targetSize: Long): DataFrame = {
    require(targetSize > 0, s"planBins: targetSize must be positive, got $targetSize")
    val w = Window.partitionBy(partCols.map(col): _*).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    val before = coalesce(sum(sizeCol.cast("decimal(28,0)")).over(w), lit(0L))
    df.withColumn("bin", floor(before / targetSize).cast("bigint"))
  }

  /** Per-bin compaction manifest: bin item count and exact byte total,
    * ordered (partition, bin) — what the rewrite job consumes. */
  def binManifest(planned: DataFrame, partCols: Seq[String],
      sizeCol: Column): DataFrame =
    planned
      .groupBy((partCols :+ "bin").map(col): _*)
      .agg(count(lit(1)).as("n_items"),
        sum(sizeCol.cast("decimal(28,0)")).cast("bigint").as("total_size"))
      .orderBy((partCols :+ "bin").map(col): _*)
}
