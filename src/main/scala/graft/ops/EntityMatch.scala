package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Entity resolution: fuzzy string matching via blocking + edit distance.
  *
  * The naive formulation is an all-pairs cross join with a levenshtein
  * predicate — quadratic and un-runnable at scale. The standard fix (and
  * the one implemented here) is *blocking*: derive a deterministic block
  * key from each string such that any pair within the edit-distance budget
  * shares a block, then equi-join on the block key and score only within
  * blocks. Cost drops from |L|×|R| to Σ|block_L|×|block_R|.
  *
  * Scale shape: one shuffle on the block key; levenshtein stays in
  * whole-stage codegen (native Spark expression). Block-size skew is the
  * operator's failure mode — audit with Checks.skewReport on the block
  * key and refine the blocking function (or salt + multi-pass) if a block
  * grows unbounded. Recall depends on the blocking function covering the
  * perturbation model; run multiple blocking passes and union for higher
  * recall (standard multi-pass blocking), dedup on (left key, right key).
  */
object EntityMatch {

  /** All pairs within `maxDist` edits whose block keys match.
    * Output: leftKey, rightKey, dist — one row per candidate pair.
    */
  def blockedEditDistancePairs(
      left: DataFrame, right: DataFrame,
      leftKey: String, leftText: String,
      rightKey: String, rightText: String,
      block: Column => Column, maxDist: Int): DataFrame = {
    val l = spreadProbe(left
      .select(col(leftKey).as("l_key"), col(leftText).as("l_text"))
      .withColumn("block", block(col("l_text"))), "l_key")
    val r = right.select(col(rightKey).as("r_key"), col(rightText).as("r_text"))
      .withColumn("block", block(col("r_text")))
    l.join(r, "block")
      // cheap length guard first, then the THRESHOLD form of levenshtein —
      // banded DP that abandons a pair the moment it exceeds maxDist
      // (returns -1), instead of computing the full distance matrix.
      // The DP is wrapped in [[graft.functions.EvalOnce]] (r15, guide §4.4):
      // without the barrier the optimizer pushes the dist filter below the
      // projection (folding it into the join condition), so every pair
      // within maxDist ran the banded DP TWICE — once deciding, once
      // projecting. The length guard stays a plain (pushable) predicate.
      .filter(abs(length(col("l_text")) - length(col("r_text"))) <= maxDist)
      .withColumn("dist",
        evalOnce(levenshtein(col("l_text"), col("r_text"), maxDist)))
      .filter(col("dist") >= 0 && col("dist") <= maxDist)
      .select(col("l_key"), col("r_key"), col("dist"))
  }

  /** Parallelism guard for the probe side of a blocked compare. The join
    * typically broadcasts the (narrow, small) candidate side, so the
    * expensive within-block scoring inherits the PROBE SCAN's partitioning
    * — and a compact table (one parquet file under maxPartitionBytes, the
    * sf1 customer table being the caught case) scans as ONE split,
    * serializing minutes of DP on a single core while 31 sit idle. One
    * cheap shuffle of the narrow (key, text, block) projection spreads the
    * probe rows across every core BEFORE the ×|block| work amplification.
    * Spread by (block, probe key), not block alone, so a hot block
    * parallelizes too; if the optimizer falls back to a shuffle join it
    * re-partitions by block anyway and this exchange just disappears into
    * that one.
    */
  private def spreadProbe(df: DataFrame, keyCol: String): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism,
      col("block"), col(keyCol))

  /** All pairs at-or-above `minSim` Jaro–Winkler similarity whose block
    * keys match — the similarity-scored sibling of
    * [[blockedEditDistancePairs]] for name-like keys, where a shared
    * prefix should count FOR a match and a transposition should not kill
    * it (Levenshtein treats both as plain edits). Same blocking contract:
    * recall depends on the block function covering the perturbation model.
    * Output: (l_key, r_key, sim rounded 6), one row per candidate pair.
    *
    * Scale shape: one equi-join shuffle on the block key; the scorer is
    * the codegen'd [[graft.functions.JaroWinkler]] expression evaluated
    * only within blocks — never an all-pairs cross join.
    */
  def blockedJaroWinklerPairs(
      left: DataFrame, right: DataFrame,
      leftKey: String, leftText: String,
      rightKey: String, rightText: String,
      block: Column => Column, minSim: Double): DataFrame = {
    val l = spreadProbe(left
      .select(col(leftKey).as("l_key"), col(leftText).as("l_text"))
      .withColumn("block", block(col("l_text"))), "l_key")
    val r = right.select(col(rightKey).as("r_key"), col(rightText).as("r_text"))
      .withColumn("block", block(col("r_text")))
    l.join(r, "block")
      // EvalOnce barrier (r15, guide §4.4): without it the sim ≥ minSim
      // filter folds into the join condition and every SURVIVING pair —
      // most of a shared-prefix block at minSim 0.9 — scored Jaro–Winkler
      // twice (q192's before-plan shows the scorer in both the join
      // condition and the output projection).
      .withColumn("sim", evalOnce(round(
        graft.text.TextAnalysis.jaroWinkler(col("l_text"), col("r_text")), 6)))
      .filter(col("sim") >= minSim)
      .select(col("l_key"), col("r_key"), col("sim"))
  }

  /** One-evaluation barrier for an expensive pure scorer — see
    * [[graft.functions.EvalOnce]] for the optimizer contract. */
  private def evalOnce(c: Column): Column =
    ColumnBridge.column(graft.functions.EvalOnce(ColumnBridge.expression(c)))

  /** Best Jaro–Winkler match per left entity: maximum similarity, ties
    * broken by the smallest rightKey (min over (−sim, r_key) structs — one
    * keyed aggregate, no window, skew-safe on hot entities). */
  def bestMatchJaroWinkler(
      left: DataFrame, right: DataFrame,
      leftKey: String, leftText: String,
      rightKey: String, rightText: String,
      block: Column => Column, minSim: Double): DataFrame =
    blockedJaroWinklerPairs(left, right, leftKey, leftText, rightKey,
        rightText, block, minSim)
      .groupBy("l_key")
      .agg(min(struct((col("sim") * -1).as("negsim"), col("r_key"))).as("best"))
      .select(col("l_key"), col("best.r_key").as("r_key"),
        (col("best.negsim") * -1).as("sim"))

  /** Best match per left entity: minimum (dist, rightKey) — the tie-break
    * on rightKey makes the pick deterministic. One keyed aggregate over the
    * candidate pairs (min(struct), no window — skew-safe on hot entities).
    */
  def bestMatch(
      left: DataFrame, right: DataFrame,
      leftKey: String, leftText: String,
      rightKey: String, rightText: String,
      block: Column => Column, maxDist: Int): DataFrame =
    blockedEditDistancePairs(left, right, leftKey, leftText, rightKey,
        rightText, block, maxDist)
      .groupBy("l_key")
      .agg(min(struct(col("dist"), col("r_key"))).as("best"))
      .select(col("l_key"), col("best.r_key").as("r_key"),
        col("best.dist").as("dist"))
}
