package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranking-quality evaluation: nDCG@k and MRR per query group — the offline
  * eval loop for the retrieval operators (BM25 q86, cosine top-k q48, RRF
  * q110). A retrieval change ships only if these metrics hold.
  */
object RankEval {

  /** Per-group nDCG@k and MRR@k: rank items inside each `group` by
    * `scoreCol` desc (tie-broken by `tieCol` asc, so ranking is total and
    * engines agree), take the top k, and score against the `relCol` gain.
    *
    * DCG = Σ rel_i / log2(i+1) over the TOP-K BY SCORE; the ideal DCG
    * re-ranks the same top-k set by relevance — both windows share ONE
    * group-key shuffle (the second ordering is a re-sort within
    * partitions, not a new exchange). Each term is cast DECIMAL(28,10)
    * before summing (order-independent), mirrored by the oracle; output
    * rounds to 6. MRR = 1/first-relevant-rank, 0 when the top-k has no
    * relevant item. Groups emit one row each: (group, n_rel, ndcg, mrr).
    */
  def ndcgAtK(df: DataFrame, group: String, scoreCol: Column, relCol: Column,
      tieCol: Column, k: Int = 10): DataFrame = {
    val byScore = Window.partitionBy(group).orderBy(scoreCol.desc, tieCol.asc)
    val rel = relCol.cast("double")
    val ranked = df
      .withColumn("__rank", row_number().over(byScore))
      .filter(col("__rank") <= k)
    val byRel = Window.partitionBy(group).orderBy(rel.desc, tieCol.asc)
    // explicit ln ratio — log(base, x) helpers differ across engines
    val ln2 = log(lit(2.0))
    val gain = (rel / (log(col("__rank").cast("double") + 1.0) / ln2))
      .cast("decimal(28,10)")
    val idealGain =
      (rel / (log(row_number().over(byRel).cast("double") + 1.0) / ln2))
        .cast("decimal(28,10)")
    ranked
      .withColumn("__ideal", idealGain)
      .groupBy(group)
      .agg(
        sum(when(rel > 0, 1L).otherwise(0L)).as("n_rel"),
        sum(gain).cast("double").as("__dcg"),
        sum(col("__ideal")).cast("double").as("__idcg"),
        min(when(rel > 0, col("__rank"))).as("__first"))
      .withColumn("ndcg",
        when(col("__idcg") > 0, round(col("__dcg") / col("__idcg"), 6))
          .otherwise(lit(0.0)))
      .withColumn("mrr",
        coalesce(round(lit(1.0) / col("__first").cast("double"), 6), lit(0.0)))
      .select(col(group), col("n_rel"), col("ndcg"), col("mrr"))
  }

  /** Textbook nDCG@k: like [[ndcgAtK]] but the ideal DCG ranks ALL of the
    * group's items by relevance (capped at k) — the standard definition,
    * where a retriever that fails to surface relevant items is penalized
    * (ndcgAtK's local ideal only scores the ordering OF the retrieved set).
    * `n_rel` counts every relevant item in the group, not just retrieved.
    *
    * Same scale shape: both row_number windows share ONE group-key shuffle
    * (same partition key, different intra-partition sort); the aggregate
    * runs over all group rows instead of the top-k slice, which is the
    * price of the global ideal — there is no way to know the best possible
    * DCG without seeing every relevant item.
    */
  def ndcgAtKGlobalIdeal(df: DataFrame, group: String, scoreCol: Column,
      relCol: Column, tieCol: Column, k: Int = 10): DataFrame = {
    val byScore = Window.partitionBy(group).orderBy(scoreCol.desc, tieCol.asc)
    val byRel = Window.partitionBy(group).orderBy(relCol.cast("double").desc, tieCol.asc)
    val rel = relCol.cast("double")
    val ln2 = log(lit(2.0))
    val ranked = df
      .withColumn("__rank", row_number().over(byScore))
      .withColumn("__irank", row_number().over(byRel))
    val gain = when(col("__rank") <= k,
        rel / (log(col("__rank").cast("double") + 1.0) / ln2))
      .otherwise(lit(0.0)).cast("decimal(28,10)")
    val idealGain = when(col("__irank") <= k,
        rel / (log(col("__irank").cast("double") + 1.0) / ln2))
      .otherwise(lit(0.0)).cast("decimal(28,10)")
    ranked
      .groupBy(group)
      .agg(
        sum(when(rel > 0, 1L).otherwise(0L)).as("n_rel"),
        sum(gain).cast("double").as("__dcg"),
        sum(idealGain).cast("double").as("__idcg"),
        min(when(rel > 0 && col("__rank") <= k, col("__rank"))).as("__first"))
      .withColumn("ndcg",
        when(col("__idcg") > 0, round(col("__dcg") / col("__idcg"), 6))
          .otherwise(lit(0.0)))
      .withColumn("mrr",
        coalesce(round(lit(1.0) / col("__first").cast("double"), 6), lit(0.0)))
      .select(col(group), col("n_rel"), col("ndcg"), col("mrr"))
  }

  /** Per-group precision@k, recall@k, hit@k and average precision@k — the
    * set-based eval card beside the graded nDCG/MRR pair: P@k is what the
    * user sees on page one, R@k is what the retriever left behind, AP@k
    * (→ MAP when averaged) rewards putting relevant items early.
    *
    * AP@k = Σ_{relevant i ≤ k} P@i / min(R, k) with R the group's TOTAL
    * relevant count (the trec_eval convention). Same scale shape as
    * ndcgAtK: every window shares the ONE group-key shuffle; AP terms
    * are DECIMAL(28,10) before summing; ratios round 6. Output:
    * (group, n_rel_total, n_rel_at_k, precision_at_k, recall_at_k,
    * hit_at_k, ap_at_k). */
  def precisionRecallAtK(df: DataFrame, group: String, scoreCol: Column,
      relCol: Column, tieCol: Column, k: Int = 10): DataFrame = {
    require(k >= 1, "precisionRecallAtK needs k >= 1")
    def nz(c: Column): Column = when(c =!= 0.0, c)
    val byScore = Window.partitionBy(group).orderBy(scoreCol.desc, tieCol.asc)
    val withRank = df
      .withColumn("__rank", row_number().over(byScore))
      .withColumn("__rel",
        when(relCol.cast("double") > 0, 1L).otherwise(0L))
    val totals = withRank.groupBy(group)
      .agg(sum(col("__rel")).as("n_rel_total"))
    val cum = Window.partitionBy(group).orderBy(col("__rank"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val perGroup = withRank.filter(col("__rank") <= k)
      .withColumn("__cum", sum(col("__rel")).over(cum))
      .groupBy(group)
      .agg(
        sum(col("__rel")).as("n_rel_at_k"),
        sum(when(col("__rel") === 1L,
          (col("__cum").cast("double") / col("__rank").cast("double"))
            .cast("decimal(28,10)"))).as("__apsum"))
    perGroup.join(totals, Seq(group))
      .withColumn("precision_at_k",
        round(col("n_rel_at_k").cast("double") / k.toDouble, 6))
      .withColumn("recall_at_k",
        coalesce(round(col("n_rel_at_k").cast("double") /
          nz(col("n_rel_total").cast("double")), 6), lit(0.0)))
      .withColumn("hit_at_k", col("n_rel_at_k") > 0)
      .withColumn("ap_at_k",
        coalesce(round(col("__apsum").cast("double") /
          nz(least(col("n_rel_total"), lit(k.toLong)).cast("double")), 6),
          lit(0.0)))
      .select(col(group), col("n_rel_total"), col("n_rel_at_k"),
        col("precision_at_k"), col("recall_at_k"), col("hit_at_k"),
        col("ap_at_k"))
      .orderBy(group)
  }
}
