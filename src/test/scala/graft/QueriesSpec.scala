package graft

/** Smoke: every registered query runs at sf0.001 and returns rows; every
  * oracle key matches a query key. Correctness vs DuckDB is checked by the
  * driver (and locally by tools/oracle_check.py).
  */
class QueriesSpec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle keys are a subset of query keys") {
    val qs = SparkEntry.queries.keySet
    val missing = SparkEntry.oracleSql.keySet.diff(qs)
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  /** Queries whose plan is ALLOWED a broadcast nested-loop join — each one
    * broadcasts a side that is tiny BY CONSTRUCTION, which is exactly when
    * BNLJ is the right plan:
    *  - q19: 10-row city dim against the spatial theta predicate
    *  - q24: single-row set-op counts combined into one summary row
    *  - q48: the bounded query set scored against a streaming corpus scan
    *         (the corpus itself never shuffles)
    *  - q65/q143: the nLists-row centroid table probed per query (q143 is
    *         the saved-index load of the same probe)
    *  - q89: the 1-row corpus token total attached to every (doc, token)
    *         partial count (scalar broadcast, not a pair explosion)
    *  - q92: the k-row seed-centroid table probed per vector (quantizer
    *         assignment, same shape as q65's probe)
    *  - q122: q92's centroid assignment applied to both the batch and the
    *         corpus side (the scoring join itself is a cell equi join)
    *  - q98: reuses q48's brute-force scorer (broadcast bounded query set)
    *         as the exact baseline for the recall evaluation
    *  - q103: the 1-row corpus bigram total, as in q89
    *  - q104/q105: the two 1-row corpus totals attached to the ≤buckets-row
    *         DSIR ratio table (the corpus-side scoring join is a BHJ)
    *  - q106: the 1-row percentile-cutoff pair against the per-doc NLL table
    *  - q107: the 1-row corpus token total against the top-k vocab rows
    *  - q108: the bounded query set scored against a streaming corpus scan,
    *         as in q48
    *  - q124: q48's broadcast-query shape over the packed sign-bit words
    *         (the corpus scan carries 2 longs per vector, never shuffles)
    *  - q153: the window-list × reference-histogram densify grid — a cross
    *         of two ≤#windows/#buckets-row report tables (Drift.psiTimeline)
    *  - q156: the marginal×marginal contingency densify grid — a cross of
    *         two ≤#categories-row tables (Stats.chiSquareIndependence)
    *  - q166: the 1-row marginal-sum frame × 1-row diagonal-agreement frame
    *         (Stats.cohenKappa — two scalar aggregates combined)
    *  - q171: the 1-row bigram-total frame against the vocab-sized PMI table
    *         (TextAnalysis.pmiCollocations, the q89/q103 scalar-total shape)
    *  - q172: the day-list × frozen-reference densify grid + the 1-row
    *         min-day/total frames (Drift.psiAgainstReference, q153's shape)
    *  - q187: the 1-row global-max-timestamp frame attached per subject
    *         (EventAnalytics.userLifetimes, the q89 scalar-total shape)
    *  - q189: the 1-row basket-count frame attached to the pair table
    *         (Baskets.pairLift lift denominator)
    *  - q193: the 1-row seasonal-center frame attached to the ≤#days
    *         series (TimeSeries.seasonalDecompose re-centering)
    */
  private val bnljIntended = Set(
    "q19_geo_theta_join", "q24_set_ops", "q48_cosine_topk", "q65_ivf_topk",
    "q89_unigram_nll", "q92_semdedup", "q98_ann_recall", "q103_bigram_nll",
    "q104_dsir_weights", "q105_dsir_resample", "q106_ppl_buckets",
    "q107_vocab_coverage", "q108_hard_negatives", "q110_rrf_fusion",
    "q114_source_terms", "q122_incremental_semdedup", "q124_hamming_topk",
    "q143_ivf_probe_saved", "q153_psi_timeline", "q156_chi_square",
    "q166_cohen_kappa", "q171_pmi_collocations", "q172_psi_vs_reference",
    "q174_mutual_info", // three 1-row frames (entropies + MI) combined
    "q180_bootstrap_ci", // 1-row full-sample frame × 1-row resample stats
    "q187_kaplan_meier", "q189_basket_lift", "q193_seasonal",
    "q202_rfm", // 1-row stream-edge max frame, as in q187
    "q198_triangles", // 1-row node/edge totals × 1-row triangle count
    // q215/q216: the t1 < t2 theta self-join over the ≤#days daily series
    // (Theil–Sen pair slopes / Mann–Kendall sign pairs) — report-sized
    "q215_theil_sen", "q216_mann_kendall",
    "q217_bh_fdr", // 1-row global time-midpoint frame attached per event
    "q218_kendall_tau", // i1 < i2 pair join over the ≤#days daily series
    "q222_doc_keywords", // 1-row corpus-size frame in the IDF (q114 shape)
    "q223_hits", // 1-row L1-normalization totals per half-iteration
    "q225_woe_iv", // 1-row quantile-edge frame attached per order
    "q227_audience_overlap", // ≤#categories² densify grid (cat_a < cat_b)
    "q228_durbin_watson", // 1-row OLS-moment frame over the ≤#days series
    "q229_ols_influence", // same 1-row moment frame as q228
    "q232_bootstrap_uplift", // 1-row full-sample × 1-row resample stats
    "q238_consistency_audit", // 1-row orphan-count frame × 1-row summary
    "q240_gains_chart", // 1-row decile-edge frame attached per doc
    "q242_seasonal_anomaly", // 1-row median/MAD frames over the ≤#days series
    "q245_dup_size_hist", // 1-row corpus-total frame on the size histogram
    "q247_qq_table", // two 1-row percentile-array frames zipped
    "q252_cell_residuals", // marginal × marginal densify grid + 1-row total
    "q255_cohens_d", // 1-row global time-midpoint frame, the q217 shape
    "q257_mix_shift", // 1-row midpoint + 1-row period-totals frames
    "q258_cuped", // 1-row midpoint + 1-row pooled-moments frames
    "q259_kn_bigram_nll", // 1-row bigram-type total, the q103 shape
    "q260_broken_trend", // 1-row CUSUM-split frame over the ≤#days series
    "q262_pq_recall", // q48's broadcast-query exact twin beside the ADC path
    // q270/q271: the q65/q143 probe shape — each query crossJoins the
    // broadcast ≤nLists-row centroid table to rank probes
    "q270_ivf_range", "q271_ivf_add",
    // q302: the q65 probe shape (broadcast centroid crossJoin) PLUS the
    // q262-style broadcast-query brute-force recall leg — both bounded
    // sides; PlanSpec pins the full shape incl. the cell equi join
    "q302_ann_e2e",
    // q304: the q65/q143 probe shape again — queryIvfIndex crossJoins the
    // broadcast k-row centroid table of the tree-seeded build
    "q304_hier_lloyd_ivf",
    "q274_isotropy", // 1-row λ1 frame × 1-row trace frame
    // the maxPairs budget guard crossJoins ONE broadcast count row to
    // embed its plan-level raise_error; the candidate join itself stays
    // the bp hash join (PlanSpec pins that exact shape)
    "q49_cosine_neardup",
    // three 1-row aggregate frames cross-joined (the split-scan shape that
    // replaced the corpus-tripling mixed-DISTINCT Expand; see the QueryDef)
    "q112_approx_audit",
    "q293_ivf_cell_audit") // 1-row (n_total, n_cells) totals frame on per-cell counts

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs at sf0.001 with rows and a scale-shaped plan") {
      val df = fn(spark, sf001)
      // fleet-wide plan regression guard: nothing may plan an all-pairs
      // cartesian product, and BNLJ only where a tiny dim makes it right
      val plan = df.queryExecution.executedPlan.toString()
      assert(!plan.contains("CartesianProduct"), s"$name plans a cartesian product")
      if (!bnljIntended(name))
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"$name plans a broadcast nested-loop join")
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  /** Null-salt lint (round-8 advice): the stock generator never emits NULLs
    * in most columns, so a query that crashes (or silently misbehaves) on
    * null data would ship green. This pass appends rows whose id columns
    * are fresh and every OTHER column is NULL — ids stay non-null per the
    * dedup/join families' documented numeric-id contract; embeddings get no
    * salt rows because a NULL vector is not a state the pipeline admits —
    * then re-runs EVERY registered query over the salted copy. Crashes
    * surface here at authoring time; value-level Spark-vs-oracle null
    * asymmetry is the companion gate, tools/nullsalt_check.py (DuckDB is
    * not on this classpath).
    */
  private val saltIdCols: Map[String, Seq[String]] = Map(
    "region" -> Seq("r_regionkey"), "nation" -> Seq("n_nationkey"),
    "customer" -> Seq("c_custkey"), "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderkey"),
    "lineitem" -> Seq("l_orderkey", "l_linenumber"),
    "events" -> Seq("event_id"), "documents" -> Seq("doc_id"),
    "embeddings" -> Seq())

  private def buildSaltedDir(): String = {
    import org.apache.spark.sql.functions._
    val out = "target/test-nullsalt"
    val done = new java.io.File(s"$out/_done")
    if (done.exists()) return out
    for ((t, ids) <- saltIdCols) {
      val src = spark.read.parquet(s"$sf001/$t.parquet")
      val salted =
        if (ids.isEmpty) src
        else {
          val maxes = src.agg(
            ids.head -> "max", ids.tail.map(_ -> "max"): _*).collect().head
          val salt = spark.range(7).select(src.schema.fields.map { f =>
            val i = ids.indexOf(f.name)
            if (i >= 0) (lit(maxes.getAs[Number](i).longValue) + col("id") + 1)
              .cast(f.dataType).as(f.name)
            else lit(null).cast(f.dataType).as(f.name)
          }: _*)
          src.unionByName(salt)
        }
      salted.coalesce(1).write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
    done.getParentFile.mkdirs()
    done.createNewFile()
    out
  }

  test("null-salt lint: every registered query runs over the salted corpus") {
    val dir = buildSaltedDir()
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, dir).count(); None }
        catch { case e: Throwable =>
          Some(s"$name: ${Option(e.getMessage).getOrElse(e.toString).take(160)}")
        }
    }
    assert(failures.isEmpty, s"null-salted crashes:\n${failures.mkString("\n")}")
  }
}
