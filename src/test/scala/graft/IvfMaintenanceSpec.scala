package graft

import org.apache.spark.sql.functions._

import graft.sim.Similarity

/** IVF maintenance: cell-balance audit invariants and the oversized-cell
  * split — set preservation, parent retirement, determinism, and the
  * probe-parity recall gate (the q262 pattern: approximate reads must not
  * silently lose recall after maintenance).
  */
class IvfMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private def embeddings = Tables.embeddings(spark, sf001)

  private def buildIdx() =
    Similarity.buildIvfIndexLloyd(embeddings, "vec_id", "embedding",
      nLists = 8, iters = 2)

  test("cellBalanceAudit: counts partition the corpus, shares sum to 1") {
    val idx = buildIdx()
    val audit = Similarity.cellBalanceAudit(idx).collect()
    val total = embeddings.count()
    assert(audit.map(_.getAs[Long]("n_vecs")).sum == total)
    assert(math.abs(audit.map(_.getAs[Double]("share")).sum - 1.0) < 1e-4)
    // flag consistency: oversized iff n > 2 * mean
    val mean = total.toDouble / audit.length
    audit.foreach { r =>
      assert(r.getAs[Boolean]("oversized") ==
        r.getAs[Long]("n_vecs") > 2.0 * mean)
    }
  }

  test("splitCell: children partition the parent, parent retired, " +
      "rest untouched, deterministic") {
    val idx = buildIdx()
    val parent = Similarity.cellBalanceAudit(idx)
      .orderBy(col("n_vecs").desc, col("cell")).head().getInt(0)
    val parentMembers = idx.cells.filter(col("cell") === parent)
      .select("cid").as[Long].collect().toSet
    val maxOld = idx.centroids.agg(max("cell")).head().getInt(0)
    val after = Similarity.splitCell(idx, parent, iters = 2)
    // parent id gone from both relations
    assert(after.centroids.filter(col("cell") === parent).count() == 0)
    assert(after.cells.filter(col("cell") === parent).count() == 0)
    // children carry exactly the parent's members
    val childMembers = after.cells.filter(col("cell") > maxOld)
      .select("cid").as[Long].collect().toSet
    assert(childMembers == parentMembers)
    // every other cell untouched
    val beforeRest = idx.cells.filter(col("cell") =!= parent)
      .select("cid", "cell").as[(Long, Int)].collect().toSet
    val afterRest = after.cells.filter(col("cell") <= maxOld)
      .select("cid", "cell").as[(Long, Int)].collect().toSet
    assert(afterRest == beforeRest)
    // total vector set preserved
    assert(after.cells.count() == idx.cells.count())
    // deterministic: a second split produces identical child centroids
    val again = Similarity.splitCell(idx, parent, iters = 2)
    assert(after.centroids.filter(col("cell") > maxOld)
      .orderBy("cell").collect().toSeq ==
      again.centroids.filter(col("cell") > maxOld)
        .orderBy("cell").collect().toSeq)
  }

  test("probe-parity recall gate: splitting must not lose recall at " +
      "equal probe BUDGET (probed fraction of the corpus)") {
    val idx = buildIdx()
    val parent = Similarity.cellBalanceAudit(idx)
      .orderBy(col("n_vecs").desc, col("cell")).head().getInt(0)
    val after = Similarity.splitCell(idx, parent, iters = 2)
    val queries = embeddings.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(queries, embeddings,
      "vec_id", "embedding", k = 3)
    def meanRecall(index: Similarity.IvfIndex, nProbe: Int): Double = {
      val approx = Similarity.queryIvfIndex(index, queries,
        "vec_id", "embedding", k = 3, nProbe = nProbe)
      Similarity.recallAtK(approx, exact, "qid", "cid")
        .agg(avg("recall")).head().getDouble(0)
    }
    // splitting the fat cell refines the probe granularity: with one
    // extra probe (the split added one centroid) the candidate volume is
    // at most the original's, and recall must hold
    val before = meanRecall(idx, nProbe = 3)
    val afterRecall = meanRecall(after, nProbe = 4)
    assert(afterRecall >= before - 1e-9,
      s"recall regressed after split: $before -> $afterRecall")
    assert(afterRecall > 0.5, s"absolute recall floor: $afterRecall")
  }
}
