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

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs at sf0.001 with rows") {
      val df = fn(spark, sf001)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }
}
