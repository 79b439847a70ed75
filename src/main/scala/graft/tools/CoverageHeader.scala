package graft.tools

/** Generates the COVERAGE.md header counts from the LIVE registry instead of
  * hand-maintained numbers (which went stale for three rounds running).
  * Usage: runMain graft.tools.CoverageHeader [CORRECTNESS_rNN.json]
  *
  * Prints: registered query count, oracled count, rows-only list (registry
  * truth), and — when a correctness artifact is supplied — the pass counts
  * parsed from it, cross-checked against the registry. Paste the block over
  * COVERAGE.md's header paragraph each round (or eyeball the diff).
  */
object CoverageHeader {
  def main(args: Array[String]): Unit = {
    val queries = graft.SparkEntry.queries
    val oracles = graft.SparkEntry.oracleSql
    val rowsOnly = queries.keySet.diff(oracles.keySet).toSeq.sorted
    println(s"registered=${queries.size} oracled=${oracles.size} " +
      s"rows_only=${rowsOnly.mkString(",")}")

    args.headOption.foreach { path =>
      val txt = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(path)), "UTF-8")
      // artifact shape is flat and regular (driver-written) — a regex scan
      // beats a JSON dependency we are not allowed to add
      val entry = """"(q[^"]+)":\s*\{([^}]*)\}""".r
      val rows = entry.findAllMatchIn(txt).map { m =>
        val body = m.group(2)
        val pass = Seq("rows_match", "schema_match", "hash_match")
          .forall(k => body.contains(s""""$k": true"""))
        val noOracle = body.contains(""""err": "no_oracle"""")
        (m.group(1), pass, noOracle)
      }.toSeq
      val passed = rows.count(_._2)
      val noOracle = rows.filter(_._3).map(_._1).sorted
      val failed = rows.filterNot(r => r._2 || r._3).map(_._1).sorted
      println(s"artifact=$path checked=${rows.size} hash_match=$passed " +
        s"no_oracle=${noOracle.mkString(",")} " +
        s"failing=${if (failed.isEmpty) "NONE" else failed.mkString(",")}")
      val missing = queries.keySet.diff(rows.map(_._1).toSet).toSeq.sorted
      if (missing.nonEmpty)
        println(s"registered_but_absent_from_artifact=${missing.mkString(",")}")
      println(
        s"""|Suggested COVERAGE.md header:
            |  driver gate ($passed/${rows.size - noOracle.size} oracle-eligible hash-match at sf0.01
            |  across ${queries.size} registered queries — rows-only: ${rowsOnly.mkString(", ")})""".stripMargin)
    }
  }
}
