package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.SparkEntry

/** sf≈1 scale spot-check (dev tool): the sf0.1 bench can't see a
  * superlinear cliff that only opens at 10× the data, so this main
  * materializes a 10×-replicated copy of sf0.1 (ids shifted per replica so
  * keys stay unique and joins keep their selectivity; text/vector payloads
  * repeat verbatim — which deliberately stresses the dedup families' hot-
  * bucket caps) and times the most expensive queries against it.
  *
  * The driver ships no sf1 testdata, so this is synthesized FROM the
  * driver's own sf0.1 parquet — a bench corpus, not an oracle input (the
  * correctness gate stays on the driver's data).
  *
  * Output: one JSON line {"metric":"sf1_total", "queries":{name:sec},
  * "slope":{name:sec_sf1/pin_sf0.1}} plus a BENCH_SF1.json sidecar. A
  * healthy slope is ≈10 (linear in data) — 32 partitions of 10× data with
  * fixed cores; >>10 flags a cliff worth profiling.
  */
object BenchSf1 {

  /** Per-table id columns shifted by replica (key + FKs shift together, so
    * each replica is a self-consistent TPC-H universe — join fan-outs stay
    * identical to sf0.1's, only 10× as many). */
  private val shiftCols: Map[String, Seq[String]] = Map(
    "region" -> Seq("r_regionkey"),
    "nation" -> Seq("n_nationkey", "n_regionkey"),
    "customer" -> Seq("c_custkey", "c_nationkey"),
    "supplier" -> Seq("s_suppkey", "s_nationkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  /** The round-8 top-10 most expensive queries (VERDICT r8 plan audit). */
  private val headline = Seq(
    "q137_pagerank", "q134_fuzzy_match", "q60_immo_pipeline",
    "q61_link_lifecycle", "q103_bigram_nll", "q68_embed_clusters",
    "q126_shared_spans", "q64_ml_leaderboard", "q104_dsir_weights",
    "q49_cosine_neardup")

  def main(args: Array[String]): Unit = {
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "target/bench_sf1")
    val replicas = sys.env.getOrElse("SPARK_GRAFT_SF1_REPLICAS", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    shiftCols.foreach { case (t, ids) =>
      val dst = s"$outDir/$t.parquet"
      if (!fs.exists(new org.apache.hadoop.fs.Path(s"$dst/_SUCCESS"))) {
        val src = spark.read.parquet(s"$srcDir/$t.parquet")
        // shift base = max+1 per id column (1-row bounded barrier)
        val maxes = src.agg(ids.map(c => max(col(c)).as(c)).head,
          ids.map(c => max(col(c)).as(c)).tail: _*).head()
        val bases = ids.map(c => c -> (maxes.getAs[Number](c).longValue + 1L)).toMap
        val all = (0 until replicas).map { r =>
          ids.foldLeft(src) { case (d, c) =>
            d.withColumn(c, (col(c) + lit(r * bases(c))).cast(src.schema(c).dataType))
          }
        }.reduce(_ unionByName _)
        all.write.mode("overwrite").parquet(dst)
      }
    }

    def r3(v: Double): String = f"$v%.3f"
    val pins = graft.BenchPins.values
    // warmup
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val qmap = SparkEntry.queries
    val times = headline.filter(qmap.contains).map { name =>
      val t0 = System.nanoTime()
      val ok = try { qmap(name)(spark, outDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[sf1] $name failed: ${e.getMessage}"); false }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = times.map { case (k, v) => "\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val slopes = times.collect { case (k, v) if v > 0 && pins.contains(k) =>
      "\"" + k + "\":" + r3(v / pins(k))
    }.mkString("{", ",", "}")
    val line = s"""{"metric":"sf1_total","value":${r3(times.map(_._2).filter(_ > 0).sum)},"unit":"sec","replicas":$replicas,"queries":$qs,"slope_vs_sf01_pin":$slopes}"""
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_SF1.json"), line.getBytes("UTF-8"))
    catch { case _: Throwable => () }
    println(line)
    spark.stop()
  }
}
