package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Aggregates, CastOps, Filters, TextOps}

/** Scalar-function operators (SURVEY §2.7) + the remaining aggregates. */
object ScalarQueries extends QueryGroup {

  import Aggregates.{decAvg, decSum}

  /** A9: population skewness via raw moments (identical expression both
    * sides; rounded — moment sums are order-sensitive). */
  val q10Skewness = QueryDef(
    "q10_skewness",
    (s, d) => Tables.orders(s, d)
      .agg(
        avg(col("o_totalprice")).as("mu"),
        avg(col("o_totalprice") * col("o_totalprice")).as("m2"),
        avg(col("o_totalprice") * col("o_totalprice") * col("o_totalprice")).as("m3"))
      .select(round(
        (col("m3") - lit(3) * col("mu") * col("m2") + lit(2) * col("mu") * col("mu") * col("mu"))
          / pow(col("m2") - col("mu") * col("mu"), 1.5), 4).as("skew_pop")),
    Some("""WITH m AS (SELECT avg(o_totalprice) AS mu,
        avg(o_totalprice * o_totalprice) AS m2,
        avg(o_totalprice * o_totalprice * o_totalprice) AS m3 FROM orders)
      SELECT ROUND((m3 - 3 * mu * m2 + 2 * mu * mu * mu) / pow(m2 - mu * mu, 1.5), 4) AS skew_pop
      FROM m"""))

  /** P4: string-length filter (the postal-code == 4 chars pattern). */
  val q13LengthFilter = QueryDef(
    "q13_length_filter",
    (s, d) => Tables.orders(s, d)
      .filter(Filters.lengthEquals(col("o_orderkey"), 4))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("cnt"))
      .orderBy("o_orderstatus"),
    Some("""SELECT o_orderstatus, COUNT(*) AS cnt FROM orders
      WHERE length(CAST(o_orderkey AS VARCHAR)) = 4
      GROUP BY o_orderstatus ORDER BY o_orderstatus NULLS FIRST"""))

  /** P7/F14: inclusive between + exact sums. */
  val q14BetweenFilter = QueryDef(
    "q14_between_filter",
    (s, d) => Tables.events(s, d)
      .filter(col("value").between(10, 50))
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"), decSum(col("value")).as("sum_value"))
      .orderBy("event_type"),
    Some("""SELECT event_type, COUNT(*) AS cnt,
      CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS sum_value
      FROM events WHERE value BETWEEN 10 AND 50
      GROUP BY event_type ORDER BY event_type NULLS FIRST"""))

  /** F5/F6/F7: pandas capitalize (NOT initcap), title-case, paren-zip strip. */
  val q26TextFuncs = QueryDef(
    "q26_text_funcs",
    (s, d) => Tables.part(s, d)
      .select(
        TextOps.capitalize(col("p_name")).as("cap_name"),
        TextOps.titleCase(col("p_name")).as("title_name"),
        TextOps.stripParenZip(concat(col("p_name"), lit(" (1234)"))).as("stripped"))
      .distinct()
      .orderBy("cap_name", "title_name"),
    Some("""SELECT DISTINCT
      upper(substr(p_name, 1, 1)) || lower(substr(p_name, 2)) AS cap_name,
      array_to_string(list_transform(string_split(p_name, ' '),
        w -> upper(w[1]) || lower(w[2:])), ' ') AS title_name,
      regexp_replace(p_name || ' (1234)', '\s*\(\d+\)', '', 'g') AS stripped
      FROM part ORDER BY cap_name NULLS FIRST, title_name NULLS FIRST"""))

  /** F1: URL tail extraction (strip trailing slashes, last path segment). */
  val q27UrlTail = QueryDef(
    "q27_url_tail",
    (s, d) => Tables.documents(s, d)
      .withColumn("url",
        concat(lit("https://site.be/cat/"), col("source"), lit("/"), col("doc_id"), lit("/")))
      .withColumn("tail", TextOps.urlTail(col("url")))
      .groupBy("source")
      .agg(countDistinct(col("tail")).as("n_tails"), count(lit(1)).as("n_docs"))
      .orderBy("source"),
    Some("""SELECT source,
      CAST(COUNT(DISTINCT string_split(regexp_replace(
        'https://site.be/cat/' || source || '/' || doc_id || '/', '/+$', ''), '/')[-1]) AS BIGINT) AS n_tails,
      COUNT(*) AS n_docs
      FROM documents GROUP BY source ORDER BY source NULLS FIRST"""))

  /** F4: the 8-branch EPC range bucketing when-chain. */
  val q28EpcBucket = QueryDef(
    "q28_epc_bucket",
    (s, d) => Tables.events(s, d)
      .withColumn("kwh", col("value") * 10 - 100)
      .withColumn("epc",
        when(col("kwh") < 0, "A+").when(col("kwh") < 100, "A")
          .when(col("kwh") < 200, "B").when(col("kwh") < 300, "C")
          .when(col("kwh") < 400, "D").when(col("kwh") < 500, "E")
          .otherwise("F"))
      .groupBy("epc").agg(count(lit(1)).as("cnt"))
      .orderBy("epc"),
    Some("""SELECT (CASE WHEN kwh < 0 THEN 'A+' WHEN kwh < 100 THEN 'A'
        WHEN kwh < 200 THEN 'B' WHEN kwh < 300 THEN 'C' WHEN kwh < 400 THEN 'D'
        WHEN kwh < 500 THEN 'E' ELSE 'F' END) AS epc, COUNT(*) AS cnt
      FROM (SELECT value * 10 - 100 AS kwh FROM events)
      GROUP BY epc ORDER BY epc"""))

  /** F11: try_cast coercion (pd.to_numeric errors='coerce'). */
  val q29TryCast = QueryDef(
    "q29_try_cast",
    (s, d) => Tables.documents(s, d)
      .withColumn("raw",
        when(col("doc_id") % 7 === 0, concat(lit("x"), col("n_chars")))
          .otherwise(col("n_chars").cast("string")))
      .withColumn("parsed", CastOps.toNumericCoerce(col("raw")))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("parsed").isNull.cast("bigint")).as("n_coerce_fail"),
        decSum(col("parsed")).as("sum_parsed")),
    Some("""SELECT COUNT(*) AS n_rows,
      CAST(SUM(CAST(parsed IS NULL AS BIGINT)) AS BIGINT) AS n_coerce_fail,
      CAST(SUM(CAST(parsed AS DECIMAL(28,2))) AS DOUBLE) AS sum_parsed
      FROM (SELECT TRY_CAST(CASE WHEN doc_id % 7 = 0
          THEN 'x' || CAST(n_chars AS VARCHAR)
          ELSE CAST(n_chars AS VARCHAR) END AS DOUBLE) AS parsed FROM documents)"""))

  /** F13/A7: winsorize to [p01, p99] then exact average (two-pass). */
  val q30Winsorize = QueryDef(
    "q30_winsorize",
    (s, d) => {
      val o = Tables.orders(s, d)
      val Array(lo, hi) = o
        .agg(expr("percentile(o_totalprice, array(0.01, 0.99))")).head()
        .getSeq[Double](0).toArray
      o.withColumn("clipped", CastOps.clip(col("o_totalprice"), lo, hi))
        .agg(
          decAvg(col("clipped"), 6).as("avg_clipped"),
          min(col("clipped")).as("min_clipped"),
          max(col("clipped")).as("max_clipped"))
    },
    Some("""WITH b AS (SELECT quantile_cont(o_totalprice, 0.01) AS lo,
        quantile_cont(o_totalprice, 0.99) AS hi FROM orders),
      c AS (SELECT least(greatest(o_totalprice, lo), hi) AS clipped FROM orders, b)
      SELECT CAST(SUM(CAST(clipped AS DECIMAL(28,6))) AS DOUBLE) / COUNT(clipped) AS avg_clipped,
        MIN(clipped) AS min_clipped, MAX(clipped) AS max_clipped FROM c"""))

  /** F18: date part extraction + monthly rollup. */
  val q31DateAgg = QueryDef(
    "q31_date_agg",
    (s, d) => Tables.orders(s, d)
      .groupBy(
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"))
      .agg(count(lit(1)).as("cnt"), decSum(col("o_totalprice")).as("sum_price"))
      .orderBy("y", "m"),
    Some("""SELECT CAST(year(o_orderdate) AS INT) AS y, CAST(month(o_orderdate) AS INT) AS m,
      COUNT(*) AS cnt,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS sum_price
      FROM orders GROUP BY y, m ORDER BY y NULLS FIRST, m NULLS FIRST"""))

  /** F3: JSON parse + null-safe nested access (from_json ≡ json_extract). */
  val q32JsonExtract = QueryDef(
    "q32_json_extract",
    (s, d) => Tables.events(s, d)
      .withColumn("k",
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k BIGINT")).getField("k"))
      .groupBy("event_type")
      .agg(
        (sum(col("k")).cast("double") / count(col("k"))).as("avg_k"),
        count(lit(1)).as("cnt"))
      .orderBy("event_type"),
    Some("""SELECT event_type,
      CAST(SUM(k) AS DOUBLE) / COUNT(k) AS avg_k, COUNT(*) AS cnt
      FROM (SELECT event_type, CAST(json_extract(props, '$.k') AS BIGINT) AS k FROM events)
      GROUP BY event_type ORDER BY event_type NULLS FIRST"""))

  /** §2.8: tumbling 10-minute window aggregate (batch equivalent of the
    * Structured Streaming windowed agg; win_start as epoch seconds). */
  val q33TumblingWindow = QueryDef(
    "q33_tumbling_window",
    (s, d) => Tables.events(s, d)
      .withColumn("win_start",
        window(col("ts"), "600 seconds").getField("start").cast("long"))
      .groupBy("win_start", "event_type")
      .agg(count(lit(1)).as("cnt"), decSum(col("value")).as("sum_value"))
      .orderBy("win_start", "event_type"),
    Some("""SELECT CAST(floor(epoch(ts) / 600) AS BIGINT) * 600 AS win_start,
      event_type, COUNT(*) AS cnt,
      CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS sum_value
      FROM events WHERE ts IS NOT NULL
      GROUP BY win_start, event_type ORDER BY win_start, event_type"""))

  /** F8/F9: the 4-format address assembly cascade + normalization, as data
    * (the join side of the cascade is exercised by q25). */
  val q56AddressAssembly = QueryDef(
    "q56_address_assembly",
    (s, d) => {
      val c = Tables.customer(s, d).filter(col("c_custkey") < 50)
        .withColumn("street", concat(lit("  Main STR. "), col("c_custkey")))
        .withColumn("number", (col("c_custkey") % 30).cast("string"))
        .withColumn("locality", col("c_mktsegment"))
        .withColumn("postal", (lit(1000) + col("c_custkey")).cast("string"))
      val cands = graft.enrich.Geocode.addressCandidates(
        col("street"), col("number"), col("locality"), col("postal"))
      c.select(col("c_custkey").as("id"),
        cands(0).as("addr_full"), cands(1).as("addr_no_number"),
        cands(2).as("addr_locality"), cands(3).as("addr_postal"))
        .orderBy("id")
    },
    Some("""SELECT c_custkey AS id,
      regexp_replace(regexp_replace(lower(trim(
        concat_ws(' ', '  Main STR. ' || c_custkey, CAST(c_custkey % 30 AS VARCHAR),
                  c_mktsegment, CAST(1000 + c_custkey AS VARCHAR)))),
        'str\.', 'straat', 'g'), '\s+', ' ', 'g') AS addr_full,
      regexp_replace(regexp_replace(lower(trim(
        concat_ws(' ', '  Main STR. ' || c_custkey, c_mktsegment,
                  CAST(1000 + c_custkey AS VARCHAR)))),
        'str\.', 'straat', 'g'), '\s+', ' ', 'g') AS addr_no_number,
      regexp_replace(lower(trim(
        concat_ws(' ', c_mktsegment, CAST(1000 + c_custkey AS VARCHAR)))),
        '\s+', ' ', 'g') AS addr_locality,
      CAST(1000 + c_custkey AS VARCHAR) AS addr_postal
      FROM customer WHERE c_custkey < 50 ORDER BY id"""))

  override val defs: Seq[QueryDef] = Seq(
    q10Skewness, q13LengthFilter, q14BetweenFilter, q26TextFuncs, q27UrlTail,
    q28EpcBucket, q29TryCast, q30Winsorize, q31DateAgg, q32JsonExtract,
    q33TumblingWindow, q56AddressAssembly)
}
