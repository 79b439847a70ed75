package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization for web-corpus work — URL-keyed dedup and
  * domain-level statistics are only as good as the key, and raw crawl URLs
  * differ in case, tracking parameters, parameter order, default ports and
  * trailing slashes while naming the same resource.
  *
  * Everything is regex + array Column logic (no UDFs); patterns are
  * RE2-compatible (no backrefs/lookarounds) so external engines reproduce
  * the canonical form bit-for-bit — the DuckDB oracle for q81 runs the same
  * expressions.
  */
object UrlOps {

  /** Tracking parameters dropped during canonicalization (utm_*, click ids). */
  val TrackingParamRe = "^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|ref)="

  /** Canonical form:
    *  - scheme and host lowercased; leading `www.` stripped; the port
    *    stripped only when it is the SCHEME'S default (`:80` for http,
    *    `:443` for https) — `http://h:443` names a real non-default-port
    *    service and must stay distinct;
    *  - path kept case-sensitive (RFC 3986: only scheme+host are
    *    case-insensitive) minus any trailing `/`;
    *  - query string minus tracking params, remaining params sorted for
    *    order-independence (`?b=2&a=1` == `?a=1&b=2`);
    *  - fragment dropped.
    * Null-safe: a null URL canonicalizes to null.
    */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rawHost = lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    val hostNoWww = regexp_replace(rawHost, "^www\\.", "")
    val host = when(scheme === "http", regexp_replace(hostNoWww, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostNoWww, ":443$", ""))
      .otherwise(hostNoWww)
    val path = regexp_replace(
      regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1),
      "/$", "")
    val query = regexp_extract(url, "\\?([^#]*)", 1)
    val keptParams = array_sort(filter(split(query, "&"),
      p => length(p) > 0 && not(p.rlike(TrackingParamRe))))
    val queryPart = when(size(keptParams) > 0,
      concat(lit("?"), array_join(keptParams, "&"))).otherwise(lit(""))
    when(url.isNull, lit(null).cast("string"))
      .otherwise(concat(scheme, lit("://"), host, path, queryPart))
  }

  /** Lowercased host (userinfo and port stripped) of a URL — the key for
    * domain-level stats and blocklists. The scheme is OPTIONAL: crawl URL
    * fields often carry bare `www.example.com/page` forms, and a blocklist
    * that silently passes those is a filter bypass, so the host is whatever
    * precedes the first `/`, `?` or `#` when no `scheme://` prefix is
    * present. The userinfo strip closes the same bypass class:
    * `https://x@blocked.com/p` must resolve to `blocked.com`, not
    * `x@blocked.com` (whose dot-suffixes never equal a blocklist entry);
    * this matches Spark's `parse_url(..., 'HOST')`, which also drops
    * userinfo. The strip is GREEDY through the LAST `@` — WHATWG URL
    * parsing (what browsers and curl fetch) takes the host after the
    * final `@`, so `https://u@x@tracker.net/p` must resolve to
    * `tracker.net`, not `x@tracker.net`.
    */
  def urlHost(url: Column): Column =
    regexp_replace(
      regexp_replace(
        lower(regexp_extract(url, "^(?:[A-Za-z][A-Za-z0-9+.-]*://)?([^/?#]+)", 1)),
        "^[^/?#]*@", ""),
      ":[0-9]+$", "")

  /** Every registrable suffix of a dotted host, most-specific first:
    * `a.b.co` → [`a.b.co`, `b.co`, `co`]. The bounded explode (≤ label
    * count) that turns suffix blocklist matching into an EQUI join.
    */
  def hostSuffixes(host: Column): Column = {
    val labels = split(host, "\\.")
    // slice is evaluated per output element, but labels is O(#labels) tiny
    transform(sequence(lit(1), size(labels)),
      i => array_join(slice(labels, i, size(labels)), "."))
  }

  /** UT1-style URL blocklist filter: a row is blocked when its host OR ANY
    * parent domain appears in the blocklist (`ads.x.com` is blocked by
    * `x.com`). Scale shape: the corpus side explodes into ≤ label-count
    * suffix rows and EQUI-joins the broadcast blocklist — no per-pair
    * LIKE scan, no BNLJ — then a left-semi-derived flag joins back on the
    * caller's key (NOT monotonically_increasing_id, whose values are not
    * stable across the two plan branches under AQE/retries). Returns the
    * input plus a `blocked` flag.
    */
  def blocklistFlags(df: DataFrame, idCol: String, urlCol: Column,
      blocklist: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    // suffix explode ≈ one derived row per ~15 input bytes — the token-ops
    // amplification class; spread an under-partitioned scan first
    // (size-floored, narrow id+url projection)
    val hits = graft.ops.Spread.forAmplification(
        df.select(col(idCol), urlCol.as("__url")), col(idCol))
      .select(col(idCol),
        explode(hostSuffixes(urlHost(col("__url")))).as("__suffix"))
      .join(broadcast(blocklist.select(col(blocklist.columns.head).as("__suffix"))),
        Seq("__suffix"))
      .select(col(idCol)).distinct()
      .withColumn("__blocked", lit(true))
    df.join(hits, Seq(idCol), "left")
      .withColumn("blocked", coalesce(col("__blocked"), lit(false)))
      .drop("__blocked")
  }
}
