package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the crawl-side identity step that runs BEFORE
  * any content dedup: the same page is fetched as `HTTP://WWW.Site.com:80/
  * a/?utm_source=feed&id=3` and `http://site.com/a?id=3`, and a corpus
  * that treats those as two documents double-counts every boilerplate
  * metric and defeats URL-level dedup entirely. New scope beyond the
  * reference (its pipeline starts from already-keyed trip records).
  *
  * Rules (the standard safe-normalization subset — each one is a pure
  * function of the URL string, so the whole step is a narrow codegen'd
  * map with no shuffle and no network):
  *   - scheme and host lowercased; a leading `www.` stripped
  *   - default ports dropped (`:80` for http, `:443` for https);
  *     non-default ports kept
  *   - trailing `/` stripped from non-root paths; empty path → `/`
  *   - tracking parameters removed (`utm_*` prefix — the deterministic,
  *     auditable subset; extend the prefix list per deployment)
  *   - surviving query parameters sorted (param order is transport
  *     noise), query dropped entirely when nothing survives
  *   - fragment dropped (never sent to the server)
  *
  * Built on `parse_url` (Spark's codegen'd URL part extractor), so
  * malformed URLs surface as nulls rather than exceptions — callers
  * filter `canonical IS NOT NULL` to quarantine junk rows.
  */
object Urls {

  /** Lowercased host with any leading `www.` stripped, port and userinfo
    * excluded. Null for unparseable URLs. (IPv6 bracket hosts are out of
    * scope for the port split — crawl corpora key on registered names;
    * a bracketed authority passes through with its brackets, still
    * deterministic.)
    */
  def canonicalHost(url: Column): Column =
    regexp_replace(
      element_at(split(stripUserinfo(
        lower(parse_url(url, lit("AUTHORITY")))), ":"), 1),
      "^www\\.", "")

  /** `user:pass@host` → `host`: crawl pipelines drop credentials — they
    * are fetch transport, never page identity (and a corpus must not
    * persist them).
    */
  private def stripUserinfo(auth: Column): Column =
    regexp_replace(auth, "^[^@]*@", "")

  /** Common second-level public suffixes for [[registeredDomain]]. An
    * offline, documented HEURISTIC subset of the public-suffix list —
    * the full list is data, not code, and slots in as a config column
    * without changing the expression shape. Covering the high-traffic
    * ccTLD conventions is what keeps `sub.host.co.uk` from collapsing
    * into the meaningless group `co.uk`.
    */
  private[operators] val MultiLabelSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au", "com.br", "co.in", "com.cn",
    "com.mx", "com.ar", "co.za", "co.kr", "com.tr", "co.nz", "com.sg")

  /** Registered domain (eTLD+1) of a host — the aggregation key
    * per-domain caps and per-domain quality stats actually want:
    * `cdn.img.site.co.uk` and `www.site.co.uk` are ONE publisher, and
    * capping on full host would let a subdomain farm evade the cap.
    * Last two labels, or three when the last two are a known multi-label
    * public suffix ([[MultiLabelSuffixes]]). Hosts with ≤ 2 labels (and
    * bare/IP-ish names) pass through unchanged. Pure codegen'd column
    * expression — no UDF, no shuffle.
    */
  def registeredDomain(host: Column): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    val last2 = concat_ws(".", element_at(labels, -2), element_at(labels, -1))
    when(n <= 2, host)
      .when(array_contains(typedLit(MultiLabelSuffixes), last2),
        concat_ws(".", element_at(labels, -3), last2))
      .otherwise(last2)
  }

  /** The canonical URL string under the rules above. Null when the URL
    * has no parseable scheme/authority.
    */
  def canonicalize(url: Column): Column = {
    val proto = lower(parse_url(url, lit("PROTOCOL")))
    // AUTHORITY = host[:port]; split rather than HOST so the port rule
    // sees what was actually written
    val auth = stripUserinfo(lower(parse_url(url, lit("AUTHORITY"))))
    val authParts = split(auth, ":")
    val host = regexp_replace(element_at(authParts, 1), "^www\\.", "")
    val portStr = when(size(authParts) > 1, element_at(authParts, 2))
    val defaultPort = when(proto === "http", "80")
      .when(proto === "https", "443")
    val port = when(portStr.isNull || portStr === defaultPort, lit(""))
      .otherwise(concat(lit(":"), portStr))
    val rawPath = parse_url(url, lit("PATH"))
    val path = when(rawPath.isNull || rawPath === "", lit("/"))
      .otherwise(
        when(regexp_replace(rawPath, "/+$", "") === "", lit("/"))
          .otherwise(regexp_replace(rawPath, "/+$", "")))
    val rawQuery = parse_url(url, lit("QUERY")) // fragment already excluded
    val kept = array_sort(filter(split(rawQuery, "&"),
      p => !p.startsWith("utm_") && p =!= ""))
    val query = when(rawQuery.isNull || size(kept) === 0, lit(""))
      .otherwise(concat(lit("?"), array_join(kept, "&")))
    when(proto.isNull || host.isNull, lit(null).cast("string"))
      .otherwise(concat(proto, lit("://"), host, port, path, query))
  }
}
