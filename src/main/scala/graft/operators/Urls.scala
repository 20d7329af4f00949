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
  *   - userinfo dropped (credentials are fetch transport, never page
  *     identity — and a corpus must not persist them)
  *   - default ports dropped (`:80` for http, `:443` for https, compared
  *     NUMERICALLY so `:080` and `:80` are one identity); non-default
  *     ports kept in canonical integer form
  *   - trailing `/` stripped from non-root paths; empty path → `/`
  *   - tracking parameters removed (`utm_*` prefix — the deterministic,
  *     auditable subset; extend the prefix list per deployment)
  *   - surviving query parameters sorted (param order is transport
  *     noise), query dropped entirely when nothing survives
  *   - fragment dropped (never sent to the server)
  *
  * Built on `parse_url` (Spark's codegen'd URL part extractor), so
  * malformed URLs surface as nulls rather than exceptions — callers
  * filter `canonical IS NOT NULL` to quarantine junk rows. Quarantined
  * (null) shapes beyond parse failures: empty hosts (`https://www./x`),
  * non-numeric ports, and IPv6 bracket authorities (crawl corpora key on
  * registered names; a literal-IP URL is junk-binned, never silently
  * merged with other IPs under a mangled host).
  */
object Urls {

  /** `user:pass@host` → `host`. Greedy to the LAST `@` (RFC 3986:
    * userinfo ends at the final `@`), so a raw `@` inside a password
    * cannot leave credential residue in the host.
    */
  private def stripUserinfo(auth: Column): Column =
    regexp_replace(auth, "^.*@", "")

  /** Lowercased `host[:port]` with userinfo removed — the shared
    * authority derivation for [[canonicalHost]] and [[canonicalize]],
    * factored so a host rule can never apply to one and not the other.
    * Null for unparseable URLs and for IPv6 bracket authorities (the
    * `:`-split port rule cannot see brackets; quarantine beats a
    * mangled `[` host).
    */
  private def cleanAuth(url: Column): Column = {
    val auth = stripUserinfo(lower(parse_url(url, lit("AUTHORITY"))))
    when(auth.contains("["), lit(null).cast("string")).otherwise(auth)
  }

  /** Host from a [[cleanAuth]] authority: port dropped, leading `www.`
    * stripped. Empty hosts normalize to null (quarantine).
    */
  private def hostOf(auth: Column): Column = {
    val h = regexp_replace(
      element_at(split(auth, ":"), 1), "^www\\.", "")
    when(h === "", lit(null).cast("string")).otherwise(h)
  }

  /** Lowercased host with any leading `www.` stripped, port and userinfo
    * excluded. Null for unparseable URLs, empty hosts, and IPv6 bracket
    * authorities.
    */
  def canonicalHost(url: Column): Column = hostOf(cleanAuth(url))

  /** The canonical URL string under the rules above. Null when the URL
    * has no parseable scheme/authority, or the authority is quarantined
    * (empty host, bracket authority, non-numeric port).
    */
  def canonicalize(url: Column): Column = {
    val proto = lower(parse_url(url, lit("PROTOCOL")))
    val auth = cleanAuth(url)
    val authParts = split(auth, ":")
    val host = hostOf(auth)
    // numeric port: ":080" and ":80" are the same transport endpoint
    val portNum = when(size(authParts) > 1,
      element_at(authParts, 2).cast("int"))
    val malformedPort = size(authParts) > 1 && portNum.isNull
    val defaultPort = when(proto === "http", 80)
      .when(proto === "https", 443)
    val port = when(portNum.isNull || portNum === defaultPort, lit(""))
      .otherwise(concat(lit(":"), portNum.cast("string")))
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
    when(proto.isNull || host.isNull || malformedPort,
        lit(null).cast("string"))
      .otherwise(concat(proto, lit("://"), host, port, path, query))
  }

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
    * public suffix ([[MultiLabelSuffixes]]). The host is lowercased
    * first (the suffix match must not depend on the caller having
    * canonicalized), hosts with ≤ 2 labels pass through (lowercased),
    * and null propagates as null so junk rows stay quarantined instead
    * of aggregating under an empty-string domain. Pure codegen'd column
    * expression — no UDF, no shuffle.
    */
  def registeredDomain(host: Column): Column = {
    val h = lower(host)
    val labels = split(h, "\\.")
    val n = size(labels)
    val last2 = concat_ws(".", element_at(labels, -2), element_at(labels, -1))
    when(host.isNull, lit(null).cast("string"))
      .when(n <= 2, h)
      .when(array_contains(typedLit(MultiLabelSuffixes), last2),
        concat_ws(".", element_at(labels, -3), last2))
      .otherwise(last2)
  }
}
