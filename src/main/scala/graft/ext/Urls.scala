package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + registrable-domain extraction — the
  * normalization a crawl corpus needs BEFORE any per-domain operation
  * makes sense: the C4/RefinedWeb domain quota ([[Sampling
  * .capPerGroupAgg]], q123) caps "pages per domain", which only works
  * once `HTTPS://WWW.Site.COM:443/a?utm_source=x&b=2&a=1#f` and
  * `https://www.site.com/a?a=1&b=2` count as the same page of the same
  * registrable domain.
  *
  * Everything here is composed built-in expressions (regexp extracts +
  * array ops — map-side, codegen'd, zero shuffle), written to evaluate
  * identically in Java regex and RE2 so SQL oracles replay the exact
  * pipeline. Canonicalization (scheme http/https only):
  *
  *  - scheme and host lowercased; trailing host dots stripped;
  *    userinfo (`user:pass@`) removed;
  *  - default ports (http:80, https:443) dropped, others kept;
  *  - empty path → `/` (path case is PRESERVED — paths are
  *    case-sensitive, hosts are not);
  *  - query params: tracking params (`utm_*`, `fbclid`, `gclid`)
  *    dropped, the rest SORTED bytewise and re-joined (param order is
  *    transport noise; sorting makes the canonical form unique);
  *  - fragment dropped (never sent to the server).
  *
  * Registrable domain: last two host labels, or last three when the
  * last two are a well-known multi-part public suffix (co.uk, com.au,
  * co.jp, ...). The embedded suffix list is the ~30 highest-traffic
  * multi-part entries of the public-suffix list, not the full PSL — at
  * 100 TB the full list rides the same `isin`/broadcast shape, so
  * swapping it in changes no plan. IPv4 / bracketed IPv6 hosts are
  * their own "domain".
  */
object Urls {

  /** The ~30 highest-traffic multi-part public suffixes (PSL subset —
    * see object doc for the swap-in path). */
  val MultiPartSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "net.uk",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.nz", "com.br", "com.cn", "com.mx", "com.ar", "com.tr",
    "co.in", "co.kr", "co.za", "com.sg", "com.hk", "com.tw")

  private val SchemeRe = "^([A-Za-z][A-Za-z0-9+.\\-]*)://"

  private def schemeOf(url: Column): Column =
    lower(regexp_extract(url, SchemeRe, 1))

  /** host:port of the authority, userinfo stripped (suffix after the
    * last `@` — no match can start before it and still reach `$`, so
    * first-match semantics agree between Java regex and RE2). */
  private def hostportOf(url: Column): Column =
    regexp_extract(
      regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.\\-]*://([^/?#]*)", 1),
      "([^@]*)$", 1)

  /** Lowercased host with trailing dots stripped; bracketed IPv6
    * literals pass through whole (the `^[^:]*` port split would mangle
    * their colons). Empty string when the URL has no http(s) authority.
    */
  def hostOf(url: Column): Column = {
    val hp = hostportOf(url)
    val h = when(hp.startsWith("["),
        lower(regexp_extract(hp, "^(\\[[^\\]]*\\])", 1)))
      .otherwise(lower(regexp_extract(hp, "^([^:]*)", 1)))
    regexp_replace(h, "\\.+$", "")
  }

  /** Canonical URL per the object doc; null for anything that is not
    * an http(s) URL with a non-empty host. */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = schemeOf(url)
    val host = hostOf(url)
    val port = regexp_extract(hostportOf(url), ":([0-9]+)$", 1)
    val defPort = when(scheme === "http", lit("80"))
      .when(scheme === "https", lit("443")).otherwise(lit(""))
    val portSuffix = when(port === "" || port === defPort, lit(""))
      .otherwise(concat(lit(":"), port))
    val rawPath =
      regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.\\-]*://[^/?#]*([^?#]*)", 1)
    val path = when(rawPath === "", lit("/")).otherwise(rawPath)
    // first '?' before any '#' opens the query; fragment never kept
    val q = regexp_extract(url, "^[^#?]*\\?([^#]*)", 1)
    val params = filter(split(q, "&"), p =>
      p =!= "" && !p.rlike("^(utm_[^=]*|fbclid|gclid)(=|$)"))
    val sortedQ = array_join(array_sort(params), "&")
    val qSuffix = when(sortedQ === "", lit(""))
      .otherwise(concat(lit("?"), sortedQ))
    when(scheme.isin("http", "https") && host =!= "",
      concat(scheme, lit("://"), host, portSuffix, path, qSuffix))
  }

  /** Registrable domain of a (already-canonical) host column: last two
    * labels, last three over a multi-part suffix; IP literals and
    * single-label hosts pass through. Null host → null. */
  def registrableDomain(host: Column): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    // element_at is guarded by the size conditions (CASE branches only
    // evaluate when taken — ANSI element_at would throw on short hosts)
    val last2 = when(n >= 2,
      concat_ws(".", element_at(labels, -2), element_at(labels, -1)))
    val last3 = when(n >= 3,
      concat_ws(".", element_at(labels, -3), element_at(labels, -2),
        element_at(labels, -1)))
    when(host.rlike("^[0-9]+(\\.[0-9]+){3}$") || host.startsWith("["), host)
      .when(n >= 3 && last2.isin(MultiPartSuffixes: _*), last3)
      .when(n >= 2, last2)
      .otherwise(host)
  }

  /** Outbound links of an HTML column: one row per double-quoted
    * `href="..."` attribute value (case-insensitive attribute name,
    * whitespace around `=` tolerated via the explicit
    * `[ \t\n\f\r]` class — never Java `\s`, which RE2 disagrees with
    * on U+000B), appended as `as` with every input column preserved.
    * Values come out RAW — mailto/relative/javascript hrefs included;
    * feed them to [[canonicalizeUrl]], whose null-for-non-http(s)
    * contract drops them at the next filter. A null HTML value or a
    * page with no links contributes no rows (explode semantics) —
    * link EDGES are the deliverable, not page verdicts.
    *
    * Map-side explode over a codegen'd regex — zero shuffle; the
    * per-domain edge aggregation downstream is the first exchange.
    */
  def htmlOutlinks(df: DataFrame, htmlCol: String,
                   as: String = "href"): DataFrame =
    df.withColumn(as, explode(regexp_extract_all(col(htmlCol),
      lit("(?i)href[ \t\n\f\r]*=[ \t\n\f\r]*\"([^\"]*)\""), lit(1))))

  /** Convenience: append canonical_url / host / domain to `df`; host
    * and domain are null (not '') for non-http(s) rows so downstream
    * group-bys see missing, never a phantom '' domain. */
  def withUrlParts(df: DataFrame, urlCol: String): DataFrame = {
    val canonical = canonicalizeUrl(col(urlCol))
    val host = when(canonical.isNotNull, hostOf(col(urlCol)))
    df.withColumn("canonical_url", canonical)
      .withColumn("host", host)
      .withColumn("domain", registrableDomain(host))
  }
}
