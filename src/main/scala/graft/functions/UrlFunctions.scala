package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for web-crawl corpora — the normalization pass
  * that runs BEFORE url-keyed dedup, so `HTTPS://WWW.Site.com:443/a/`
  * and `https://site.com/a?utm_source=x` collapse to one key. Pure
  * `Column` composition (regexp extracts + a higher-order filter over
  * the query params): codegen-friendly, zero shuffle, and every rule
  * is mirrored 1:1 by the DuckDB oracle.
  *
  * Rules (the conservative, loss-free subset used by crawl dedup):
  * scheme and host lowercase; `www.` prefix dropped; default ports
  * (`:80` http, `:443` https) dropped; fragment dropped; tracking
  * params (`utm_*`, `gclid`, `fbclid`, `ref`) dropped with the
  * remaining params kept IN ORDER (re-sorting would merge
  * `?a=1&b=2`-vs-`?b=2&a=1` — deliberately out of scope, order can be
  * semantic); trailing slashes trimmed. Path case is preserved (paths
  * are case-sensitive by spec).
  */
object UrlFunctions {

  /** The tracking-param pattern, shared with the oracle SQL. */
  val TrackingPattern = "^(utm_[^=]*|gclid|fbclid|ref)="

  private def noFragment(url: Column): Column =
    regexp_replace(url, "#.*$", "")

  /** Lowercased scheme, empty string when the URL has none. */
  def urlScheme(url: Column): Column =
    lower(regexp_extract(noFragment(url), "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))

  /** Lowercased host with `www.` and default ports stripped. */
  def urlDomain(url: Column): Column = {
    val hostport = lower(regexp_extract(noFragment(url),
      "^[^:/?#]+://([^/?#]*)", 1))
    val noWww = regexp_replace(hostport, "^www\\.", "")
    when(urlScheme(url) === "http", regexp_replace(noWww, ":80$", ""))
      .when(urlScheme(url) === "https", regexp_replace(noWww, ":443$", ""))
      .otherwise(noWww)
  }

  /** Canonical form per the rules above. */
  def canonicalizeUrl(url: Column): Column = {
    val u = noFragment(url)
    val path = regexp_replace(
      regexp_extract(u, "^[^:/?#]+://[^/?#]*([^?#]*)", 1), "/+$", "")
    val query = regexp_extract(u, "\\?([^#]*)", 1)
    val kept = filter(split(query, "&"),
      p => !p.rlike(TrackingPattern) && p =!= "")
    val qstr = array_join(kept, "&")
    concat(urlScheme(url), lit("://"), urlDomain(url), path,
      when(qstr =!= "", concat(lit("?"), qstr)).otherwise(lit("")))
  }
}
