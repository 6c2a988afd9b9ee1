package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions, UrlFunctions}

/** [EXT] Domain-level crawl curation — the filter stage that runs on
  * URL-keyed corpora BEFORE document-level quality scoring: a domain
  * serving mostly duplicate pages, or mostly near-empty pages, is
  * dropped wholesale (the C4/Gopher "bad domain" rule generalized).
  *
  * Every statistic is integer-exact (counts and sums of BIGINT token
  * counts; the keep rule is an integer cross-multiplication, never a
  * double mean), so the DuckDB differential is bit-exact with no
  * rounding discipline.
  *
  * Scale shape: one hash shuffle on domain. `count(DISTINCT canon)`
  * plans as the standard two-phase distinct aggregate — map-side
  * dedup on (domain, canon_url) first, so a domain serving one page a
  * billion times collapses BEFORE the exchange. A domain with a
  * billion *distinct* pages still aggregates; only its distinct page
  * keys cross the wire. No driver-side state.
  */
object Crawl {

  /** Per-domain stats over a URL-keyed corpus: document count,
    * distinct canonical pages ([[UrlFunctions.canonicalizeUrl]], so
    * tracking-param/www/port variants of one page count once),
    * total whitespace tokens, and the keep rule:
    * mean tokens/doc >= `minTokensPerDoc` (as an exact integer
    * cross-multiply) AND more than half the docs are distinct pages.
    */
  def domainStats(docs: DataFrame, url: Column, text: Column,
      minTokensPerDoc: Long = 50L): DataFrame =
    docs.select(
        UrlFunctions.urlDomain(url).as("domain"),
        UrlFunctions.canonicalizeUrl(url).as("canon_url"),
        TextFunctions.wsTokenCount(text).as("n_toks"))
      .groupBy("domain")
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("canon_url")).as("n_pages"),
        sum(col("n_toks")).as("sum_tokens"))
      .withColumn("kept",
        col("sum_tokens") >= lit(minTokensPerDoc) * col("n_docs") &&
          col("n_pages") * 2 > col("n_docs"))

  /** The corpus filtered by [[domainStats]]' verdict: docs from
    * dropped domains are removed in one pass. The stats side is
    * domain-cardinality, so the join back broadcasts. */
  def filterByDomain(docs: DataFrame, url: Column,
      stats: DataFrame): DataFrame =
    docs.join(
      broadcast(stats.where(col("kept")).select("domain")),
      UrlFunctions.urlDomain(url) === col("domain"),
      "left_semi")
}
