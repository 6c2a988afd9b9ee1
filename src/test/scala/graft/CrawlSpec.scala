package graft

import org.apache.spark.sql.functions._

import graft.ext.Crawl

class CrawlSpec extends SparkSpec {
  import spark.implicits._

  // two domains: good.com — 3 distinct pages, long docs;
  // spam.com — 4 docs all collapsing to ONE canonical page
  private def corpus = Seq(
    ("https://good.com/a", "one two three four five six"),
    ("https://good.com/b", "one two three four five six"),
    ("https://WWW.Good.com:443/c/?utm_source=x", "one two three four"),
    ("http://spam.com/p?utm_source=a", "one two three four five"),
    ("http://spam.com/p?utm_source=b", "one two three four five"),
    ("http://spam.com/p/?fbclid=c", "one two three four five"),
    ("http://SPAM.com:80/p", "one two three four five")
  ).toDF("url", "text")

  test("domainStats: counts, distinct canonical pages, token sums") {
    val got = Crawl.domainStats(corpus, col("url"), col("text"),
        minTokensPerDoc = 5L)
      .orderBy("domain")
      .as[(String, Long, Long, Long, Boolean)].collect().toSeq
    assert(got === Seq(
      // 16 tokens / 3 docs >= 5 ✓ and 3 pages * 2 > 3 docs ✓
      ("good.com", 3L, 3L, 16L, true),
      // url variants all canonicalize to http://spam.com/p → 1 page;
      // 1 * 2 > 4 fails even though 20 tokens / 4 docs >= 5 holds
      ("spam.com", 4L, 1L, 20L, false)))
  }

  test("filterByDomain keeps only docs from kept domains") {
    val stats = Crawl.domainStats(corpus, col("url"), col("text"),
      minTokensPerDoc = 5L)
    val kept = Crawl.filterByDomain(corpus, col("url"), stats)
      .select("url").as[String].collect().toSeq
    assert(kept.forall(_.toLowerCase.contains("good.com")))
    assert(kept.size === 3)
  }

  test("token rule is an exact integer cross-multiply at the boundary") {
    val docs = Seq(
      ("http://a.com/1", "w w w w w"),   // 5 tokens
      ("http://a.com/2", "w w w w")      // 4 tokens → mean 4.5 < 5
    ).toDF("url", "text")
    val got = Crawl.domainStats(docs, col("url"), col("text"),
        minTokensPerDoc = 5L)
      .select("kept").as[Boolean].collect().toSeq
    assert(got === Seq(false)) // 9 >= 10 fails — no double rounding
  }
}
