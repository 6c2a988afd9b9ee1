package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class UrlFunctionsSpec extends SparkSpec {
  import spark.implicits._
  import graft.functions.{UrlFunctions => U}

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u").select(U.canonicalizeUrl(col("u"))).as[String]
      .collect().toSeq

  private def domain(urls: String*): Seq[String] =
    urls.toDF("u").select(U.urlDomain(col("u"))).as[String]
      .collect().toSeq

  test("scheme and host lowercase, www and default port dropped") {
    assert(canon("HTTPS://WWW.Example.COM:443/A/b") ===
      Seq("https://example.com/A/b"))
    assert(canon("HTTP://Example.com:80/x") === Seq("http://example.com/x"))
  }

  test("non-default ports and unknown schemes keep their port") {
    assert(domain("https://example.com:8443/x") === Seq("example.com:8443"))
    assert(domain("ftp://example.com:80/x") === Seq("example.com:80"))
  }

  test("path case preserved, trailing slashes trimmed") {
    assert(canon("http://a.com/Docs/Page///") === Seq("http://a.com/Docs/Page"))
    assert(canon("http://a.com/") === Seq("http://a.com"))
  }

  test("tracking params dropped, survivor order preserved") {
    assert(canon("http://a.com/p?utm_source=x&b=2&fbclid=y&a=1") ===
      Seq("http://a.com/p?b=2&a=1"))
    assert(canon("http://a.com/p?utm_campaign=c&gclid=g&ref=r") ===
      Seq("http://a.com/p"))
    // ref must match as a whole key: refresh=1 survives
    assert(canon("http://a.com/p?refresh=1") === Seq("http://a.com/p?refresh=1"))
  }

  test("fragment dropped even when it hides a fake query") {
    assert(canon("http://a.com/p?a=1#frag?utm_source=x") ===
      Seq("http://a.com/p?a=1"))
  }

  test("the crawl-dedup collapse: variants map to one key") {
    val variants = Seq(
      "HTTPS://WWW.Site.com:443/a/?utm_source=x",
      "https://site.com/a",
      "https://Site.COM/a/#top")
    assert(canon(variants: _*).distinct === Seq("https://site.com/a"))
  }
}
