package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.canonicalizeUrl

class UrlCanonicalSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("url").select(canonicalizeUrl(col("url"))).as[String]
      .collect().toSeq

  test("surface variants of the same page collapse to one canonical form") {
    val got = canon(
      "HTTPS://WWW.News.Example.COM:443/a/b/?utm_source=x&b=2&a=1#frag",
      "https://news.example.com/a/b?a=1&b=2",
      "https://www.news.example.com/a/b/?b=2&utm_campaign=y&a=1")
    assert(got.distinct == Seq("https://news.example.com/a/b?a=1&b=2"))
  }

  test("each canonicalization rule fires independently") {
    assert(canon("HTTP://Host.Org:80/x") == Seq("http://host.org/x"))
    assert(canon("http://host.org:8080/x") == Seq("http://host.org:8080/x"),
      "non-default port survives")
    assert(canon("https://host.org/x///") == Seq("https://host.org/x"))
    assert(canon("https://host.org/#top") == Seq("https://host.org"))
    assert(canon("https://host.org/p?fbclid=z&gclid=q&utm_x=1") ==
      Seq("https://host.org/p"), "all-tracking query drops the '?'")
    assert(canon("https://host.org/p?z=1&y=2&x=3") ==
      Seq("https://host.org/p?x=3&y=2&z=1"), "params sorted")
  }

  test("distinct pages stay distinct") {
    val got = canon(
      "https://host.org/p?x=1",
      "https://host.org/p?x=2",
      "https://host.org/q?x=1",
      "https://other.org/p?x=1")
    assert(got.distinct.size == 4)
  }

  test("a '?' inside the fragment does not resurrect as a query string") {
    // SPA-style routes: the fragment is dropped, INCLUDING its '?'
    assert(canon("https://host.org/p#/route?tab=1") ==
      Seq("https://host.org/p"))
    // and it must not collide with a real query page
    assert(canon("https://host.org/p#a?x=1", "https://host.org/p?x=1")
      .distinct.size == 2)
  }
}
