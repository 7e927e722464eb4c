package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Urls

/** URL normalization / registered-domain edge cases beyond the t17
  * fixture's shapes (that fixture is oracle-gated; this is the local
  * truth for the garbage classes a crawl URL column actually has). */
class UrlsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def run(urls: Seq[String]): Seq[(String, String, String)] =
    urls.toDF("url").select(
        Urls.urlNormalize(col("url")).as("n"),
        Urls.urlHost(col("url")).as("h"),
        Urls.urlRegisteredDomain(col("url")).as("d"))
      .as[(Option[String], String, Option[String])].collect().toSeq
      .map(t => (t._1.orNull, t._2, t._3.orNull))

  test("normalization: case, ports, userinfo, fragments, empty path") {
    assert(run(Seq("HTTP://User@Example.COM:80/A/B?q=1#f")).head ==
      (("http://example.com/A/B?q=1", "example.com", "example.com")))
    assert(run(Seq("https://example.com:443")).head._1 ==
      "https://example.com/")
    assert(run(Seq("https://example.com:8443/x")).head._1 ==
      "https://example.com:8443/x")
    // Path case/encoding preserved byte-for-byte (dedup must not
    // merge distinct resources).
    assert(run(Seq("http://a.com/%7Euser/Page")).head._1 ==
      "http://a.com/%7Euser/Page")
  }

  test("garbage classes: not absolute, suffix-only host, single label") {
    val r = run(Seq("not a url", "/relative/path", "mailto:x@y.z",
      "http://co.uk/x", "http://localhost/x"))
    assert(r(0)._1 == null && r(0)._2 == "" && r(0)._3 == null)
    assert(r(1)._1 == null)
    assert(r(2)._1 == null) // no ://
    assert(r(3)._1 == "http://co.uk/x" && r(3)._3 == null) // IS a suffix
    assert(r(4)._3 == null) // single label, no registrable domain
  }

  test("bracketed IPv6 hosts: colons inside brackets are not ports") {
    val r = run(Seq("http://[2001:db8::1]/x", "http://[::1]:8080/y",
      "HTTPS://[2001:DB8::1]:443/z"))
    assert(r(0) == (("http://[2001:db8::1]/x", "[2001:db8::1]", null)))
    assert(r(1) == (("http://[::1]:8080/y", "[::1]", null)))
    assert(r(2) == (("https://[2001:db8::1]/z", "[2001:db8::1]", null)))
  }

  test("registered domain: longest rule wins; unknown TLD falls back to two labels") {
    val r = run(Seq("http://a.b.example.co.uk/", "http://x.blogspot.com/",
      "http://deep.sub.example.zz/", "http://example.zz/"))
    assert(r(0)._3 == "example.co.uk")
    assert(r(1)._3 == "x.blogspot.com") // private registry rule
    assert(r(2)._3 == "example.zz") // fallback: last two labels
    assert(r(3)._3 == "example.zz")
  }
}
