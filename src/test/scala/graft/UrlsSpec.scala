package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.Urls

class UrlsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def canon(urls: String*): Seq[Option[String]] =
    urls.toSeq.toDF("u")
      .select(Urls.canonicalizeUrl($"u"))
      .collect().map(r => Option(r.getString(0))).toSeq

  test("canonicalizeUrl: case, default port, www, slash, fragment, tracking params, param order") {
    assert(canon("HTTPS://WWW.Example.COM:443/a/b/?id=2&utm_source=x&a=1#frag")
      == Seq(Some("https://example.com/a/b?a=1&id=2")))
    // default port stripped only for the matching scheme
    assert(canon("http://example.com:80", "https://example.com:80/x")
      == Seq(Some("http://example.com"), Some("https://example.com:80/x")))
    // non-default ports survive
    assert(canon("http://example.com:8080/x/")
      == Seq(Some("http://example.com:8080/x")))
    // repeated trailing slashes all stripped; root path collapses
    assert(canon("https://www.x.co.uk/p//", "https://x.co.uk/")
      == Seq(Some("https://x.co.uk/p"), Some("https://x.co.uk")))
    // query sorted bytewise; empty params dropped; '?' omitted if none survive
    assert(canon("http://h/p?b=2&a=1&&", "http://h/p?utm_source=a&gclid")
      == Seq(Some("http://h/p?a=1&b=2"), Some("http://h/p")))
    // utm_ is a PREFIX rule on the name only: bare 'utm' and 'gclidx' are
    // ordinary params, 'utm_x' and valueless 'gclid'/'fbclid' are tracking
    assert(canon("http://h?utm=1&gclidx=2&utm_x&fbclid=9")
      == Seq(Some("http://h?gclidx=2&utm=1")))
    // query can start straight after the authority
    assert(canon("http://Host?b=2&a=1") == Seq(Some("http://host?a=1&b=2")))
    // non-URL input surfaces as NULL, never a guessed canonical form
    assert(canon("junk line, not a url", "://nohost", "relative/path")
      == Seq(None, None, None))
  }

  test("registrableDomain: public-suffix-lite two-level suffixes, short hosts unchanged") {
    val got = Seq("a.b.example.co.uk", "sub.example.com", "example.com",
        "localhost", "x.io", "deep.shop.com.au", "co.uk")
      .toDF("h").select(Urls.registrableDomain($"h"))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("example.co.uk", "example.com", "example.com",
      "localhost", "x.io", "shop.com.au", "co.uk"))
  }

  test("domainDedupCensus: variants collapse per registrable domain; junk lands in (invalid)") {
    val urls = Seq(
      "https://www.shop.co.uk/a?utm_source=x&id=1",
      "HTTPS://shop.co.uk:443/a/?id=1",          // same canonical as above
      "https://shop.co.uk/a?id=2",               // same domain, new canonical
      "http://other.com/z",
      "not a url at all")
    val out = Urls.domainDedupCensus(urls.toDF("u"), $"u")
      .orderBy("domain")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(out == Seq(
      ("(invalid)", 1L, 0L, 1L),
      ("other.com", 1L, 1L, 0L),
      ("shop.co.uk", 3L, 2L, 1L)))
  }
}
