package graft

import org.apache.spark.sql.functions._
import graft.operators.Url

/** URL normalization / domain extraction edge cases. */
class UrlSpec extends SparkSpec {
  import spark.implicits._

  private def norm(u: String): String =
    Seq(u).toDF("u").select(Url.normalize(col("u"))).as[String].head

  test("normalize lowercases scheme+host, keeps path/query case") {
    assert(norm("HTTP://Example.COM/Path/File?Q=Abc") ==
      "http://example.com/Path/File?Q=Abc")
  }

  test("normalize strips default ports but keeps explicit ones") {
    assert(norm("http://a.com:80/x") == "http://a.com/x")
    assert(norm("https://a.com:443/x") == "https://a.com/x")
    assert(norm("http://a.com:8080/x") == "http://a.com:8080/x")
    assert(norm("https://a.com:80/x") == "https://a.com:80/x") // not https default
  }

  test("normalize strips fragments and tracking params, keeps the rest in order") {
    assert(norm("https://a.com/p?utm_source=x&id=1&gclid=2&b=3#frag") ==
      "https://a.com/p?id=1&b=3")
    // all params tracking → no '?' at all
    assert(norm("https://a.com/p?utm_a=1&utm_b=2") == "https://a.com/p")
    // empty params collapse
    assert(norm("https://a.com/p?&&a=1&") == "https://a.com/p?a=1")
  }

  test("normalize collapses a bare '/' path and leaves deeper paths alone") {
    assert(norm("https://A.com/") == "https://a.com")
    assert(norm("https://a.com/x/") == "https://a.com/x/")
  }

  test("blocklistFilter: suffix blocks subdomains, exact host blocks one, labels don't substring-match") {
    val docs = Seq(
      (1L, "ads.tracker.net"),      // blocked by suffix tracker.net
      (2L, "sub.ads.tracker.net"),  // deeper subdomain, also blocked
      (3L, "nottracker.net"),       // label-wise: NOT blocked by tracker.net
      (4L, "exact.host.org"),       // blocked by exact-host entry
      (5L, "keep.host.org"),        // sibling of the exact host survives
      (6L, "clean.example.com")
    ).toDF("doc_id", "host")
    val bl = Seq("tracker.net", "exact.host.org").toDF("suffix")
    val kept = Url.blocklistFilter(docs, "doc_id", "host", bl)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(3L, 5L, 6L), s"kept=$kept")
    // blocklist hygiene: mixed case + padding in the list still matches
    val messy = Seq("  Tracker.NET  ").toDF("suffix")
    val kept2 = Url.blocklistFilter(docs, "doc_id", "host", messy)
      .select("doc_id").as[Long].collect().toSet
    assert(kept2 == Set(3L, 4L, 5L, 6L))
  }

  test("host / registrableDomain / tld") {
    val df = Seq("https://WWW.News.Example.co:8443/x?a=1",
      "http://localhost/x").toDF("u")
    val rows = df.select(Url.host(col("u")), Url.registrableDomain(col("u")),
      Url.tld(col("u"))).as[(String, String, String)].collect()
    assert(rows(0) == (("www.news.example.co", "example.co", "co")))
    assert(rows(1) == (("localhost", "localhost", "localhost")))
  }
}
