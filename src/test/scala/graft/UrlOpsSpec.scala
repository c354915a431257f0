package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ext.UrlOps

class UrlOpsSpec extends SparkSpec {
  import spark.implicits._

  private def hostOf(url: String): String =
    Seq(url).toDF("u").select(UrlOps.host($"u")).as[String].head()

  private def domainOf(h: String): String =
    Seq(h).toDF("h").select(UrlOps.registeredDomain($"h")).as[String].head()

  test("host: scheme, userinfo, port, path, query, fragment, case") {
    assert(hostOf("https://Example.COM/path?q=1#f") == "example.com")
    assert(hostOf("http://user:pw@a.b.org:8080/x") == "a.b.org")
    assert(hostOf("ftp://files.example.net") == "files.example.net")
    assert(hostOf("not a url") == "")
    assert(hostOf("relative/path/only") == "")
  }

  test("registeredDomain: plain, subdomain, multi-part suffix, short host") {
    assert(domainOf("example.com") == "example.com")
    assert(domainOf("www.example.com") == "example.com")
    assert(domainOf("a.b.c.example.com") == "example.com")
    assert(domainOf("foo.co.uk") == "foo.co.uk")
    assert(domainOf("www.foo.co.uk") == "foo.co.uk")
    assert(domainOf("localhost") == "localhost")
  }

  test("blocklist: DataFrame overload equals the Seq overload, subdomain-blind") {
    val df = Seq(
      (1L, "https://www.bad.com/x"), (2L, "https://bad.com/y"),
      (3L, "https://good.com/z"), (4L, "https://bad.co.uk/w"))
      .toDF("id", "url")
    val parts = UrlOps.withUrlParts(df, "url")
    val bySeq = UrlOps.filterBlockedDomains(parts, "domain", Seq("bad.com"))
    val byDf = UrlOps.filterBlockedDomains(parts, "domain",
      Seq("bad.com").toDF("d"))
    assert(bySeq.select("id").as[Long].collect().sorted.toSeq == Seq(3L, 4L))
    assert(rows(bySeq.orderBy("id")) == rows(byDf.orderBy("id")))
  }

  test("capPerDomain equals the single-window plan (salt-invariant)") {
    val docs = sf("documents")
    val parts = UrlOps.withUrlParts(
      docs.withColumn("url",
        concat(lit("https://"),
          when($"doc_id" % 2 === 0, lit("www.")).otherwise(lit("")),
          $"source", lit(".com/d/"), $"doc_id".cast("string"))), "url")
    val plain = parts
      .withColumn("__r__", row_number().over(
        Window.partitionBy($"domain").orderBy($"doc_id")))
      .filter($"__r__" <= 3).drop("__r__")
    for (salt <- Seq(1, 4, 16)) {
      val capped = UrlOps.capPerDomain(parts, "domain", "doc_id", 3, salt)
      assert(rows(capped.orderBy("doc_id")) == rows(plain.orderBy("doc_id")),
        s"salt=$salt diverged from the single-window result")
    }
  }

  test("capPerDomain keeps the cap smallest ids per domain") {
    val df = (1L to 50L).map(i => (i, s"d${i % 3}")).toDF("id", "dom")
    val kept = UrlOps.capPerDomain(df, "dom", "id", 4)
    assert(kept.count() == 12)
    val d0 = kept.filter($"dom" === "d0").select("id").as[Long]
      .collect().sorted.toSeq
    assert(d0 == Seq(3L, 6L, 9L, 12L))
  }

  test("canonicalize: case, ports, tracking params, fragment, path") {
    val cases = Seq(
      // scheme+host lowercased, default https port stripped, fragment cut
      "HTTPS://WWW.Example.COM:443/A/B#frag" -> "https://www.example.com/A/B",
      // non-default port survives
      "http://example.com:8080/x" -> "http://example.com:8080/x",
      // default http port stripped
      "http://example.com:80/x" -> "http://example.com/x",
      // tracking params dropped, survivors sorted, path case kept
      "http://Example.com/Path?utm_source=f&b=2&a=1&fbclid=z" ->
        "http://example.com/Path?a=1&b=2",
      // all params tracking → '?' disappears
      "http://e.com/p?utm_campaign=x&gclid=1" -> "http://e.com/p",
      // empty path → '/', trailing slash runs stripped
      "http://e.com" -> "http://e.com/",
      "http://e.com///" -> "http://e.com/",
      "http://e.com/a///" -> "http://e.com/a",
      // userinfo is not part of the host extraction
      "http://user:pw@e.com/x" -> "http://e.com/x",
      // non-URL passes through trimmed, unchanged
      "  not a url  " -> "not a url",
      "mailto:joe" -> "mailto:joe")
    val got = cases.map(_._1).toDF("url")
      .select(UrlOps.canonicalize($"url")).as[String].collect().toSeq
    cases.map(_._2).zip(got).foreach { case (exp, g) => assert(g == exp) }
  }

  test("canonicalize: tracking-equivalent URLs collapse to one dedup key") {
    val variants = Seq(
      "https://news.site.com/story/42?utm_source=tw&utm_medium=social",
      "HTTPS://News.Site.com:443/story/42",
      "https://news.site.com/story/42/#top",
      "https://news.site.com/story/42?fbclid=IwAR123")
    val keys = variants.toDF("url")
      .select(UrlOps.canonicalize($"url")).as[String].collect().toSet
    assert(keys == Set("https://news.site.com/story/42"))
  }
}
