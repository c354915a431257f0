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
}
