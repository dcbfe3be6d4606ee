package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SitemapsSpec extends SparkSpec {
  import spark.implicits._

  test("urls: loc extraction, whitespace, entities, urlset and index bodies") {
    val urlset =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <url><loc>https://a.com/p/1</loc><lastmod>2026-01-01</lastmod></url>
        |  <url><loc>
        |    https://a.com/p/2?x=1&amp;y=2
        |  </loc></url>
        |  <url><loc>https://a.com/&lt;odd&gt;?q=&quot;v&quot;&amp;lt;</loc></url>
        |  <url><loc></loc></url>
        |</urlset>""".stripMargin
    val got = Seq(urlset).toDF("xml")
      .select(explode(Sitemaps.urls(col("xml"))).as("u"))
      .as[String].collect().toSeq
    assert(got == Seq(
      "https://a.com/p/1",
      "https://a.com/p/2?x=1&y=2",
      // &amp;lt; decodes to the LITERAL "&lt;" (amp decoded last)
      "https://a.com/<odd>?q=\"v\"&lt;"), s"got $got")
    val index =
      "<sitemapindex><sitemap><loc>https://a.com/sm/1.xml</loc></sitemap>" +
        "<sitemap><loc>https://a.com/sm/2.xml</loc></sitemap></sitemapindex>"
    val idx = Seq(index).toDF("xml")
      .select(explode(Sitemaps.urls(col("xml"))).as("u"))
      .as[String].collect().toSeq
    assert(idx == Seq("https://a.com/sm/1.xml", "https://a.com/sm/2.xml"))
  }

  test("sitemapRefs: host-wide, group-independent, comments stripped") {
    val bodies = Seq(
      ("h1.com", "User-agent: *\nDisallow: /x\n" +
        "Sitemap: https://h1.com/sitemap.xml # the main one\n"),
      ("h2.com", "Sitemap: https://h2.com/a.xml\r\n" +
        "User-agent: bot\nDisallow: /\nSitemap: https://h2.com/b.xml\n"),
      ("h3.com", "User-agent: *\nDisallow:\nSitemap:   \n") // blank → dropped
    ).toDF("host", "body")
    val got = RobotsTxt.sitemapRefs(bodies, "host", "body")
      .as[(String, String)].collect().sorted.toSeq
    assert(got == Seq(
      ("h1.com", "https://h1.com/sitemap.xml"),
      ("h2.com", "https://h2.com/a.xml"),
      ("h2.com", "https://h2.com/b.xml")), s"got $got")
  }

  test("entries: per-<url> loc+lastmod pairs, lastmod optional, " +
      "entities decoded, sitemapindex blocks ignored") {
    import spark.implicits._
    val xml =
      """<urlset>
        |<url><loc>https://a.com/p?x=1&amp;y=2</loc>
        |  <lastmod>2026-01-15T08:00:00Z</lastmod></url>
        |<url><lastmod>2026-01-01</lastmod><loc> https://a.com/q </loc></url>
        |<url><loc>https://a.com/r</loc></url>
        |<url><lastmod>2026-02-02</lastmod></url>
        |</urlset>""".stripMargin
    val got = Seq(xml).toDF("xml")
      .select(explode(Sitemaps.entries(col("xml"))).as("e"))
      .select(col("e.loc"), col("e.lastmod"))
      .as[(String, Option[String])].collect().toSeq
    assert(got == Seq(
      ("https://a.com/p?x=1&y=2", Some("2026-01-15T08:00:00Z")),
      ("https://a.com/q", Some("2026-01-01")),
      ("https://a.com/r", None)), s"entries: $got")
    // an index body has no <url> blocks — entries() yields nothing
    // (urls() still reads its <loc>s; the caller routes by body kind)
    val idx = "<sitemapindex><sitemap><loc>https://a.com/s1.xml</loc>" +
      "<lastmod>2026-01-01</lastmod></sitemap></sitemapindex>"
    val none = Seq(idx).toDF("xml")
      .select(size(Sitemaps.entries(col("xml"))).as("n")).as[Int].head()
    assert(none == 0, s"index body minted $none entries")
  }
}
