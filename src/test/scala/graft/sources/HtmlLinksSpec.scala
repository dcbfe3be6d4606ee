package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

class HtmlLinksSpec extends SparkSpec {
  import spark.implicits._

  test("extract: quoted forms, attribute order, empty hrefs dropped") {
    val html =
      """<html><body>
        |<a href="/a">x</a>
        |<a class="nav" href="/b?q=1#frag">y</a>
        |<a href='rel/c'>z</a>
        |<a href="">empty</a>
        |<a name="anchor-without-href">w</a>
        |<img src="/not-a-link.png">
        |</body></html>""".stripMargin
    val got = Seq(html).toDF("html")
      .select(explode(HtmlLinks.extract(col("html"))).as("href"))
      .as[String].collect().toSeq
    assert(got == Seq("/a", "/b?q=1#frag", "rel/c"), s"extracted $got")
  }

  test("extract: attribute-name boundary — data-href is not an outlink") {
    val html =
      """<a data-href="/not-a-link" href="/real">x</a>
        |<a data-href="/only-data">y</a>
        |<a xhref='/also-not'>z</a>
        |<a class="n" href='/q'>w</a>""".stripMargin
    val got = Seq(html).toDF("html")
      .select(explode(HtmlLinks.extract(col("html"))).as("href"))
      .as[String].collect().toSeq
    assert(got == Seq("/real", "/q"), s"extracted $got")
  }

  test("canonicalHref: both attribute orders, either quote form, null " +
      "when absent, first declaration wins") {
    val rows = Seq(
      ("""<link rel="canonical" href="https://c.example/x">""",
        Some("https://c.example/x")),
      ("""<link href='/alt/1' rel='canonical'>""", Some("/alt/1")),
      // extra attributes between rel and href
      ("""<link rel="canonical" type="text/html" href="/c">""", Some("/c")),
      // a stylesheet link is not a canonical
      ("""<link rel="stylesheet" href="/style.css">""", None),
      // rel-first form consulted before href-first: first wins
      ("""<link rel="canonical" href="/first">""" +
        """<link href="/second" rel="canonical">""", Some("/first")),
      ("<p>no links at all</p>", None))
    val got = rows.map(_._1).toDF("html")
      .select(HtmlLinks.canonicalHref(col("html")).as("c"))
      .as[Option[String]].collect().toSeq
    assert(got == rows.map(_._2), s"canonicals: $got")
  }

  test("baseHref + effectiveBase: <base href> rebases relative references") {
    val rows = Seq(
      // absolute base, double-quoted
      ("""<head><base href="http://cdn.h.com/assets/"></head><a href="x">""",
        "http://page.com/a/b", "http://cdn.h.com/assets/x"),
      // RELATIVE base resolves against the page URI first
      ("""<base href='/root/'><a href="x">""",
        "http://page.com/a/b", "http://page.com/root/x"),
      // no base → page URI
      ("""<a href="x">""", "http://page.com/a/b", "http://page.com/a/x"),
      // data-base-href must not match
      ("""<base data-href="/decoy"><a href="x">""",
        "http://page.com/a/b", "http://page.com/a/x"))
      .toDF("html", "uri", "want")
    val got = rows.select(
      HtmlLinks.resolve(
        HtmlLinks.effectiveBase(col("uri"), col("html")), lit("x")).as("got"),
      col("want")).as[(String, String)].collect()
    got.foreach { case (g, w) => assert(g == w, s"got $g want $w") }
  }

  test("randomized differential: effectiveBase two-step equals JDK two-step") {
    val rnd = new scala.util.Random(8787)
    val segs = Seq("x", "y1", "doc", "img2")
    def path(n: Int) = (1 to n).map(_ => segs(rnd.nextInt(segs.size)))
      .mkString("/", "/", "/")
    val cases = (0 until 120).map { _ =>
      val page = s"http://a.com${path(2)}p"
      val baseH = rnd.nextInt(3) match {
        case 0 => s"http://b.org${path(2)}"  // absolute base
        case 1 => path(1)                    // absolute-path base
        case _ => segs(rnd.nextInt(segs.size)) + "/" // relative dir base
      }
      val ref = segs(rnd.nextInt(segs.size))
      (page, baseH, ref)
    }.distinct
    def jdk(page: String, baseH: String, ref: String): String =
      new java.net.URI(page).resolve(new java.net.URI(baseH))
        .resolve(new java.net.URI(ref)).toString.replaceAll("#.*$", "")
    val got = cases.toDF("page", "bh", "ref")
      .select(col("page"), col("bh"), col("ref"),
        HtmlLinks.resolve(
          HtmlLinks.effectiveBase(col("page"),
            concat(lit("<base href=\""), col("bh"), lit("\">"))),
          col("ref")).as("r"))
      .as[(String, String, String, String)].collect()
      .map { case (p, b, r, v) => (p, b, r) -> v }.toMap
    cases.foreach { case (p, b, r) =>
      assert(got((p, b, r)) == jdk(p, b, r),
        s"base($p, $b) + $r: engine ${got((p, b, r))}, JDK ${jdk(p, b, r)}")
    }
  }

  test("resolve: RFC 3986 branch cases (crawl semantics)") {
    val base = "http://h.com/a/b/c?q=1#top"
    val cases = Seq(
      ("", "http://h.com/a/b/c?q=1"),                 // empty → base sans fragment
      ("https://o.net/x", "https://o.net/x"),          // absolute: verbatim
      ("//o.net/p", "http://o.net/p"),                 // protocol-relative
      ("/x/y", "http://h.com/x/y"),                    // absolute path
      ("/x/../y", "http://h.com/y"),                   // dots in absolute path
      ("?k=v", "http://h.com/a/b/c?k=v"),              // query-only (RFC §5.3)
      ("x", "http://h.com/a/b/x"),                     // relative
      ("x/y", "http://h.com/a/b/x/y"),
      ("./x", "http://h.com/a/b/x"),
      ("../x", "http://h.com/a/x"),
      ("../../x", "http://h.com/x"),
      ("../../../x", "http://h.com/x"),                // pops above root → root
      ("x/../y", "http://h.com/a/b/y"),
      ("x#frag", "http://h.com/a/b/x"),                // fragments dropped
      ("d?k=v", "http://h.com/a/b/d?k=v"))
    val got = cases.map(_._1).toDF("ref")
      .select(col("ref"), HtmlLinks.resolve(lit(base), col("ref")).as("r"))
      .as[(String, String)].collect().toMap
    cases.foreach { case (ref, want) =>
      assert(got(ref) == want, s"resolve($base, $ref) = ${got(ref)}, want $want")
    }
    // rootless base path: merge against "/"
    val rootless = Seq("x").toDF("ref")
      .select(HtmlLinks.resolve(lit("http://h.com"), col("ref")))
      .as[String].head()
    assert(rootless == "http://h.com/x")
    // null propagation
    val n = Seq(Tuple1(null: String)).toDF("ref")
      .select(HtmlLinks.resolve(lit(base), col("ref"))).head()
    assert(n.isNullAt(0))
  }

  test("randomized differential: resolve equals java.net.URI.resolve") {
    // the RobotsTxtSpec discipline: random (base, ref) pairs, engine vs
    // the JDK's RFC 3986 implementation (fragments stripped on both
    // sides — the documented crawl deviation). Query-only and EMPTY
    // refs are excluded: the JDK deviates from RFC §5.3 on both (it
    // dir-merges a bare query, JDK-6394131, and drops the base query on
    // an empty ref) — the fixed-case table pins the RFC behavior for
    // those two shapes instead.
    val rnd = new scala.util.Random(8686)
    val hosts = Seq("a.com", "b.org:8080", "c.net")
    val segs = Seq("x", "y1", "doc", "img2", "a.b")
    def path(n: Int) = (1 to n).map(_ => segs(rnd.nextInt(segs.size)))
      .mkString("/", "/", "")
    // base paths are ≥ 3 segments deep and refs pop ≤ 2 levels: the JDK
    // PRESERVES leading "../" popped above the root (URI.normalize
    // javadoc) where RFC 3986 removes them — the engine follows the RFC
    // and the fixed-case table pins that shape ("../../../x" → root)
    val pairs = (0 until 400).map { _ =>
      val base = s"http://${hosts(rnd.nextInt(hosts.size))}${path(3)}" +
        (if (rnd.nextBoolean()) "?q=1" else "") +
        (if (rnd.nextBoolean()) "#top" else "")
      val ref = rnd.nextInt(7) match {
        case 0 => s"https://o.net${path(rnd.nextInt(2) + 1)}"
        case 1 => s"//o.net${path(1)}"
        case 2 => path(rnd.nextInt(3) + 1) // absolute path
        case 3 => // relative with bounded dots: ≤2 pops, optional ./, x/../y
          ("../" * rnd.nextInt(3)) +
            (if (rnd.nextBoolean()) "./" else "") +
            segs(rnd.nextInt(segs.size)) +
            (if (rnd.nextBoolean()) "/../" + segs(rnd.nextInt(segs.size))
            else "")
        case 4 => segs(rnd.nextInt(segs.size)) + "#frag"
        case 5 => "./" + segs(rnd.nextInt(segs.size))
        case _ => segs(rnd.nextInt(segs.size)) + "?k=v"
      }
      (base, ref)
    }.distinct
    def refImpl(base: String, ref: String): String = {
      val b = new java.net.URI(base)
      val r = b.resolve(new java.net.URI(ref)).toString
      r.replaceAll("#.*$", "")
    }
    val got = pairs.toDF("base", "ref")
      .select(col("base"), col("ref"),
        HtmlLinks.resolve(col("base"), col("ref")).as("r"))
      .as[(String, String, String)].collect()
      .map { case (b, r, v) => (b, r) -> v }.toMap
    pairs.foreach { case (b, r) =>
      // a ref that is only dot segments can resolve to the directory
      // itself; both sides must agree on that too
      assert(got((b, r)) == refImpl(b, r),
        s"resolve($b, $r): engine ${got((b, r))}, JDK ${refImpl(b, r)}")
    }
  }

  test("extractFollowable: unquoted rel values drop, whole-token test " +
      "(rel=nofollowme is followable), sponsored/ugc tokens drop") {
    val html =
      """<a href="/a">keep</a>
        |<a rel="nofollow" href="/b">drop-dq</a>
        |<a rel='ugc' href="/c">drop-sq</a>
        |<a rel=nofollow href="/d">drop-unquoted</a>
        |<a rel="nofollowme" href="/e">keep-substring</a>
        |<a rel="external sponsored" href="/f">drop-multi-token</a>
        |<a rel="me external" href="/g">keep-other-rel</a>
        |<a rel=author href="/h">keep-unquoted-other</a>""".stripMargin
    val got = Seq(html).toDF("html")
      .select(explode(HtmlLinks.extractFollowable(col("html"))).as("href"))
      .as[String].collect().toSeq
    assert(got == Seq("/a", "/e", "/g", "/h"), s"followable $got")
  }

  test("metaRobots: ALL robots metas union (split directives across " +
      "tags, both attribute orders); hasRobotsDirective whole-token + " +
      "`none` implies only noindex/nofollow") {
    val split = "<head><meta content=\"noarchive\" name=\"robots\">" +
      "<meta name=\"robots\" content=\"nofollow\"></head>"
    val rows = Seq(
      (split, true, false),
      ("<meta name=\"robots\" content=\"noindex, nofollow\">", false, true),
      ("<meta name=\"viewport\" content=\"width=1\">", false, false))
      .toDF("html", "wantArchive", "wantIndex")
      .select(
        HtmlLinks.metaRobots(col("html")).as("dirs"),
        col("wantArchive"), col("wantIndex"))
      .select(
        HtmlLinks.hasRobotsDirective(col("dirs"), "noarchive")
          .as("noarchive"),
        HtmlLinks.hasRobotsDirective(col("dirs"), "nofollow").as("nofollow"),
        HtmlLinks.hasRobotsDirective(col("dirs"), "noindex").as("noindex"),
        col("wantArchive"), col("wantIndex"))
      .collect()
    val r0 = rows(0)
    assert(r0.getBoolean(0) && r0.getBoolean(1) && !r0.getBoolean(2),
      s"split metas: $r0")
    val r1 = rows(1)
    assert(!r1.getBoolean(0) && r1.getBoolean(1) && r1.getBoolean(2),
      s"plain list: $r1")
    val r2 = rows(2)
    assert(!r2.getBoolean(0) && !r2.getBoolean(1) && !r2.getBoolean(2),
      s"non-robots meta: $r2")
    // `none` ≡ noindex + nofollow but NOT other directives
    val none = Seq("none").toDF("d").select(
      HtmlLinks.hasRobotsDirective(col("d"), "noindex").as("ni"),
      HtmlLinks.hasRobotsDirective(col("d"), "nofollow").as("nf"),
      HtmlLinks.hasRobotsDirective(col("d"), "noarchive").as("na")).head()
    assert(none.getBoolean(0) && none.getBoolean(1) && !none.getBoolean(2),
      s"none implications: $none")
  }

  test("scopedDirectives: generic passes, own-agent scope applies, " +
      "foreign scope drops, directive-name 'scopes' are values") {
    val got = Seq(
      "noindex, nofollow",            // generic
      "graftbot: noindex",            // our scope
      "GraftBot: nofollow",           // case-insensitive scope
      "googlebot: noindex",           // another crawler's opt-out
      "unavailable_after: 25 Jun 2030 15:00:00 PST", // value directive
      "max-snippet: 20")              // value directive
      .toDF("h")
      .select(HtmlLinks.scopedDirectives(col("h"), "graftbot").as("d"))
      .as[Option[String]].collect().toSeq
    assert(got == Seq(
      Some("noindex, nofollow"), Some("noindex"), Some("nofollow"),
      None, Some("unavailable_after: 25 Jun 2030 15:00:00 PST"),
      Some("max-snippet: 20")), s"scoped $got")
  }
}
