package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RobotsTxtSpec extends SparkSpec {
  import spark.implicits._

  private def rulesOf(body: String) =
    RobotsTxt.parseRules(Seq(("h.com", body)).toDF("host", "body"), "host", "body")
      .select("agent", "rule", "prefix")
      .as[(String, String, String)].collect().toSet

  test("parser: comments, CRLF, mixed-case keys, unknown directives, empty disallow") {
    val got = rulesOf(
      "# header comment\r\n" +
        "USER-AGENT: GraftBot # inline\r\n" +
        "Crawl-delay: 10\r\n" + // unknown directive inside a group: ignored
        "DisAllow: /a\r\n" +
        "Allow: /a/b # keep docs\r\n" +
        "\r\n" +
        "User-agent: *\r\n" +
        "Disallow:\r\n") // empty prefix = allow-all idiom: NO rule row
    assert(got == Set(
      ("graftbot", "disallow", "/a"),
      ("graftbot", "allow", "/a/b")))
  }

  test("parser: consecutive User-agent lines share a group; rules end a run") {
    val got = rulesOf(
      "User-agent: a\nUser-agent: b\nDisallow: /x\n" +
        "User-agent: c\nDisallow: /y\n")
    assert(got == Set(
      ("a", "disallow", "/x"), ("b", "disallow", "/x"),
      ("c", "disallow", "/y")))
  }

  test("verdicts: group selection, longest match, allow on tie, default allow") {
    val rules = Seq(
      // h1: specific group must beat *
      ("h1.com", "bot", "disallow", "/d"),
      ("h1.com", "*", "allow", "/d"),
      // h2: longest prefix wins; length tie → allow
      ("h2.com", "*", "disallow", "/p"),
      ("h2.com", "*", "allow", "/p/q"),
      ("h2.com", "*", "disallow", "/t/x"),
      ("h2.com", "*", "allow", "/t/y"),
      ("h2.com", "*", "allow", "/tie"),
      ("h2.com", "*", "disallow", "/tie")
    ).toDF("host", "agent", "rule", "prefix")
    val urls = Seq(
      (1L, "http://h1.com/d/1"),    // specific group: denied
      (2L, "http://h2.com/p/z"),    // /p only: denied
      (3L, "http://h2.com/p/q/z"),  // /p/q longer allow: allowed
      (4L, "http://h2.com/tie/z"),  // same-length pair: allow wins
      (5L, "http://h2.com/other"),  // no matching rule: allowed
      (6L, "http://h3.com/x"),      // no rules for host: allowed
      (7L, "http://h4.com")         // bare host = path "/": denied (RFC 9309)
    ).toDF("id", "url")
    val rulesAll = rules.unionByName(
      Seq(("h4.com", "*", "disallow", "/")).toDF("host", "agent", "rule", "prefix"))
    val got = RobotsTxt.verdicts(urls, "url", rulesAll, "Bot")
      .select("id", "allowed").as[(Long, Boolean)].collect().toMap
    assert(got == Map(1L -> false, 2L -> false, 3L -> true,
      4L -> true, 5L -> true, 6L -> true, 7L -> false))
    // filterAllowed is the same verdict as a filter
    assert(RobotsTxt.filterAllowed(urls, "url", rulesAll, "Bot")
      .select("id").as[Long].collect().sorted.toSeq == Seq(3L, 4L, 5L, 6L))
  }

  test("parseDelays + delayFor: groups, agent selection, junk values, min-wins") {
    val bodies = Seq(
      // specific group (closed by the empty Disallow), then the * group
      ("h1.com", "User-agent: GraftBot\nCrawl-delay: 10\nDisallow:\n" +
        "User-agent: *\nCrawl-delay: 1\n"),
      ("h2.com", "User-agent: *\nCrawl-delay: 0.5\n"),
      ("h3.com", "User-agent: *\nCrawl-delay: abc\n"),   // junk → no row
      ("h4.com", "User-agent: *\nCrawl-delay: -3\n"),    // non-positive → no row
      ("h5.com", "User-agent: OtherBot\nCrawl-delay: 1\n"),
      // two directives in one group → min wins
      ("h6.com", "User-agent: *\nCrawl-delay: 7\nCrawl-delay: 4\n")
    ).toDF("host", "body")
    val delays = RobotsTxt.parseDelays(bodies, "host", "body")
    assert(delays.filter(col("host").isin("h3.com", "h4.com")).count() == 0L)
    val eff = RobotsTxt.delayFor(delays, "GraftBot")
      .as[(String, Double)].collect().toMap
    // h5 has no applicable group for this agent → absent (caller default)
    assert(eff == Map("h1.com" -> 10.0, "h2.com" -> 0.5, "h6.com" -> 4.0))
    // the '*' crawler sees h1's * group
    val star = RobotsTxt.delayFor(delays, "SomeOtherBot")
      .as[(String, Double)].collect().toMap
    assert(star("h1.com") == 1.0)
  }

  /** Literal per-pattern RFC 9309 §2.2.3 matcher, built DIFFERENTLY
    * from the engine (Pattern.quote segments, not char-class escaping):
    * `*` spans anything, a trailing `$` anchors the end, everything
    * else is literal, and an un-anchored pattern is a prefix match.
    */
  private def refMatches(pattern: String, path: String): Boolean = {
    val endAnchor = pattern.endsWith("$")
    val body = if (endAnchor) pattern.dropRight(1) else pattern
    val rx = "^" + body.split("\\*", -1)
      .map(s => if (s.isEmpty) "" else java.util.regex.Pattern.quote(s))
      .mkString(".*") + (if (endAnchor) "$" else "")
    java.util.regex.Pattern.compile(rx).matcher(path).find()
  }

  test("verdicts: wildcard '*' and end-anchor '$' patterns (RFC 9309 §2.2.3)") {
    val rules = Seq(
      ("w.com", "*", "disallow", "/doc/*3$"),   // ids ending in 3
      ("w.com", "*", "allow", "/doc/13"),       // literal, SHORTER than above
      ("x.com", "*", "disallow", "/*.dat$"),
      ("x.com", "*", "allow", "/files/1*"),     // longer → wins on overlap
      ("y.com", "*", "disallow", "*"),          // bare star: everything
      ("z.com", "*", "disallow", "/doc$")       // exact-URL only
    ).toDF("host", "agent", "rule", "prefix")
    val urls = Seq(
      (1L, "http://w.com/doc/23"),     // *3$ → denied
      (2L, "http://w.com/doc/24"),     // no match → allowed
      (3L, "http://w.com/doc/13"),     // both match; 9 > 7 → disallow wins
      (4L, "http://w.com/doc/134"),    // only the literal allow → allowed
      (5L, "http://x.com/files/4.dat"),// .dat$ → denied
      (6L, "http://x.com/files/14.dat"),// allow /files/1* is longer → allowed
      (7L, "http://x.com/files/4.data"),// $ anchor: .data is NOT .dat → allowed
      (8L, "http://y.com/anything"),   // bare star → denied
      (9L, "http://z.com/doc"),        // exact → denied
      (10L, "http://z.com/doc/9")      // deeper than the anchor → allowed
    ).toDF("id", "url")
    val got = RobotsTxt.verdicts(urls, "url", rules, "Bot")
      .select("id", "allowed").as[(Long, Boolean)].collect().toMap
    assert(got == Map(1L -> false, 2L -> true, 3L -> false, 4L -> true,
      5L -> false, 6L -> true, 7L -> true, 8L -> false, 9L -> false,
      10L -> true))
  }

  test("fetchesIn: /robots.txt full responses only, query ignored, host lowered") {
    import spark.implicits._
    val none: Option[String] = None
    val recs = Seq(
      ("http://A.Example.COM/robots.txt", Some(200), "User-agent: *\n",
        "response", none),
      ("http://b.com/robots.txt?v=2", Some(200), "Disallow: /\n",
        "response", none),                                   // query ignored
      ("http://c.com/robots.txt", Some(404), "nope", "response", none),
      ("http://d.com/not-robots.txt", Some(200), "x", "response", none),
      ("http://e.com/dir/robots.txt", Some(200), "x", "response", none),
      // a revisit's header-only payload parses to 200 + EMPTY body —
      // admitting it would erase the host's rolled rules (allow-all)
      ("http://f.com/robots.txt", Some(200), "", "revisit", none),
      // a truncated capture is a PARTIAL (more permissive) rule set
      ("http://g.com/robots.txt", Some(200), "User-agent: *\n",
        "response", Some("length")),
      (null, Some(200), "x", "response", none))
      .map { case (u, s, b, wt, tr) => (u, s, b.getBytes("UTF-8"), wt, tr) }
      .toDF("target_uri", "http_status", "body", "warc_type", "truncated")
    val got = RobotsTxt.fetchesIn(recs).as[(String, String)]
      .collect().toMap
    assert(got == Map(
      "a.example.com" -> "User-agent: *\n",
      "b.com" -> "Disallow: /\n"), s"fetches: $got")
  }

  test("rollBodies: latest fetch wins per host, untouched hosts survive") {
    import spark.implicits._
    val prev = Seq(("a.com", "v1"), ("b.com", "v1")).toDF("host", "body")
    val fresh = Seq(("b.com", "v2"), ("c.com", "v1")).toDF("host", "body")
    val got = RobotsTxt.rollBodies(prev, fresh)
      .as[(String, String)].collect().toMap
    assert(got == Map("a.com" -> "v1", "b.com" -> "v2", "c.com" -> "v1"),
      s"rolled: $got")
  }

  test("server-error latch: 5xx opens the cached window (earliest wins), " +
      "a sub-500 answer clears it, expiry REPLACES the host's rules " +
      "with complete disallow") {
    import spark.implicits._
    val empty = Seq.empty[(String, Double)].toDF("host", "err_since")
    // a drain carrying both a 503 and a retried 200 for one host's
    // robots got its definitive answer — no latch
    val mixed = RobotsTxt.rollErrors(empty,
      Seq(("a.com", 503), ("a.com", 200)).toDF("host", "status")
        .groupBy("host").agg(min("status").as("status")),
      t = 0.0)
    assert(mixed.isEmpty, "mixed 503+200 drain latched")
    // latch at t=1; a second 5xx at t=2 keeps the EARLIEST err_since
    val e1 = RobotsTxt.rollErrors(empty,
      Seq(("a.com", 503)).toDF("host", "status"), t = 1.0)
    val e2 = RobotsTxt.rollErrors(e1,
      Seq(("a.com", 500)).toDF("host", "status"), t = 2.0)
    assert(e2.as[(String, Double)].collect().toSeq == Seq(("a.com", 1.0)),
      "earliest err_since not kept")
    // inside the window the cached rules serve; past it the host's
    // rules are REPLACED (the old longer Allow must not win the
    // longest-match tie against the synthetic Disallow: /)
    val rules = Seq(
      ("a.com", "*", "allow", "/pub"), ("a.com", "*", "disallow", "/priv"),
      ("b.com", "*", "disallow", "/x"))
      .toDF("host", "agent", "rule", "prefix")
    val urls = Seq("http://a.com/pub/1", "http://b.com/ok").toDF("url")
    def allowed(asOf: Double) = RobotsTxt.verdicts(urls, "url",
        RobotsTxt.withErrorDisallow(rules, e2, asOf, cachedWindow = 2.0),
        "bot")
      .where(col("allowed")).select("url").as[String].collect().sorted.toSeq
    assert(allowed(2.0) == Seq("http://a.com/pub/1", "http://b.com/ok"),
      "cached window not honored")
    assert(allowed(3.0) == Seq("http://b.com/ok"),
      "expired window did not gate to complete disallow")
    // recovery: a 200 answer clears the latch
    val e3 = RobotsTxt.rollErrors(e2,
      Seq(("a.com", 200)).toDF("host", "status"), t = 4.0)
    assert(e3.isEmpty, "sub-500 answer did not clear the latch")
  }

  test("randomized differential: verdicts equal a naive RFC 9309 reference") {
    // the AhoCorasickPropertySpec discipline: random rule sets and URLs,
    // engine verdicts vs a literal per-URL Scala application of the RFC
    // — pattern pool includes '*' and '$' rules (and regex specials
    // that must stay literal)
    val rnd = new scala.util.Random(4242)
    val hosts = Seq("a.com", "b.org", "c.net")
    val prefixPool = Seq("/", "/a", "/a/b", "/ab", "/b", "/b/c", "/abc",
      "/a*", "/*/b", "/a/b$", "/*b$", "*", "/a.b", "/a+b", "/(a)")
    val pathPool = Seq("/", "/a", "/a/b", "/ab", "/b", "/b/c", "/abc",
      "/a/b/c", "/xb", "/a.b", "/a+b", "/(a)", "/aXb")
    val agentPool = Seq("bot", "*", "other")
    for (round <- 1 to 8) {
      val ruleRows = Seq.fill(rnd.nextInt(15) + 5) {
        (hosts(rnd.nextInt(hosts.size)), agentPool(rnd.nextInt(agentPool.size)),
          if (rnd.nextBoolean()) "allow" else "disallow",
          prefixPool(rnd.nextInt(prefixPool.size)))
      }
      val urlRows = (0 until 60).map { i =>
        val h = hosts(rnd.nextInt(hosts.size))
        val p = pathPool(rnd.nextInt(pathPool.size)) +
          (if (rnd.nextBoolean()) s"/x$i" else "")
        (i.toLong, s"http://$h$p")
      }
      def refVerdict(url: String): Boolean = {
        val h = url.stripPrefix("http://").takeWhile(_ != '/')
        val path0 = url.drop("http://".length + h.length)
        val path = if (path0.isEmpty) "/" else path0
        val applicable = ruleRows.filter(r =>
          r._1 == h && (r._2 == "bot" || r._2 == "*"))
        val hasSpec = applicable.exists(_._2 == "bot")
        val grp = applicable.filter(r => r._2 == (if (hasSpec) "bot" else "*"))
        val matched = grp.filter(r => refMatches(r._4, path))
        matched.isEmpty ||
          matched.map(r => (r._4.length, r._3 == "allow")).max._2
      }
      val got = RobotsTxt.verdicts(urlRows.toDF("id", "url"), "url",
          ruleRows.toDF("host", "agent", "rule", "prefix"), "Bot")
        .select("id", "allowed").as[(Long, Boolean)].collect().toMap
      urlRows.foreach { case (id, u) =>
        assert(got(id) == refVerdict(u),
          s"round $round: $u → engine ${got(id)}, reference ${refVerdict(u)}\n" +
            s"rules: ${ruleRows.mkString(", ")}")
      }
    }
  }
}
