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

  test("randomized differential: verdicts equal a naive RFC 9309 reference") {
    // the AhoCorasickPropertySpec discipline: random rule sets and URLs,
    // engine verdicts vs a literal per-URL Scala application of the RFC
    val rnd = new scala.util.Random(4242)
    val hosts = Seq("a.com", "b.org", "c.net")
    val prefixPool = Seq("/", "/a", "/a/b", "/ab", "/b", "/b/c", "/abc")
    val agentPool = Seq("bot", "*", "other")
    for (round <- 1 to 5) {
      val ruleRows = Seq.fill(rnd.nextInt(15) + 5) {
        (hosts(rnd.nextInt(hosts.size)), agentPool(rnd.nextInt(agentPool.size)),
          if (rnd.nextBoolean()) "allow" else "disallow",
          prefixPool(rnd.nextInt(prefixPool.size)))
      }
      val urlRows = (0 until 60).map { i =>
        val h = hosts(rnd.nextInt(hosts.size))
        val p = prefixPool(rnd.nextInt(prefixPool.size)) +
          (if (rnd.nextBoolean()) s"/x$i" else "")
        (i.toLong, s"http://$h$p")
      }
      def refVerdict(url: String): Boolean = {
        val h = url.stripPrefix("http://").takeWhile(_ != '/')
        val path = url.drop("http://".length + h.length)
        val applicable = ruleRows.filter(r =>
          r._1 == h && (r._2 == "bot" || r._2 == "*"))
        val hasSpec = applicable.exists(_._2 == "bot")
        val grp = applicable.filter(r => r._2 == (if (hasSpec) "bot" else "*"))
        val matched = grp.filter(r => path.startsWith(r._4))
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
