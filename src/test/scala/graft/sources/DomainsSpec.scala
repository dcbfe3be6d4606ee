package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DomainsSpec extends SparkSpec {
  import spark.implicits._

  test("registeredDomain: label rule, multi-part suffixes, ip/short hosts") {
    val cases = Seq(
      ("www.example.com", "example.com"),
      ("cdn.static.example.com", "example.com"),
      ("example.com", "example.com"),
      ("blog.example.co.uk", "example.co.uk"), // multi-part suffix → 3 labels
      ("example.co.uk", "example.co.uk"),
      ("co.uk", "co.uk"),           // bare suffix: ≤2 labels pass through
      ("localhost", "localhost"),   // single label
      ("192.168.10.1", "192.168.10.1"), // IPv4 literal: no label semantics
      ("", ""))
    val got = cases.map(_._1).toDF("host")
      .select(col("host"), Domains.registeredDomain(col("host")).as("d"))
      .as[(String, String)].collect().toMap
    cases.foreach { case (h, want) =>
      assert(got(h) == want, s"registeredDomain($h) = ${got(h)}, want $want")
    }
    // null host → null domain (kept by filterBlocked)
    val n = Seq(Tuple1(null: String)).toDF("host")
      .select(Domains.registeredDomain(col("host"))).head
    assert(n.isNullAt(0))
  }

  test("randomized differential: registeredDomain equals a scala reference") {
    def ref(h: String): String =
      if (h.matches("^[0-9]{1,3}(\\.[0-9]{1,3}){3}$")) h
      else {
        val ls = h.split("\\.", -1) // keep trailing empties, like Spark split
        if (ls.length <= 2) h
        else {
          val l2 = ls.takeRight(2).mkString(".")
          if (Domains.MultiPartSuffixes.contains(l2)) ls.takeRight(3).mkString(".")
          else l2
        }
      }
    val rnd = new scala.util.Random(777)
    val labels = Seq("a", "bb", "ccc", "www", "cdn", "x1", "co", "uk", "com",
      "au", "example", "tracker", "net", "org", "10", "192")
    val hostsR = (0 until 300).map { _ =>
      val n = rnd.nextInt(5) + 1
      Seq.fill(n)(labels(rnd.nextInt(labels.size))).mkString(".")
    } ++ Seq("192.168.10.1", "10.0.0.1", "a.co.uk", "co.uk", "x.com.au", "a.b.")
    val got = hostsR.distinct.toDF("host")
      .select(col("host"), Domains.registeredDomain(col("host")).as("d"))
      .as[(String, String)].collect().toMap
    hostsR.distinct.foreach { h =>
      assert(got(h) == ref(h), s"registeredDomain($h) = ${got(h)}, ref ${ref(h)}")
    }
  }

  test("filterBlocked: isin and broadcast-anti-join paths agree; null uri kept") {
    val docs = Seq(
      (1L, "https://www.example.com/a"),
      (2L, "https://ads.tracker.net/b"),
      (3L, "https://cdn.static.tracker.net/c"),
      (4L, "https://blog.example.co.uk/d"),
      (5L, null: String)
    ).toDF("doc_id", "uri")
    // small list → isin path
    val small = Domains.filterBlocked(docs, "uri", Seq("tracker.net"))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(small == Seq(1L, 4L, 5L), s"isin path kept $small")
    // pad past IsinMaxDomains → broadcast anti-join path, same verdicts
    val big = Seq("tracker.net") ++
      (0 until Domains.IsinMaxDomains + 8).map(i => s"pad$i.example")
    val largeKept = Domains.filterBlocked(docs, "uri", big)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(largeKept == Seq(1L, 4L, 5L), s"broadcast path kept $largeKept")
    // the broadcast path really is a broadcast join, not a shuffle
    val plan = Domains.filterBlocked(docs, "uri", big)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"), s"expected a broadcast anti-join:\n$plan")
    // mixed-case / padded entries (config or CLI verbatim) still match —
    // the derived domain is lowercased, so entries are normalized too
    // (r14 ADVICE); blank-only lists are rejected, not silently no-op
    val mixed = Domains.filterBlocked(docs, "uri", Seq(" Tracker.NET "))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(mixed == Seq(1L, 4L, 5L), s"mixed-case entry kept $mixed")
    intercept[IllegalArgumentException] {
      Domains.filterBlocked(docs, "uri", Seq("  ", ""))
    }
  }

  // a PSL-style rule table: plain entries, a deep entry (github.io), a
  // wildcard (*.ck, *.kawasaki.jp), exceptions (!www.ck, !city.kawasaki.jp)
  private val PslRules = Seq(
    "com", "uk", "co.uk", "io", "github.io", "ck", "*.ck", "!www.ck",
    "jp", "*.kawasaki.jp", "!city.kawasaki.jp")

  /** Literal per-host application of the PSL algorithm — the reference
    * the engine's broadcast-probe form must equal.
    */
  private def pslRef(host: String): String = {
    if (host == null) return null
    val h = host.toLowerCase(java.util.Locale.ROOT)
    if (h.matches("^[0-9]{1,3}(\\.[0-9]{1,3}){3}$")) return h
    val labels = h.split("\\.", -1)
    val n = labels.length
    def suffix(k: Int) = labels.takeRight(k).mkString(".")
    val matches = PslRules.map(_.trim.toLowerCase(java.util.Locale.ROOT))
      .flatMap { e =>
        val (kind, key) =
          if (e.startsWith("!")) ("exc", e.drop(1))
          else if (e.startsWith("*.")) ("wild", e.drop(2))
          else ("exact", e)
        val kl = key.split("\\.", -1).length
        kind match {
          case "exc" if n >= kl && suffix(kl) == key => Some((2, kl - 1))
          case "wild" if n >= kl + 1 && suffix(kl) == key => Some((1, kl + 1))
          case "exact" if n >= kl && suffix(kl) == key => Some((1, kl))
          case _ => None
        }
      }
    val ps = if (matches.isEmpty) 1 else matches.max._2
    if (n <= ps) h else suffix(ps + 1)
  }

  test("withRegisteredDomain: PSL exact, wildcard, exception, passthrough") {
    val cases = Seq(
      "alice.github.io" -> "alice.github.io", // deep exact entry
      "x.alice.github.io" -> "alice.github.io",
      "other.io" -> "other.io",               // plain 'io' entry
      "www.example.com" -> "example.com",
      "shop.example.co.uk" -> "example.co.uk",
      "foo.bar.ck" -> "foo.bar.ck",           // *.ck: bar.ck is a PS
      "x.www.ck" -> "www.ck",                 // !www.ck beats *.ck
      "www.ck" -> "www.ck",                   // exception host: PS = ck
      "bar.ck" -> "bar.ck",                   // IS a public suffix: whole
      "a.b.kawasaki.jp" -> "a.b.kawasaki.jp", // *.kawasaki.jp: b.kawasaki.jp PS
      "x.city.kawasaki.jp" -> "city.kawasaki.jp", // exception
      "unknown.zz" -> "unknown.zz",           // no rule: implicit '*'
      "a.unknown.zz" -> "unknown.zz",
      "192.168.10.1" -> "192.168.10.1",
      "UPPER.Example.COM" -> "example.com")   // lowered
    val got = cases.map(_._1).toDF("host")
      .transform(Domains.withRegisteredDomain(_, "host", "d",
        PslRules.toDF("suffix")))
      .select("host", "d").as[(String, String)].collect().toMap
    cases.foreach { case (h, want) =>
      assert(got(h) == want, s"psl($h) = ${got(h)}, want $want")
      assert(pslRef(h) == want, s"reference disagrees with the case table " +
        s"for $h: ${pslRef(h)}") // the reference itself is pinned too
    }
    // null host → null domain
    val n = Seq(Tuple1(null: String)).toDF("host")
      .transform(Domains.withRegisteredDomain(_, "host", "d",
        PslRules.toDF("suffix")))
      .select("d").head
    assert(n.isNullAt(0))
    // empty rule table → explicit error, not a silent implicit-'*' engine
    intercept[IllegalArgumentException] {
      Domains.withRegisteredDomain(Seq("a.com").toDF("host"), "host", "d",
        Seq("  ").toDF("suffix"))
    }
  }

  test("randomized differential: PSL form equals a literal reference") {
    val rnd = new scala.util.Random(24601)
    val pool = Seq("www", "x", "alice", "github", "io", "com", "co", "uk",
      "ck", "kawasaki", "city", "jp", "example", "bar")
    val hosts = (0 until 300).map { _ =>
      (1 to (rnd.nextInt(5) + 1)).map(_ => pool(rnd.nextInt(pool.size)))
        .mkString(".")
    }.distinct
    val got = hosts.toDF("host")
      .transform(Domains.withRegisteredDomain(_, "host", "d",
        PslRules.toDF("suffix")))
      .select("host", "d").as[(String, String)].collect().toMap
    hosts.foreach { h =>
      assert(got(h) == pslRef(h), s"psl($h) = ${got(h)}, ref ${pslRef(h)}")
    }
  }

  test("withRegisteredDomain plan: broadcast probes only, zero shuffles") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val df = (0 until 100).map(i => s"h$i.github.io").toDF("host")
      .localCheckpoint()
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val q = Domains.withRegisteredDomain(df, "host", "d",
        PslRules.toDF("suffix"))
      assert(q.count() == 100L)
      val shuffles = q.queryExecution.executedPlan
        .collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.isEmpty,
        s"the PSL probe chain must be shuffle-free (broadcast joins + " +
          s"row-local combine):\n${q.queryExecution.executedPlan}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("stats and filterBlocked PSL overloads") {
    val docs = Seq(
      (1L, "https://Alice.GitHub.IO/a", "aaaa"),
      (2L, "https://x.alice.github.io/b", "bb"),
      (3L, "https://bob.github.io/c", "c"),
      (4L, "https://www.example.com/d", "dd"),
      (5L, null: String, "ee")
    ).toDF("doc_id", "uri", "text")
    val psl = PslRules.toDF("suffix")
    val st = Domains.stats(docs, "uri", "text", psl)
      .orderBy("domain")
      .as[(String, Long, Long, Long)].collect().toSeq
    // null uri → null host → null domain group (evidence-free rows grouped)
    assert(st == Seq(
      (null, 1L, 0L, 2L),
      ("alice.github.io", 2L, 2L, 6L),
      ("bob.github.io", 1L, 1L, 1L),
      ("example.com", 1L, 1L, 2L)))
    // blocking the PUBLISHER alice.github.io spares bob.github.io
    val kept = Domains.filterBlocked(docs, "uri", Seq("Alice.github.io"), psl)
    assert(kept.select("doc_id").as[Long].collect().sorted.toSeq ==
      Seq(3L, 4L, 5L))
    // schema passthrough: no __psl temp columns leak
    assert(kept.columns.toSeq == Seq("doc_id", "uri", "text"))
  }
}
