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
}
