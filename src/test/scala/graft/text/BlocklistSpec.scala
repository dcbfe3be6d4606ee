package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BlocklistSpec extends SparkSpec {
  import spark.implicits._

  test("non-overlapping counts match replace() semantics, per pattern") {
    val d = Seq((1L, "abcabcabc")).toDF("doc_id", "text")
    val pats = Seq((10L, "abcabc"), (20L, "cab"), (30L, "xyz"))
    val out = Blocklist.scan(d, "doc_id", "text", pats)
      .select("pid", "n").as[(Long, Long)].collect().toSeq.sortBy(_._1)
    // "abcabc": leftmost at 1, jump past -> 1; "cab": at 3 and 6 -> 2;
    // "xyz": absent -> omitted
    assert(out == Seq((10L, 1L), (20L, 2L)))
  }

  test("self-overlapping pattern counts non-overlapping occurrences") {
    val d = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val out = Blocklist.scan(d, "doc_id", "text", Seq((1L, "aa")))
      .select("n").as[Long].head
    assert(out == 2L, "replace('aaaa','aa','') removes two")
  }

  test("a pattern that is a suffix of another is still found (output links)") {
    val d = Seq((1L, "she sells seashells")).toDF("doc_id", "text")
    val out = Blocklist.scan(d, "doc_id", "text",
      Seq((1L, "she"), (2L, "he"), (3L, "sells")))
      .select("pid", "n").as[(Long, Long)].collect().toSeq.sortBy(_._1)
    // "she" at 1 and inside "seashells" -> 2; "he" inside both "she"s
    // -> 2 (found only via the output link while the automaton sits in
    // the "she" state); "sells" once ("seashells" contains "shells",
    // not "sells")
    assert(out == Seq((1L, 2L), (2L, 2L), (3L, 1L)))
  }

  test("multi-byte phrases match byte-exactly at character boundaries") {
    val d = Seq((1L, "say héllo, héllo again")).toDF("doc_id", "text")
    val out = Blocklist.scan(d, "doc_id", "text", Seq((1L, "héllo")))
      .select("n").as[Long].head
    assert(out == 2L)
  }

  test("verdict covers every doc; null text keeps with zero hits") {
    val d = Seq((1L, "bad phrase here"), (2L, "clean"), (3L, null))
      .toDF("doc_id", "text")
    val v = Blocklist.verdict(d, "doc_id", "text", Seq((1L, "bad phrase")),
      maxHits = 0L)
      .orderBy("doc_id").as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(v == Seq((1L, 1L, 1L, false), (2L, 0L, 0L, true),
      (3L, 0L, 0L, true)))
  }

  test("totalHits: narrow scan-side column — no exchange, no generate; sums the scan") {
    val d = Seq((1L, "bad one and bad two"), (2L, "clean"), (3L, null))
      .toDF("doc_id", "text")
    val pats = Seq((1L, "bad"), (2L, "two"))
    // value: in-row fold == sum of the exploded per-phrase counts
    val hits = d.select($"doc_id",
      Blocklist.totalHits($"text", pats).as("h"))
      .as[(Long, Long)].collect().toMap
    assert(hits == Map(1L -> 3L, 2L -> 0L, 3L -> 0L), hits.toString)
    // plan: the filter Curation's blocklist stage runs must stay narrow —
    // one kernel pass per row, no explode (Generate), no shuffle (Exchange)
    val plan = d.filter(Blocklist.totalHits($"text", pats) <= 0L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Generate"), plan)
  }

  test("differential: one automaton pass equals |patterns| replace scans") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    val pats = d.filter($"doc_id" % 17 === 2 && length($"text") >= 30)
      .select($"doc_id", substring($"text", 5, 18).as("p"))
      .as[(Long, String)].collect().toSeq
    assert(pats.nonEmpty)
    val ac = Blocklist.scan(d, "doc_id", "text", pats)
      .select("doc_id", "pid", "n").as[(Long, Long, Long)].collect().toSet
    val naive = pats.flatMap { case (pid, p) =>
      d.select($"doc_id",
        ((length($"text") - length(expr(s"replace(text, '${p.replace("'", "''")}', '')")))
          / lit(p.length)).cast("long").as("n"))
        .filter($"n" > 0)
        .as[(Long, Long)].collect().map { case (id, n) => (id, pid, n) }
    }.toSet
    assert(ac == naive, s"AC vs naive diff: ${(ac diff naive).take(3)} / ${(naive diff ac).take(3)}")
  }
}
