package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ExactSubstrSpec extends SparkSpec {
  import spark.implicits._

  // a and b share the 20-char run "0123456789abcdefghij"; c is clean.
  private val digits = "0123456789abcdefghij"
  private val shared = Seq(
    (1L, digits),
    (2L, "XX" + digits + "YY"),
    (3L, "this text shares nothing with the others at all")
  ).toDF("doc_id", "text")

  test("cross-doc shared run: exact span extent and scrub") {
    val rep = ExactSubstr.report(shared, "doc_id", "text", width = 10)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // doc 1: windows 1..11 all duplicated -> one span [1,21) = 20 chars;
    // doc 2: windows 3..13 -> [3,23) = 20 chars; doc 3 clean
    assert(rep == Seq((1L, 1L, 20L, 20L), (2L, 1L, 20L, 20L), (3L, 0L, 0L, 0L)))
    val clean = ExactSubstr.scrub(shared, "doc_id", "text", width = 10)
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(clean(0) == (1L, ""), "fully-duplicated doc must scrub to empty")
    assert(clean(1) == (2L, "XXYY"))
    assert(clean(2)._2 == shared.filter($"doc_id" === 3).head.getString(1))
  }

  test("intra-doc repeat counts; spans with gap > width stay separate") {
    // gap chars are all DISTINCT (a run like "ZZZ…" would itself contain
    // identical width-10 windows and legitimately merge everything)
    val d = Seq((1L, "0123456789QWERTYUIOPAS0123456789")).toDF("doc_id", "text")
    val spans = ExactSubstr.duplicateSpans(d, "doc_id", "text", width = 10)
      .orderBy("span_start")
      .select("span_start", "span_end").as[(Int, Int)].collect().toSeq
    // "0123456789" at char 1 and 23: two windows of one hash, count 2
    assert(spans == Seq((1, 11), (23, 33)))
    val clean = ExactSubstr.scrub(d, "doc_id", "text", width = 10)
      .head.getString(1)
    assert(clean == "QWERTYUIOPAS")
  }

  test("adjacent duplicated windows merge into one maximal span") {
    // two docs sharing a 12-char run (the chars after it differ — A vs
    // B): 3 overlapping width-10 windows merge into [start, start+12)
    val d = Seq((1L, "abcdefghijklAunique_one"),
      (2L, "~~abcdefghijklBother")).toDF("doc_id", "text")
    val spans = ExactSubstr.duplicateSpans(d, "doc_id", "text", width = 10)
      .filter($"doc_id" === 1)
      .select("span_start", "span_end").as[(Int, Int)].collect().toSeq
    assert(spans == Seq((1, 13)))
  }

  test("positions are CHARACTER positions under multi-byte text") {
    val d = Seq((1L, "ZZàbcdefghijkl"), (2L, "QQQàbcdefghijkl"))
      .toDF("doc_id", "text")
    val spans = ExactSubstr.duplicateSpans(d, "doc_id", "text", width = 10)
      .orderBy("doc_id")
      .select("doc_id", "span_start", "span_end").as[(Long, Int, Int)]
      .collect().toSeq
    // shared suffix "àbcdefghijkl" = 12 CHARS: doc 1 [3,15), doc 2 [4,16)
    assert(spans == Seq((1L, 3, 15), (2L, 4, 16)))
    val clean = ExactSubstr.scrub(d, "doc_id", "text", width = 10)
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(clean == Seq((1L, "ZZ"), (2L, "QQQ")))
  }

  test("sub-width documents have no windows and scrub to themselves") {
    val d = Seq((1L, "short"), (2L, "short")).toDF("doc_id", "text")
    assert(ExactSubstr.duplicateSpans(d, "doc_id", "text", width = 10).isEmpty)
    val clean = ExactSubstr.scrub(d, "doc_id", "text", width = 10)
      .as[(Long, String)].collect().toSeq.sorted
    assert(clean == Seq((1L, "short"), (2L, "short")),
      "identical sub-width docs are EXACT-dedup's job, not span removal's")
  }

  // ---- winnowed scale mode (every = k) ----

  private def realCorpus = {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    d.unionByName(d.filter($"doc_id" % 9 === 0 && length($"text") >= 160)
      .select(($"doc_id" + 6000000L).as("doc_id"),
        concat(lit("QUOTED "), $"doc_id".cast("string"), lit(": "),
          substring($"text", 1, 150), lit(" :ENDQUOTE")).as("text")))
  }

  test("winnowed spans are contained in exact spans (marked subset)") {
    val exact = ExactSubstr.duplicateSpans(realCorpus, "doc_id", "text", width = 40)
      .withColumnRenamed("span_start", "es").withColumnRenamed("span_end", "ee")
    val win = ExactSubstr.duplicateSpans(realCorpus, "doc_id", "text",
      width = 40, every = 5)
    // every winnowed span must lie inside some exact span of its doc: a
    // winnow-marked window is a real duplicated window (same-hash
    // occurrences among the SELECTED subset are still content matches)
    val escaped = win.join(exact,
      win("doc_id") === exact("doc_id") &&
        win("span_start") >= exact("es") && win("span_end") <= exact("ee"),
      "left_anti")
    assert(escaped.isEmpty, s"winnowed spans outside exact spans: " +
      escaped.limit(5).collect().mkString(", "))
  }

  test("winnowing DETECTS every planted 150-char quote span (the >= w+k-1 guarantee)") {
    val k = 5
    val rep = ExactSubstr.report(realCorpus, "doc_id", "text",
      width = 40, every = k)
    val planted = rep.filter($"doc_id" >= 6000000L)
    assert(planted.count() > 0, "fixture must plant quotes")
    // first common fingerprint within the shared 150-run is selected by
    // gram-window [1..k] (pos <= k); the last interior gram window ends
    // by pos 150-40+1, so coverage >= [k, 150-40+1+40) - slack < 2k
    val weak = planted.filter($"dup_chars" < 150 - 2 * k)
    assert(weak.isEmpty,
      s"quote spans under-covered in winnowed mode: ${weak.limit(5).collect().mkString(", ")}")
  }

  test("winnowed mode cuts the window-row volume by ~2/(k+1)") {
    val d = realCorpus
    val all = d.select(explode(call_function("graft_char_windows",
      $"text", lit(40), lit(1)))).count()
    val sel = d.select(explode(call_function("graft_char_windows",
      $"text", lit(40), lit(5)))).count()
    assert(sel < all * 2 / 5 && sel > all / 10,
      s"winnowed row volume off: $sel of $all")
  }

  test("plan: no cartesian, partial aggregation on the hash key") {
    val p = ExactSubstr.report(realCorpus, "doc_id", "text", width = 40)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert("HashAggregate\\(.*partial".r.findAllIn(p).nonEmpty, p)
  }
}
