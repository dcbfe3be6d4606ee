package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CrossDocNgramsSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toSeq.toDF("doc_id", "text")

  private def statRows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))

  test("hand-computed corpus: shared grams counted with multiplicity") {
    // w=2 grams: doc 1 = [a b, b c, c d]; doc 2 = [a b, b c, x y];
    // doc 3 = [a b, a b, b q] (the repeated "a b" counts twice in
    // n_dup_occ but once in n_dup_distinct); doc 4 = [p q, q r] shares
    // nothing; doc 5 is shorter than w and reports zeros.
    val out = CrossDocNgrams.stats(
      docs(
        (1L, "a b c d"),
        (2L, "a b c x y"),
        (3L, "a b a b q"),
        (4L, "p q r"),
        (5L, "z")),
      "doc_id", "text", w = 2)
    assert(statRows(out).toSeq == Seq(
      (1L, 3L, 2L, 2L, 0.666667), // a b + b c shared
      (2L, 4L, 2L, 2L, 0.5),      // "a b" + "b c" shared; "c x", "x y" unique
      (3L, 4L, 2L, 1L, 0.5),      // a b twice; "b a", "b q" unique
      (4L, 2L, 0L, 0L, 0.0),
      (5L, 0L, 0L, 0L, 0.0)))
  }

  test("minDocs raises the sharing bar") {
    // "a b" appears in 3 docs, "b c" in 2 — at minDocs=3 only "a b"
    // stays shared.
    val out = CrossDocNgrams.stats(
      docs((1L, "a b c"), (2L, "a b c"), (3L, "a b x")),
      "doc_id", "text", w = 2, minDocs = 3)
    assert(statRows(out).toSeq == Seq(
      (1L, 2L, 1L, 1L, 0.5),
      (2L, 2L, 1L, 1L, 0.5),
      (3L, 2L, 1L, 1L, 0.5)))
  }

  test("hash-keyed scale mode is identical to string-keyed mode on real testdata") {
    val d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val str = CrossDocNgrams.stats(d, "doc_id", "text", w = 8, hashKeys = false)
    val hsh = CrossDocNgrams.stats(d, "doc_id", "text", w = 8, hashKeys = true)
    assert(str.exceptAll(hsh).isEmpty && hsh.exceptAll(str).isEmpty)
    // The signal is non-trivial on this corpus: some docs share, some don't.
    val n = str.filter(col("n_dup_occ") > 0).count()
    assert(n > 0 && n < str.count())
  }

  test("trim: hand-computed run semantics, boundaries, minRun, full wipe") {
    // w=2, minRun=2. Docs 1 and 2 share the 5-token run "a b c d e":
    // shared gram positions 0..3 (4 consecutive ≥ 2) cover tokens
    // [0, 3+2-1=4] — the run plus nothing else. Doc 3 shares only the
    // single gram "a b" with the others (run length 1 < minRun → kept
    // whole). Doc 4 = doc 1 verbatim → wiped to empty. Doc 5 short.
    val out = CrossDocNgrams.trim(
      docs(
        (1L, "a b c d e tail1 one"),
        (2L, "head2 a b c d e tail2"),
        (3L, "a b x4 y4 z4"),
        (4L, "a b c d e tail1 one"),
        (5L, "z")),
      "doc_id", "text", w = 2, minDocs = 2, minRun = 2)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, "", 7L, 7L),                // doc4 is a verbatim copy: all 6 grams shared
      (2L, "head2 tail2", 7L, 5L),     // interior run cut, boundaries kept
      (3L, "a b x4 y4 z4", 5L, 0L),    // single shared gram < minRun
      (4L, "", 7L, 7L),
      (5L, "z", 1L, 0L)))
  }

  test("trim: minRun=1 removes single shared grams; hash mode ≡ string mode on testdata") {
    val single = CrossDocNgrams.trim(
      docs((1L, "p q r s"), (2L, "x q r y")),
      "doc_id", "text", w = 2, minDocs = 2, minRun = 1)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
    // only gram "q r" is shared: tokens [1,2] cut from both docs
    assert(single.toSeq == Seq((1L, "p s", 2L), (2L, "x y", 2L)))

    val d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val str = CrossDocNgrams.trim(d, "doc_id", "text", w = 8, minRun = 2, hashKeys = false)
    val hsh = CrossDocNgrams.trim(d, "doc_id", "text", w = 8, minRun = 2, hashKeys = true)
    assert(str.exceptAll(hsh).isEmpty && hsh.exceptAll(str).isEmpty)
    val trimmed = str.filter(col("n_removed") > 0).count()
    assert(trimmed > 0 && trimmed < str.count())
  }

  test("dropWorst keeps exactly the docs under the shared-fraction bar") {
    val d = docs(
      (1L, "a b c d e"),  // dup_frac 1.0 (all grams shared with doc 2)
      (2L, "a b c d e"),
      (3L, "a b n3 m3 k3"), // 1 of 4 grams shared = 0.25
      (4L, "u v w x y"))    // 0.0
    val kept = CrossDocNgrams.dropWorst(d, "doc_id", "text", w = 2, maxDupFrac = 0.5)
      .select("id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(3L, 4L))
  }

  test("plan: partial aggregation everywhere, no cartesian, codegen'd gram explode") {
    val d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val p = CrossDocNgrams.stats(d, "doc_id", "text", w = 8, hashKeys = true)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // Both keyed aggregations must partial-aggregate (map-side combine
    // collapses hot grams before the shuffle).
    assert("HashAggregate\\(.*partial".r.findAllIn(p).size >= 2, p)
  }
}
