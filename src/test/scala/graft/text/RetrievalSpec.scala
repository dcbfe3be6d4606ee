package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantics + plan gates for Retrieval (q133/q134). */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    // d1 and d2 have identical length; 'rare' appears only in d1 while
    // 'common' is corpus-wide — BM25 and TF-IDF must both prefer the
    // rare term / the rare-term doc.
    (1L, "rare filler filler filler"),
    (2L, "common filler filler filler"),
    (3L, "common filler filler stuff"),
    (4L, "common stuff filler words"),
    (5L, "common words stuff filler")
  ).toDF("doc_id", "text")

  test("bm25: a rare-term hit outscores a common-term hit at equal tf and dl") {
    val scores = Retrieval
      .bm25(corpus, "doc_id", "text", Seq("rare", "common"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores(1L) > scores(2L),
      s"rare-term doc should outrank: $scores")
    assert(scores.values.forall(_ > 0.0), s"BM25 idf+1 form must stay positive: $scores")
  }

  test("bm25: higher tf raises the score, sublinearly (saturation)") {
    val docs = Seq(
      (1L, "term x x x x x x x"),
      (2L, "term term x x x x x x"),
      (3L, "term term term term x x x x")
    ).toDF("doc_id", "text")
    val s = Retrieval.bm25(docs, "doc_id", "text", Seq("term"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(s(1L) < s(2L) && s(2L) < s(3L), s"tf monotone: $s")
    // Saturation: the 1→2 jump exceeds the 2→4 jump per extra occurrence.
    assert((s(2L) - s(1L)) > (s(3L) - s(2L)) / 2, s"tf saturates: $s")
  }

  test("bm25TopK is deterministic and caps at k") {
    val docs = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val a = Retrieval.bm25TopK(docs, "doc_id", "text",
      Seq("spark", "vector", "window", "dup"), k = 10).collect().toSeq
    val b = Retrieval.bm25TopK(docs, "doc_id", "text",
      Seq("spark", "vector", "window", "dup"), k = 10).collect().toSeq
    assert(a == b)
    assert(a.length == 10)
  }

  test("tfidf keywords: the distinguishing term ranks first, ranks are 1..k") {
    val out = Retrieval.tfidfKeywords(corpus, "doc_id", "text", k = 2)
    val top = out.filter(col("rank") === 1)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(top(1L) == "rare", s"doc 1 top keyword: $top")
    val ranks = out.groupBy("doc_id")
      .agg(collect_set(col("rank")).as("rs"))
      .collect().map(_.getSeq[Int](1).sorted.toSeq).toSet
    assert(ranks == Set(Seq(1, 2)), s"every doc gets ranks 1..2: $ranks")
  }

  test("plans: tfidf window is doc-partitioned (no SinglePartition), bm25 stats broadcast") {
    val docs = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val pTfidf = Retrieval.tfidfKeywords(docs, "doc_id", "text", k = 3)
      .queryExecution.executedPlan.toString
    // The window must ride a doc_id hash partitioning (the only
    // SinglePartition allowed is the 1-row corpus-count scalar), and the
    // row_number()<=k filter must push into WindowGroupLimit so each
    // partition keeps k rows instead of ranking the full (doc, term)
    // frame through the shuffle.
    assert(pTfidf.contains("Exchange hashpartitioning(doc_id"), pTfidf)
    assert(pTfidf.contains("WindowGroupLimit"), pTfidf)
    val windowOnSingle = pTfidf.linesIterator.exists(l =>
      l.contains("Window") && l.contains("SinglePartition"))
    assert(!windowOnSingle, pTfidf)
    val pBm = Retrieval.bm25(docs, "doc_id", "text", Seq("spark", "dup"))
      .queryExecution.executedPlan.toString
    // The |Q|-row df frame and 1-row stats frame must broadcast — a
    // sort-merge there shuffles the corpus against a kilobyte side.
    assert(pBm.contains("BroadcastHashJoin") || pBm.contains("BroadcastNestedLoopJoin"), pBm)
  }
}
