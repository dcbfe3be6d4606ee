package graft.dedup

import graft.SparkSpec

class LineDedupSpec extends SparkSpec {
  import spark.implicits._

  test("drops lines above the bar, keeps order, rebuilds empty docs as ''") {
    // 'chrome' appears 3x, 'shared' 2x, prose lines once each
    val docs = Seq(
      (1L, "chrome\nalpha prose one\nshared\nbeta prose one"),
      (2L, "chrome\nalpha prose two\nshared"),
      (3L, "chrome")
    ).toDF("id", "text")
    val out = LineDedup.dedup(docs, "id", "text", maxFreq = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    // maxFreq = 2: 'chrome' (3) dropped; 'shared' (2) at the bar, kept
    assert(out(1L) == (("alpha prose one\nshared\nbeta prose one", 3L, 1L)))
    assert(out(2L) == (("alpha prose two\nshared", 2L, 1L)))
    assert(out(3L) == (("", 0L, 1L))) // every line dropped: empty rebuild
  }

  test("threshold boundary: maxFreq = 1 keeps only corpus-unique lines") {
    val docs = Seq(
      (1L, "dup\nunique a"),
      (2L, "dup\nunique b")
    ).toDF("id", "text")
    val out = LineDedup.dedup(docs, "id", "text", maxFreq = 1)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "unique a", 2L -> "unique b"))
  }

  test("order restoration survives shuffled aggregation on many lines") {
    val text = (0 until 50).map(i => s"line number $i of doc").mkString("\n")
    val docs = Seq((1L, text)).toDF("id", "text")
    val out = LineDedup.dedup(docs, "id", "text", maxFreq = 5)
      .head().getString(1)
    assert(out == text) // all unique → byte-identical rebuild
  }

  test("keepFirst: earliest (id, pos) occurrence survives, all later die") {
    val docs = Seq(
      (2L, "shared para\nunique two"),
      (1L, "unique one\nshared para\nshared para"),
      (3L, "shared para")
    ).toDF("id", "text")
    val out = LineDedup.keepFirst(docs, "id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    // doc 1 carries the corpus-first 'shared para' (id=1, pos=1); its own
    // second copy (pos=2) and every other doc's copy die
    assert(out(1L) == (("unique one\nshared para", 2L, 1L)))
    assert(out(2L) == (("unique two", 1L, 1L)))
    assert(out(3L) == (("", 0L, 1L)))
  }

  test("NULL-text documents survive dedup and keepFirst as empty documents") {
    // regression (ADVICE r11): split(NULL) is NULL and a bare posexplode
    // silently dropped the whole document; the contract is one output row
    // per input document, NULL treated as "" (one empty line)
    val docs = Seq[(java.lang.Long, String)](
      (1L, "real prose line\nanother unique line"),
      (2L, null),
      (3L, null)
    ).toDF("id", "text")
    val d = LineDedup.dedup(docs, "id", "text", maxFreq = 5)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(d.keySet == Set(1L, 2L, 3L))
    assert(d(2L) == (("", 1L, 0L))) // the synthesized empty line, kept
    assert(d(3L) == (("", 1L, 0L)))
    assert(d(1L) == (("real prose line\nanother unique line", 2L, 0L)))
    val k = LineDedup.keepFirst(docs, "id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(k.keySet == Set(1L, 2L, 3L))
    // the corpus-first "" occurrence (id=2, pos=0) survives; id=3's dies
    assert(k(2L) == (("", 1L, 0L)))
    assert(k(3L) == (("", 0L, 1L)))
  }

  test("a pile of NULL docs must not push '' over the bar (ADVICE r12)") {
    // 4 NULL docs synthesize 4 "" placeholder lines; if they counted,
    // freq("") = 5 > maxFreq = 3 and the REAL blank separator in doc 1
    // would drop corpus-wide, collapsing "a\n\nb" → "a\nb"
    val docs = Seq[(java.lang.Long, String)](
      (1L, "alpha prose here\n\nbeta prose here"),
      (2L, null), (3L, null), (4L, null), (5L, null)
    ).toDF("id", "text")
    val out = LineDedup.dedup(docs, "id", "text", maxFreq = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == (("alpha prose here\n\nbeta prose here", 3L, 0L)))
    assert(out(2L) == (("", 1L, 0L))) // placeholder kept, never dropped
  }

  test("counting is by occurrences, not documents") {
    // 'rep' occurs 3 times in ONE doc: occurrences 3 > maxFreq 2 → dropped
    val docs = Seq((1L, "rep\nrep\nrep\nkeep me here")).toDF("id", "text")
    val out = LineDedup.dedup(docs, "id", "text", maxFreq = 2)
      .head()
    assert(out.getString(1) == "keep me here")
    assert(out.getLong(3) == 3L)
  }
}
