package graft.dedup

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toSeq.toDF("doc_id", "text")

  test("shingles: n-w+1 shingles, space-joined; short docs yield none") {
    val df = docs((1L, "a b c d e"), (2L, "a b"))
      .select(col("doc_id"), Shingles.shingles(col("text")).as("sh"))
    val m = df.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(m(1L) == Seq("a b c", "b c d", "c d e"))
    assert(m(2L).isEmpty)
  }

  test("exact jaccard on a crafted pair is 0.5") {
    val sets = docs((1L, "a b c d e"), (2L, "a b c d f"))
      .select(col("doc_id"), Shingles.shingleSet(col("text")).as("s"))
    val j = sets.as("x").join(sets.as("y"), col("x.doc_id") < col("y.doc_id"))
      .select(Shingles.jaccard(col("x.s"), col("y.s")).as("j"))
      .head().getDouble(0)
    assert(j == 0.5)
  }

  test("native shingle-set expression matches the HOF formulation exactly") {
    val texts = Seq(
      "a b c d e", "a b", "", "a b c d e", "one two three four",
      "a  b c d",          // double space => empty token, kept by split
      "a b c d ",          // trailing space => trailing empty token
      "héllo wörld ünïcode ßtraße multibyte",
      "x y z x y z x y z"  // repeated shingles => distinct collapses
    )
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val rows = df.select(
      Shingles.shingleSet(col("text")).as("native"),
      array_distinct(transform(Shingles.shingles(col("text")), s => xxhash64(s))).as("hof")
    ).collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), r)
    }
  }

  test("jaccard of two empty sets is null, not an ANSI divide-by-zero") {
    val j = docs((1L, "a"), (2L, "b")) // < 3 tokens => empty shingle sets
      .select(Shingles.shingleSet(col("text")).as("s"))
      .agg(collect_list(col("s")).as("ss"))
      .select(Shingles.jaccard(element_at(col("ss"), 1), element_at(col("ss"), 2)).as("j"))
      .head()
    assert(j.isNullAt(0))
  }

  test("keepFirst keeps exactly one deterministic representative per key") {
    val df = Seq(
      ("k1", 3L), ("k1", 1L), ("k1", 2L),
      ("k2", 9L), ("k3", 7L), ("k3", 8L)
    ).toDF("k", "id")
    val kept = ExactDedup.keepFirst(df, Seq("k"), Seq(col("id")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept == Map("k1" -> 1L, "k2" -> 9L, "k3" -> 7L))
  }

  test("duplicateGroups reports only keys occurring more than once") {
    val df = docs((1L, "same"), (2L, "same"), (3L, "unique"))
    val groups = ExactDedup.duplicateGroups(df, Seq("text"), "doc_id").collect()
    assert(groups.length == 1)
    assert(groups(0).getAs[Long]("n_copies") == 2L)
    assert(groups(0).getAs[Long]("kept_id") == 1L)
  }

  test("sourceOverlap counts distinct shared keys per unordered source pair") {
    val df = Seq(
      // "t1" in A, B, C (A also holds it twice — still ONE distinct key);
      // "t2" in A, B; "t3" only in C
      ("t1", "A"), ("t1", "A"), ("t1", "B"), ("t1", "C"),
      ("t2", "A"), ("t2", "B"),
      ("t3", "C")
    ).toDF("text", "source")
    val out = ExactDedup.sourceOverlap(df, Seq("text"), "source")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      ("A", "B") -> 2L, ("A", "C") -> 1L, ("B", "C") -> 1L))
    // pairs are emitted sorted (a < b) — no reversed duplicates
    assert(out.keySet.forall { case (a, b) => a < b })
  }

  test("minhash: identical texts get identical signatures") {
    val sigs = docs((1L, "w1 w2 w3 w4 w5 w6"), (2L, "w1 w2 w3 w4 w5 w6"))
      .select(MinHashDedup.signature(Shingles.shingleSet(col("text")), 16).as("sig"))
      .collect().map(_.getSeq[Long](0))
    assert(sigs(0) == sigs(1))
    assert(sigs(0).length == 16)
  }

  test("minhash LSH pipeline finds a planted near-dup pair, skips unrelated docs") {
    val base = (0 until 30).map(i => s"tok${i}a tok${i}b tok${i}c").mkString(" ")
    val nearDup = base.replace("tok5a", "tok5x") // one token of ~90 differs
    val unrelated = (0 until 30).map(i => s"other${i}a other${i}b other${i}c").mkString(" ")
    val pairs = MinHashDedup.nearDuplicatePairs(
      docs((1L, base), (2L, nearDup), (3L, unrelated)), "doc_id", "text", threshold = 0.5)
      .collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
    assert(pairs(0).getAs[Double]("jaccard") > 0.9)
  }

  test("incremental probe finds new-vs-corpus near-dups without re-pairing the corpus") {
    val base = (0 until 30).map(i => s"tok${i}a tok${i}b tok${i}c").mkString(" ")
    val other = (0 until 30).map(i => s"other${i}a other${i}b other${i}c").mkString(" ")
    val index = MinHashDedup.buildIndex(
      docs((1L, base), (2L, other)), "doc_id", "text")
    // new batch: one near-dup of corpus doc 1, one fresh doc
    val nearDup = base.replace("tok5a", "tok5x")
    val fresh = (0 until 30).map(i => s"fresh${i}a fresh${i}b fresh${i}c").mkString(" ")
    val hits = MinHashDedup.probe(
      docs((10L, nearDup), (11L, fresh)), index, "doc_id", "text", threshold = 0.5)
      .collect()
    assert(hits.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((10L, 1L)))
    assert(hits(0).getAs[Double]("jaccard") > 0.9)
  }

  test("extendIndex and probe inherit the BUILD's parameters, never defaults") {
    val base = (0 until 30).map(i => s"tok${i}a tok${i}b tok${i}c").mkString(" ")
    val other = (0 until 30).map(i => s"other${i}a other${i}b other${i}c").mkString(" ")
    // build under NON-default banding: postings made under the defaults
    // would live in a different hash space and never collide
    val index = MinHashDedup.buildIndex(docs((1L, base)), "doc_id", "text",
      shingleWidth = 5, bands = 16, rows = 8)
    assert(index.shingleWidth == 5 && index.bands == 16 && index.rows == 8)
    val grown = MinHashDedup.extendIndex(index, docs((2L, other)), "doc_id", "text")
    assert(grown.bands == 16 && grown.rows == 8 && grown.shingleWidth == 5)
    // a near-dup of the EXTENSION doc is findable only if the extension
    // indexed under the build's parameters (and the probe queries under
    // them too)
    val nearDup = other.replace("other5a", "other5x")
    val hits = MinHashDedup.probe(
      docs((10L, nearDup)), grown, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(hits == Seq((10L, 2L)), s"cross-space probe lost the pair: $hits")
  }

  test("simhash: identical texts at Hamming 0; nearPairs finds planted copies") {
    val fps = SimHash.fingerprints(
      docs((1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
        (3L, "epsilon zeta eta theta iota kappa")), "doc_id", "text")
    val pairs = SimHash.nearPairs(fps, "doc_id", maxDistance = 3).collect()
    assert(pairs.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L && r.getInt(2) == 0))
  }

  test("ngram jaccard exact pairs match the crafted similarity") {
    val pairs = NgramJaccard.similarPairs(
      docs((1L, "a b c d e"), (2L, "a b c d f"), (3L, "x y z w v")),
      "doc_id", "text", threshold = 0.4)
      .collect()
    assert(pairs.length == 1)
    assert(pairs(0).getAs[Double]("jaccard") == 0.5)
  }

  test("prefix-filtered jaccard equals the all-shingle exact join") {
    // random-ish word soup with planted overlaps: dense near-pair
    // structure so prefix completeness is exercised, not just planted
    // pairs. Differential at two thresholds against NgramJaccard —
    // whose own oracle is the naive all-pairs recompute.
    val words = Array("a", "b", "c", "d", "e", "f", "g", "h")
    val rows = (1L to 40L).map { i =>
      val txt = (0 until 12).map(j => words(((i * 7 + j * j + j) % 8).toInt)).mkString(" ")
      (i, if (i % 5 == 0) txt + " zz" + (i % 3) else txt)
    }
    val d = docs(rows: _*)
    for (t <- Seq(0.3, 0.5, 0.8)) {
      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(0), r.getLong(1), r.getDouble(2))
      val exact = NgramJaccard.similarPairs(d, "doc_id", "text", t).collect().map(key).toSet
      val pref = PrefixJaccard.similarPairs(d, "doc_id", "text", t).collect().map(key).toSet
      assert(pref == exact, s"threshold $t")
      assert(t > 0.7 || exact.nonEmpty, s"threshold $t found no pairs — test data too sparse")
    }
  }

  test("fp-boundary threshold keeps an exact-integer-ratio pair (t = 0.07)") {
    // 0.07 * 100 floats to 7.000000000000001: an unguarded ceil/size-ratio
    // computed one-too-strict and dropped this pair (J = 7/100 exactly)
    // from BOTH exact joins while the final jaccard filter would keep it.
    val words = (0 until 102).map(i => s"w$i")
    val d = docs(
      (1L, words.take(9).mkString(" ")),   // 7 shingles, all shared
      (2L, words.mkString(" ")))           // 100 shingles
    for (res <- Seq(
        NgramJaccard.similarPairs(d, "doc_id", "text", threshold = 0.07),
        PrefixJaccard.similarPairs(d, "doc_id", "text", threshold = 0.07))) {
      val rows = res.collect()
      assert(rows.length == 1 && rows(0).getAs[Double]("jaccard") == 0.07, rows.toSeq)
    }
  }

  test("prefix filtering cuts discovery shuffle on a boilerplate-heavy corpus") {
    // Every doc shares a boilerplate tail (one shingle with df = n): the
    // all-shingle join's posting list for it generates C(n,2) candidate
    // pairs, while the prefix join never touches it — each doc's prefix
    // holds its RAREST shingles. Same results, measured cheaper
    // discovery: the gate that justifies the operator's existence.
    val n = 120
    val rows = (1L to n.toLong).map { i =>
      val unique = (0 until 6).map(j => s"w${i}_$j").mkString(" ")
      (i, s"$unique common boiler plate tail text")
    } ++ Seq((9001L, "w1_0 w1_1 w1_2 w1_3 w1_4 w1_5 common boiler plate near dup"))
    val d = docs(rows: _*)
    def measure(f: => org.apache.spark.sql.DataFrame) = {
      val m = graft.MetricsProbe.measure(spark) { f.collect().toSet }
      (m.result, m.shuffleWriteBytes)
    }
    val (exact, exactBytes) = measure(NgramJaccard.similarPairs(d, "doc_id", "text", 0.4))
    val (pref, prefBytes) = measure(PrefixJaccard.similarPairs(d, "doc_id", "text", 0.4))
    assert(pref == exact)
    assert(exact.nonEmpty) // the planted near-dup pair must be found by both
    assert(prefBytes * 2 <= exactBytes,
      s"prefix discovery should shuffle <= half of all-shingle on boilerplate: " +
        s"prefix=$prefBytes exact=$exactBytes")
  }

  test("maxDf cap drops boilerplate shingles but keeps the rare-shingle pair") {
    // boilerplate shingle set "z1 z2 z3" shared by ALL FOUR docs (df=4);
    // docs 1/2 additionally share rare shingles (df=2)
    val boiler = "z1 z2 z3"
    val d = docs(
      (1L, s"a b c d e $boiler"), (2L, s"a b c d f $boiler"),
      (3L, s"p q r s t $boiler"), (4L, s"u v w x y $boiler"))
    // capped at 2: df-4 boilerplate shingles are dropped; 1-2 still found
    // via their rare shingles, similarity undercounted (never inflated)
    val capped = NgramJaccard.similarPairs(d, "doc_id", "text",
      threshold = 0.2, maxDf = 2).collect()
    assert(capped.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
    val exact = NgramJaccard.similarPairs(d, "doc_id", "text", threshold = 0.2)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getAs[Double]("jaccard"))).toMap
    val cappedJ = capped(0).getAs[Double]("jaccard")
    assert(cappedJ <= exact((1L, 2L)), "cap must only undercount similarity")
  }

  test("uncapped maxDf on a large input warns; capped or small inputs stay quiet") {
    val big = NgramJaccard.UncappedWarnBytes * 2
    val small = NgramJaccard.UncappedWarnBytes / 2
    val warn = NgramJaccard.uncappedWarning(big, Int.MaxValue)
    assert(warn.exists(_.contains("maxDf")), warn)
    assert(NgramJaccard.uncappedWarning(big, 1000).isEmpty)     // capped: fine
    assert(NgramJaccard.uncappedWarning(small, Int.MaxValue).isEmpty) // small: fine
  }

  test("overlapVerdict: fraction threshold, zero-overlap rows present, short docs safe") {
    // w=2 shingles. Benchmark doc: "x1 x2 x3" → shingles {x1 x2, x2 x3}.
    // Doc 1: 10 distinct shingles, one shared ("x1 x2") → 0.1 ≥ 0.1:
    // contaminated at the boundary (>=). Doc 2: nothing shared → row
    // present, verdict false. Doc 3: shorter than w → zeros, false.
    val corpus = docs(
      (1L, "x1 x2 a b c d e f g h i"),
      (2L, "p q r s"),
      (3L, "z"))
    val bench = docs((100L, "x1 x2 x3"))
    val got = Contamination
      .overlapVerdict(corpus, bench, "doc_id", "text", w = 2, minOverlap = 0.1)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))
    assert(got.toSeq == Seq(
      (1L, 10L, 1L, 0.1, true),
      (2L, 3L, 0L, 0.0, false),
      (3L, 0L, 0L, 0.0, false)))
  }
}
