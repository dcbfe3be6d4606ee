package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("curation pipeline: counts are monotone, each guarantee holds on the output") {
    val docs = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    // plant an exact duplicate so stage 2 provably fires
    val withDup = docs.select(col("doc_id"), col("text"))
      .unionByName(docs.select((col("doc_id") + 500000).as("doc_id"), col("text"))
        .filter(col("doc_id") % 50 === 0))
    val bench = docs.filter(col("doc_id") % 25 === 0).select(col("doc_id"), col("text"))
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id").as("doc_id"), col("embedding"))

    val (chunks, r) = Curation.run(
      withDup, "doc_id", "text",
      benchmark = Some(bench),
      embeddings = Some(emb), semanticThreshold = 0.45,
      minQuality = 0.5, neardupThreshold = 0.5,
      sampleFraction = 0.8, maxTokens = 64)

    // monotone narrowing through every stage
    assert(r.input_docs >= r.after_quality)
    assert(r.after_quality >= r.after_exact_dedup)
    assert(r.after_exact_dedup >= r.after_neardup)
    assert(r.after_neardup >= r.after_semantic)
    assert(r.after_semantic >= r.after_decontam)
    assert(r.after_decontam >= r.after_sample)
    // the planted embedding near-dups (cosine band 0.45-0.51 exists at
    // sf0.001) collapse in the semantic stage unless their text twin was
    // already deduped
    assert(r.after_semantic < r.after_neardup, r.toString)
    assert(r.after_sample > 0, r.toString)
    // the planted exact duplicates were collapsed
    assert(r.after_exact_dedup < r.after_quality || r.input_docs == r.after_quality,
      r.toString)

    val out = chunks.collect()
    assert(out.length == r.chunks)
    assert(out.forall(_.n_tokens <= 64))

    // survivors carry no near-duplicate pair at the threshold
    val survivors = out.map(c => c.doc_id -> "").toMap // ids only
    val survivorDocs = withDup.filter(col("doc_id").isin(survivors.keys.toSeq: _*))
    val residualPairs = graft.dedup.NgramJaccard.similarPairs(
      survivorDocs, "doc_id", "text", threshold = 0.5).count()
    assert(residualPairs == 0, "near-duplicate pair survived curation")

    // determinism: the same inputs yield the same report
    val (_, r2) = Curation.run(withDup, "doc_id", "text",
      benchmark = Some(bench),
      embeddings = Some(emb), semanticThreshold = 0.45,
      minQuality = 0.5, neardupThreshold = 0.5,
      sampleFraction = 0.8, maxTokens = 64)
    assert(r2 == r)

    // durable mode (parquet stage boundaries + observe-counted writes)
    // must produce the identical report and chunk set, leave every stage
    // on disk, and keep the result readable after the frames' lineage
    // source files are the checkpoint itself (fault-tolerant boundary).
    val ckpt = java.nio.file.Files.createTempDirectory("curation_ckpt").toString
    try {
      val (chunksD, rd) = Curation.run(withDup, "doc_id", "text",
        benchmark = Some(bench),
        embeddings = Some(emb), semanticThreshold = 0.45,
        minQuality = 0.5, neardupThreshold = 0.5,
        sampleFraction = 0.8, maxTokens = 64,
        checkpointDir = Some(ckpt))
      assert(rd == r, s"durable report differs: $rd vs $r")
      val outD = chunksD.collect().map(c => (c.doc_id, c.chunk_idx, c.text, c.n_tokens))
      assert(outD.sorted.sameElements(
        out.map(c => (c.doc_id, c.chunk_idx, c.text, c.n_tokens)).sorted))
      for (stage <- Seq("quality", "exact_dedup", "neardup", "semantic",
          "decontam", "sampled", "chunks")) {
        assert(new java.io.File(s"$ckpt/$stage").isDirectory, s"missing stage dir $stage")
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(ckpt))
    }
  }

  test("span-trim stage: shared runs leave the text, doc count unchanged, report counts trimmed docs") {
    // Two docs sharing an interior 10-token run (w=8 → 3 consecutive
    // shared grams ≥ minRun=2) plus distinct padding long enough to pass
    // the quality gate but dissimilar enough (Jaccard « 0.5) to survive
    // both dedup stages.
    def words(tag: String, n: Int) =
      (1 to n).map(i => s"$tag$i word$tag$i").mkString(" ")
    val shared = "the quick brown fox jumps over the lazy sleeping dog"
    val d = Seq(
      (1L, s"${words("a", 12)} $shared ${words("b", 12)}"),
      (2L, s"${words("c", 12)} $shared ${words("d", 12)}"),
      (3L, words("e", 30))).toDF("doc_id", "text")

    val (chunks, r) = Curation.run(d, "doc_id", "text", spanTrimMinRun = Some(2))
    assert(r.after_sample == 3L, r.toString)       // trim never drops docs
    assert(r.spans_trimmed == 2L, r.toString)      // both sharers lost the run
    val texts = chunks.collect().groupBy(_.doc_id)
      .view.mapValues(_.sortBy(_.chunk_idx).map(_.text).mkString(" ")).toMap
    assert(!texts(1L).contains("quick brown"), texts(1L))
    assert(!texts(2L).contains("quick brown"), texts(2L))
    assert(texts(3L).nonEmpty)

    // off by default: report field stays 0 and text is untouched
    val (chunks0, r0) = Curation.run(d, "doc_id", "text")
    assert(r0.spans_trimmed == 0L)
    assert(chunks0.collect().exists(_.text.contains("quick brown")))
  }

  test("line-dedup stage: chrome lines die FIRST, doc count unchanged, report counts affected docs") {
    // Every doc shares a boilerplate line; each also carries a unique
    // prose line long and diverse enough to pass quality and dedup.
    def prose(tag: String) =
      (1 to 30).map(i => s"$tag$i word$tag$i").mkString(" ")
    val chrome = "subscribe to our newsletter today"
    val d = Seq(
      (1L, s"$chrome\n${prose("a")}"),
      (2L, s"$chrome\n${prose("b")}"),
      (3L, s"$chrome\n${prose("c")}"),
      (4L, prose("d"))).toDF("doc_id", "text")

    val (chunks, r) = Curation.run(d, "doc_id", "text",
      lineDedupMaxFreq = Some(2L))
    assert(r.input_docs == 4L, r.toString)     // line dedup never drops docs
    assert(r.lines_deduped == 3L, r.toString)  // the three chrome carriers
    assert(r.after_sample == 4L, r.toString)
    val texts = chunks.collect().groupBy(_.doc_id)
      .view.mapValues(_.sortBy(_.chunk_idx).map(_.text).mkString(" ")).toMap
    assert(texts.values.forall(!_.contains("subscribe to our newsletter")), texts)
    assert(texts(4L).contains("d1 wordd1"))

    // off by default
    val (chunks0, r0) = Curation.run(d, "doc_id", "text")
    assert(r0.lines_deduped == 0L)
    assert(chunks0.collect().exists(_.text.contains("subscribe")))
  }

  test("blocklist stage: phrase carriers drop before quality, cap counts total hits, off = -1") {
    def prose(tag: String) =
      (1 to 30).map(i => s"$tag$i word$tag$i").mkString(" ")
    val bad = "winning lottery guaranteed"
    val d = Seq(
      (1L, s"${prose("a")} $bad"),
      (2L, prose("b")),
      (3L, s"$bad ${prose("c")} $bad"),
      (4L, prose("d"))).toDF("doc_id", "text")
    val pats = Seq((7L, bad))

    // zero tolerance: both carriers die, clean docs flow through
    val (_, r0) = Curation.run(d, "doc_id", "text",
      blocklist = pats, blocklistMaxHits = 0L)
    assert(r0.input_docs == 4L, r0.toString)
    assert(r0.after_blocklist == 2L, r0.toString)
    assert(r0.after_quality <= r0.after_blocklist, r0.toString)

    // cap = 1: the single-hit doc stays, the double-hit doc dies
    val (_, r1) = Curation.run(d, "doc_id", "text",
      blocklist = pats, blocklistMaxHits = 1L)
    assert(r1.after_blocklist == 3L, r1.toString)

    // off by default: report field is the -1 sentinel
    val (_, rOff) = Curation.run(d, "doc_id", "text")
    assert(rOff.after_blocklist == -1L, rOff.toString)
  }

  test("substr-scrub stage: corpus-duplicated char spans leave the text, doc count unchanged") {
    def prose(tag: String) =
      (1 to 30).map(i => s"$tag$i word$tag$i").mkString(" ")
    // a 62-char verbatim run (license-header shape) shared by two docs
    // whose padding keeps their Jaccard well under the dedup threshold
    val license = "Licensed under the Apache License Version 2 point 0 the License"
    val d = Seq(
      (1L, s"${prose("a")} $license"),
      (2L, s"$license ${prose("b")}"),
      (3L, prose("c"))).toDF("doc_id", "text")

    val (chunks, r) = Curation.run(d, "doc_id", "text",
      substrScrubWidth = Some(40))
    assert(r.after_sample == 3L, r.toString)      // scrub never drops docs
    assert(r.substr_scrubbed == 2L, r.toString)   // both sharers lost the run
    val texts = chunks.collect().groupBy(_.doc_id)
      .view.mapValues(_.sortBy(_.chunk_idx).map(_.text).mkString(" ")).toMap
    assert(!texts(1L).contains("Apache License"), texts(1L))
    assert(!texts(2L).contains("Apache License"), texts(2L))
    assert(texts(1L).contains("a1 worda1"), texts(1L))
    assert(texts(3L).contains("c1 wordc1"))

    // off by default: field stays 0 and the run survives
    val (chunks0, r0) = Curation.run(d, "doc_id", "text")
    assert(r0.substr_scrubbed == 0L)
    assert(chunks0.collect().exists(_.text.contains("Apache License")))
  }

  test("hygiene stage: NFD/mojibake twins collapse in exact dedup; off by default") {
    // three encodings of the same document: composed, NFD-decomposed,
    // CP1252-mojibake — with normalizeText they are ONE exact-dedup group
    val composed = "clean prose words here caf\u00e9 and more prose tail"
    val nfd = "clean prose words here cafe\u0301 and more prose tail"
    val moji = "clean prose words here caf\u00c3\u00a9 and more prose tail"
    val d = Seq((1L, composed), (2L, nfd), (3L, moji), (4L, "a different doc entirely with its own words"))
      .toDF("doc_id", "text")
    val (_, r) = Curation.run(d, "doc_id", "text",
      minQuality = 0.0, neardupThreshold = 1.01, normalizeText = true)
    assert(r.input_docs == 4L, r.toString)
    assert(r.texts_normalized == 2L, r.toString) // nfd + moji rewritten
    assert(r.after_exact_dedup == 2L, r.toString) // one group + the other doc
    // off by default: the corrupted twins survive as distinct texts
    val (_, r0) = Curation.run(d, "doc_id", "text",
      minQuality = 0.0, neardupThreshold = 1.01)
    assert(r0.texts_normalized == 0L)
    assert(r0.after_exact_dedup == 4L, r0.toString)
  }

  test("language filter is pluggable: marker heuristic and trained char-n-gram model") {
    val d = Seq(
      (1L, "the good people know that they have been with the world and the people want the good"),
      (2L, "der und nicht sich auch wenn aber nach wird beim doch jetzt der und nicht sich auch"),
      (3L, "les une dans pour avec vous mais nous comme bien sans leurs les une dans pour avec"))
      .toDF("doc_id", "text")
    // marker-word heuristic plugged in
    val (_, rm) = Curation.run(d, "doc_id", "text", minQuality = 0.0,
      neardupThreshold = 1.01,
      langIdFn = Some(TextAnalysis.langId(_)), keepLangs = Seq("en", "de"))
    assert(rm.after_lang == 2L, rm.toString)
    assert(rm.after_sample == 2L, rm.toString)
    // trained char-n-gram model plugged into the SAME hook
    val labeled = Seq(("en", "the good people know that they have been with the world"),
      ("de", "der und nicht sich auch wenn aber nach wird beim doch jetzt"),
      ("fr", "les une dans pour avec vous mais nous comme bien sans leurs"))
      .toDF("lang", "text")
    val model = CharNgramLangId.train(labeled, "text", "lang")
    val (_, rt) = Curation.run(d, "doc_id", "text", minQuality = 0.0,
      neardupThreshold = 1.01,
      langIdFn = Some(model.predict(_)), keepLangs = Seq("fr"))
    assert(rt.after_lang == 1L, rt.toString)
    // off by default
    val (_, r0) = Curation.run(d, "doc_id", "text", minQuality = 0.0,
      neardupThreshold = 1.01)
    assert(r0.after_lang == -1L)
  }
}
