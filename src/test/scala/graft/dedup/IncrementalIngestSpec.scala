package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IncrementalIngestSpec extends SparkSpec {
  import spark.implicits._

  // Corpus: two dissimilar documents.
  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy sleeping dog tonight again"),
    (2L, "pack my box with five dozen liquor jugs before the morning train")
  ).toDF("doc_id", "text")

  // Batch kill paths, one of each:
  //  10 — exact copy of corpus doc 1            → dies at the corpus probe
  //  11 — novel text                            → survives
  //  12 — exact copy of 11                      → dies at intra-batch EXACT dedup
  //  13 — near-dup of 11 (last of 12 words
  //       differs: 9 shared of 11 distinct
  //       trigrams, Jaccard 9/11 ≈ 0.82)        → dies at intra-batch NEAR dedup
  //  14 — near-dup of corpus doc 2 (one word
  //       appended: Jaccard 10/11 ≈ 0.91)       → dies at the corpus probe
  private val novel =
    "colorless green ideas sleep furiously while seven untranslatable words drift past midnight"
  private val batch = Seq(
    (10L, "the quick brown fox jumps over the lazy sleeping dog tonight again"),
    (11L, novel),
    (12L, novel),
    (13L, novel.replace("midnight", "noon")),
    (14L, "pack my box with five dozen liquor jugs before the morning train arrives")
  ).toDF("doc_id", "text")

  private def index = MinHashDedup.buildIndex(corpus, "doc_id", "text")

  test("survivors: every kill path fires; only the novel doc gets in") {
    val out = IncrementalIngest.survivors(index, batch, "doc_id", "text", threshold = 0.5)
      .select("doc_id").as[Long].collect().toSeq
    assert(out == Seq(11L))
  }

  test("report counts each stage's removals") {
    val r = IncrementalIngest.report(index, batch, "doc_id", "text", threshold = 0.5)
      .collect().head
    assert(r.getAs[Long]("n_batch") == 5L)
    assert(r.getAs[Long]("n_after_exact") == 4L) // 12 dies (copy of 11)
    assert(r.getAs[Long]("n_after_intra") == 3L) // 13 dies (near-dup of 11)
    assert(r.getAs[Long]("n_survivors") == 1L)   // 10 and 14 die at the probe
  }

  test("an empty batch yields an empty survivor set and a zero report") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(IncrementalIngest.survivors(index, empty, "doc_id", "text").count() == 0L)
    val r = IncrementalIngest.report(index, empty, "doc_id", "text").collect().head
    assert((0 to 3).forall(i => r.getLong(i) == 0L))
  }

  test("sub-shingle-width texts still dedup exactly against corpus and batch") {
    // 2-token texts have EMPTY 3-shingle sets — invisible to the banded
    // probe — so only the exact text-hash stage keeps them out.
    val shortCorpus = corpus.unionByName(Seq((3L, "hello world")).toDF("doc_id", "text"))
    val idx = MinHashDedup.buildIndex(shortCorpus, "doc_id", "text")
    val shortBatch = Seq(
      (30L, "hello world"),  // exact copy of a SHORT corpus doc → dies
      (31L, "goodbye moon"), // novel short doc → survives
      (32L, "goodbye moon")  // exact intra-batch copy → dies
    ).toDF("doc_id", "text")
    val out = IncrementalIngest.survivors(idx, shortBatch, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSeq
    assert(out == Seq(31L))
  }

  test("cycle closes: survivors merged into the corpus kill their own re-uploads") {
    val grown = corpus.unionByName(
      IncrementalIngest.survivors(index, batch, "doc_id", "text"))
    val reupload = Seq((20L, novel)).toDF("doc_id", "text")
    val next = IncrementalIngest.survivors(
      MinHashDedup.buildIndex(grown, "doc_id", "text"), reupload, "doc_id", "text")
    assert(next.count() == 0L, "the second upload of a kept doc must be rejected")
  }

  test("extendIndex: a later batch's copy of an EARLIER batch's survivor dies") {
    // rolling semantics (q231): batch 1 admits the novel doc; the grown
    // index must kill batch 2's exact copy AND near-dup of it — a fixed
    // index (the q80 shape) lets both through
    val batch1 = Seq((30L, novel)).toDF("doc_id", "text")
    val batch2 = Seq(
      (40L, novel),                             // exact copy of 30's text
      (41L, novel.replace("midnight", "noon")), // near-dup of it
      (42L, "entirely different words fill this second batch document nicely today")
    ).toDF("doc_id", "text")
    val (surv1, c1) = IncrementalIngest.cycle(index, batch1, "doc_id", "text")
    assert(c1.toSeq == Seq(1L, 1L, 1L, 1L))
    val grown = MinHashDedup.extendIndex(index, surv1, "doc_id", "text")
    val rolling = IncrementalIngest.survivors(grown, batch2, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSeq.sorted
    assert(rolling == Seq(42L), s"grown index must kill 40 and 41: $rolling")
    // differential: the FIXED index admits the copy — the rolling
    // extension is what changes the answer
    val fixed = IncrementalIngest.survivors(index, batch2, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSeq.sorted
    assert(fixed == Seq(40L, 42L), s"fixed index baseline moved: $fixed")
    // the grown NEAR path in isolation (above, 41 dies intra-batch to 40
    // first): a solo near-dup batch is killed ONLY by the extension
    val batch3 = Seq((50L, novel.replace("midnight", "dawn"))).toDF("doc_id", "text")
    assert(IncrementalIngest.survivors(grown, batch3, "doc_id", "text").count() == 0L)
    assert(IncrementalIngest.survivors(index, batch3, "doc_id", "text").count() == 1L)
  }

  test("cycleWithExtension's extension ≡ a fresh buildIndex over the survivors") {
    // the probe-index reuse (no second shingle pass) must be
    // frame-identical to the old cycle(...)+extension(index, surv, ...)
    // sequence on all three index components
    val (surv, c, ext) = IncrementalIngest.cycleWithExtension(
      index, batch, "doc_id", "text")
    assert(c.toSeq == Seq(5L, 4L, 3L, 1L))
    val rebuilt = MinHashDedup.extension(index, surv, "doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    assert(rows(ext.buckets) == rows(rebuilt.buckets))
    assert(rows(ext.sets) == rows(rebuilt.sets))
    assert(rows(ext.textHashes) == rows(rebuilt.textHashes))
    assert((ext.shingleWidth, ext.bands, ext.rows) ==
      (rebuilt.shingleWidth, rebuilt.bands, rebuilt.rows))
    // and the extended index behaves identically downstream: a re-upload
    // of the survivor dies under extendWith(ext) exactly as it did
    // under extendIndex(surv)
    val grown = MinHashDedup.extendWith(index, ext)
    val reupload = Seq((60L, novel)).toDF("doc_id", "text")
    assert(IncrementalIngest.survivors(grown, reupload, "doc_id", "text").count() == 0L)
  }

  test("checkpoint-resumed AvailableNow drains see only files staged since the last run") {
    // the q232 stream-rolling contract: shard files arrive over time and
    // each drain RESUMES from the shared checkpoint, so batch k contains
    // exactly the one newly staged file — a Spark source-offset behavior
    // the rolling ledger's determinism rests on; pin it here so an
    // upgrade that re-delivers or reorders fails a named spec, not as an
    // opaque q232 oracle mismatch
    import org.apache.spark.sql.streaming.Trigger
    val root = java.nio.file.Files.createTempDirectory("graft-resume-spec-").toFile
    try {
      val inDir = new java.io.File(root, "in"); inDir.mkdirs()
      val seen = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
      (0 until 3).foreach { k =>
        val tmp = new java.io.File(root, s"tmp_$k").getAbsolutePath
        Seq((k.toLong, s"file $k payload")).toDF("doc_id", "text")
          .coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
        java.nio.file.Files.move(part.toPath,
          new java.io.File(inDir, f"f-$k%04d.parquet").toPath)
        val q = spark.readStream.schema("doc_id LONG, text STRING")
          .format("parquet").load(inDir.getAbsolutePath)
          .writeStream
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
            if (!b.isEmpty) {
              val sp = b.sparkSession; import sp.implicits._
              seen.synchronized {
                seen += b.select("doc_id").as[Long].collect().toSeq.sorted: Unit
              }
            }
          }
          .option("checkpointLocation", new java.io.File(root, "ckpt").getAbsolutePath)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      assert(seen.toSeq == Seq(Seq(0L), Seq(1L), Seq(2L)),
        s"resume must deliver exactly the newly staged file per drain: $seen")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(root)
    }
  }

  // q80/q81's exact-oracle determinism rests on two PROPERTIES OF THE
  // TESTDATA CORPUS, not of the engine (DedupQueries.ingestBatch scaladoc):
  //   1. ids fit under the +1M/+2M/+3M/+4M provenance shifts;
  //   2. no corpus pair has exact Jaccard in [0.5, 0.8) — banded LSH
  //      (32×4) recall is 1-6e-8 at 0.8 but only ~0.87 at 0.5, so a pair
  //      in the gap would make the LSH-vs-exact-oracle comparison
  //      probabilistically flaky.
  // Asserting them here, against every shipped scale factor, turns a
  // corpus-generator change that breaks either into a named spec failure
  // instead of an opaque oracle hash mismatch.
  for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
    val dir = s"/root/testdata/$sf"
    if (new java.io.File(dir).isDirectory)
      test(s"$sf corpus upholds the q80/q81 determinism properties") {
        val d = graft.sources.Tables.load(spark, dir, "documents")
        val maxId = Option(d.agg(max(col("doc_id"))).head.get(0))
          .fold(0L)(_.asInstanceOf[Number].longValue)
        assert(maxId < 1000000L, s"id-shift scheme broken: max doc_id $maxId")
        val inGap = NgramJaccard.similarPairs(d, "doc_id", "text", threshold = 0.5)
          .filter(col("jaccard") < 0.8)
        assert(inGap.isEmpty,
          s"corpus pairs in the LSH-flaky Jaccard gap [0.5, 0.8): " +
            inGap.limit(5).collect().mkString(", "))
      }
  }
}
