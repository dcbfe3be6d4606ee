package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[MinHashDedup.compactIndex]] — the rolling loop's log-structured
  * maintenance step: a parquet round-trip of the three index frames must
  * be row-for-row the SAME index (probe and full ingest-cycle results
  * frame-equal), so q231/q232 can compact every k extensions without the
  * ledger moving, while lineage depth resets to one scan per frame.
  * Exercised on the q231 fixture (sf0.001 documents + the planted
  * cross-batch copy cohort).
  */
class CompactIndexSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select(col("doc_id"), col("text"))

  test("compacted ≡ uncompacted: probe and cycle results frame-equal") {
    val d = docs.localCheckpoint()
    val corpus0 = d.filter(col("doc_id") % 5 =!= 0)
    val batch0 = d.filter(col("doc_id") % 4 === 0)
    val batch1 = d.filter(col("doc_id") % 4 === 1)

    // extend with batch0's survivors, then fork: one side compacts
    val base = MinHashDedup.buildIndex(corpus0, "doc_id", "text")
    val (surv0, _) = IncrementalIngest.cycle(base, batch0, "doc_id", "text")
    val extended = MinHashDedup.extendIndex(base, surv0, "doc_id", "text")
    val dir = tmpDir("minhash-compact")
    val compacted = MinHashDedup.compactIndex(extended, dir)

    // parameters ride along; all three frames row-identical
    assert(compacted.shingleWidth == extended.shingleWidth &&
      compacted.bands == extended.bands && compacted.rows == extended.rows)
    def frameEqual(a: org.apache.spark.sql.DataFrame,
        b: org.apache.spark.sql.DataFrame, what: String): Unit = {
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        s"$what diverged under compaction")
      assert(a.count() == b.count(), s"$what count changed under compaction")
    }
    frameEqual(extended.buckets, compacted.buckets, "buckets")
    frameEqual(extended.sets, compacted.sets, "sets")
    frameEqual(extended.textHashes, compacted.textHashes, "textHashes")

    // probe: bit-identical pair set either way
    val pu = MinHashDedup.probe(batch1, extended, "doc_id", "text")
    val pc = MinHashDedup.probe(batch1, compacted, "doc_id", "text")
    assert(pu.exceptAll(pc).isEmpty && pc.exceptAll(pu).isEmpty,
      "probe results diverged under compaction")

    // full ingest cycle: identical survivors AND identical ledger counts
    val (su, cu) = IncrementalIngest.cycle(extended, batch1, "doc_id", "text")
    val (sc, cc) = IncrementalIngest.cycle(compacted, batch1, "doc_id", "text")
    assert(cu.toSeq == cc.toSeq, s"ledger counts moved: ${cu.toSeq} vs ${cc.toSeq}")
    val ku = su.select("doc_id").as[Long].collect().sorted.toSeq
    val kc = sc.select("doc_id").as[Long].collect().sorted.toSeq
    assert(ku == kc, "survivor sets diverged under compaction")

    // the compacted index survives further extension (the loop shape)
    val again = MinHashDedup.extendIndex(compacted, sc, "doc_id", "text")
    assert(again.textHashes.count() ==
      compacted.textHashes.count() + sc.select("text").distinct().count())
  }
}
