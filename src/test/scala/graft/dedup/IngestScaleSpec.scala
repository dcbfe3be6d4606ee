package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{MetricsProbe, SparkSpec}

/** MEASURES (not argues) IncrementalIngest's cost model — "every stage ∝
  * batch, never corpus" (IncrementalIngest.scala:12-18): the SAME batch
  * runs `survivors` against a 1× and an 8× corpus index, and the per-batch
  * wall time and shuffle bytes must grow far below the 8× corpus growth.
  *
  * Why this holds structurally: intra-batch stages never touch the index;
  * the exact stage anti-joins the skinny text-hash set (broadcast,
  * PlanSpec-pinned); the banded probe is an equi-join of the (small) batch
  * bucket set against corpus buckets with candidate verification joins
  * broadcasting the candidate side. The corpus contributes scans, never
  * shuffles. This spec is the evidence for that sentence.
  */
class IngestScaleSpec extends SparkSpec {

  private val n1x = 2000L
  private val batchPerKind = 200

  /** Deterministic synthetic corpus: every token embeds the doc id, so
    * docs share no shingle — no organic near-dup pairs, which keeps the
    * candidate set (and thus the measured cost) a pure function of
    * BATCH vs INDEX size rather than pair-explosion luck. 8× is a strict
    * superset of 1×, so the one shared batch sees identical matches
    * against both indexes.
    */
  private def corpus(n: Long): DataFrame =
    spark.range(n).select(col("id").as("doc_id"),
      concat_ws(" ",
        (0 until 28).map(k => concat(lit("c"), col("id"), lit(s"w$k"))): _*).as("text"))

  /** q80-shaped batch over 1×-resident docs: exact corpus copies (die at
    * the text-hash stage), near-variants (die at the probe), novel docs
    * (survive) — all corpus-touching kill paths exercised in BOTH runs.
    */
  private def batch: DataFrame = {
    val base = corpus(n1x).filter(col("doc_id") < batchPerKind)
    val copies = base.select((col("doc_id") + 10000000L).as("doc_id"), col("text"))
    val variants = base.select((col("doc_id") + 20000000L).as("doc_id"),
      concat(col("text"), lit(" xtail"), col("doc_id")).as("text"))
    val novel = spark.range(batchPerKind)
      .select((col("id") + 30000000L).as("doc_id"),
        concat_ws(" ",
          (0 until 28).map(k => concat(lit("nv"), col("id"), lit(s"w$k"))): _*).as("text"))
    copies.unionByName(variants).unionByName(novel)
  }

  /** Materialize the index the way production would (built once, persisted,
    * amortized over many batches) so the measurement isolates the PER-BATCH
    * cost `survivors` pays against it.
    */
  private def materializedIndex(docs: DataFrame): MinHashDedup.Index = {
    val idx = MinHashDedup.buildIndex(docs, "doc_id", "text")
    idx.copy(
      buckets = idx.buckets.localCheckpoint(),
      sets = idx.sets.localCheckpoint(),
      textHashes = idx.textHashes.localCheckpoint())
  }

  test("survivors cost grows sub-linearly in corpus size (1x vs 8x index)") {
    val b = batch.localCheckpoint()
    val idx1 = materializedIndex(corpus(n1x))
    val idx8 = materializedIndex(corpus(n1x * 8))

    def run(idx: MinHashDedup.Index): Long =
      IncrementalIngest.survivors(idx, b, "doc_id", "text").count()

    // warm-up both paths (JIT, codegen cache) before measuring
    assert(run(idx1) == batchPerKind.toLong)
    assert(run(idx8) == batchPerKind.toLong)

    // Best-of-2 per index (ADVICE r7, mirroring AnnScaleSpec): wall clock
    // on this host swings ~15% under load, and a one-shot ratio gate flakes;
    // the best of two runs is a stable lower envelope. Shuffle bytes are
    // deterministic — both runs must agree, and the min is used.
    def measureBest(idx: MinHashDedup.Index) = {
      val a = MetricsProbe.measure(spark)(run(idx))
      val b = MetricsProbe.measure(spark)(run(idx))
      assert(a.result == batchPerKind.toLong && b.result == batchPerKind.toLong,
        "same batch must yield the same survivors against either index")
      (math.min(a.wallMs, b.wallMs),
        math.min(a.shuffleWriteBytes, b.shuffleWriteBytes),
        math.min(a.shuffleReadBytes, b.shuffleReadBytes))
    }
    val (wall1, sw1, sr1) = measureBest(idx1)
    val (wall8, sw8, sr8) = measureBest(idx8)

    info(f"1x corpus ($n1x%d docs): $wall1%d ms, shuffle r/w $sr1%d/$sw1%d B")
    info(f"8x corpus (${n1x * 8}%d docs): $wall8%d ms, shuffle r/w $sr8%d/$sw8%d B")

    // The gates: 8× the corpus must cost FAR less than 8× — shuffle bytes
    // are batch-proportional (expect ≈1×; gate 2× for partition rounding),
    // wall time adds only corpus scan/broadcast constants (expect ≲1.5×;
    // gate 4× for host noise). A linear-in-corpus regression (e.g. the
    // text-hash anti-join degrading to a sort-merge shuffle, or the probe
    // re-pairing the corpus) blows both gates immediately. Shuffle bytes
    // are the PRIMARY gate (deterministic); wall is the noisy secondary.
    val shuffleRatio = sw8.toDouble / math.max(1L, sw1)
    val wallRatio = wall8.toDouble / math.max(1L, wall1)
    info(f"ratios: shuffle $shuffleRatio%.2f, wall $wallRatio%.2f (corpus grew 8.00)")
    assert(shuffleRatio < 2.0,
      f"shuffle bytes grew $shuffleRatio%.2f× on an 8× corpus — the probe is " +
        "shuffling corpus-proportional data")
    assert(wallRatio < 4.0,
      f"wall time grew $wallRatio%.2f× on an 8× corpus — per-batch cost is no " +
        "longer batch-proportional")
  }
}
