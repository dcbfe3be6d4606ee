package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One corpus-ingest cycle — the production loop of a training-data
  * pipeline: a new batch arrives, is deduplicated against ITSELF (exact,
  * then near-dup), then against the EXISTING corpus (exact text match,
  * then near-dup probe), and only the survivors are appended (e.g. via
  * `TxTable.merge`) for the next cycle.
  *
  * Cost model at scale: every stage is proportional to the BATCH, never
  * the corpus — intra-batch stages touch batch rows only, the exact
  * corpus check is an anti-join against the index's skinny text-hash
  * set, and the near-dup stage probes `MinHashDedup.buildIndex`'s banded
  * buckets (an equi-join on 64-bit keys; the corpus pair generation never
  * reruns). The corpus index can be built once and reused across many
  * batches; it is a parameter here so callers control that amortization.
  * Calling either entry point is EAGER, not plan-only: the shingle-set
  * frames localCheckpoint at call time and ConnectedComponents runs its
  * adaptive edge-count gate.
  *
  * Near-dup semantics floor: shingling needs `shingleWidth` tokens, so
  * sub-shingle-width texts (1-2 tokens at the default width 3) are
  * deduplicated EXACTLY only — the exact stages (min-id per text within
  * the batch, text-hash anti-join against the corpus) are what keeps
  * short texts from re-entering the corpus forever.
  *
  * Composition of proven parts: ExactDedup.keepFirst (q19/q20),
  * MinHashDedup.nearDuplicatePairs (q21), ConnectedComponents.assign
  * (q48/q75), MinHashDedup.probe (q62). q80/q81 gate the composite
  * end-to-end against a DuckDB recompute of every stage.
  */
object IncrementalIngest {

  /** The four stage frames of one cycle, exposed so [[survivors]] and
    * [[report]] cannot drift apart. `checkpoint` materializes each stage
    * boundary (report mode: the counts then reuse the blocks instead of
    * recomputing the upstream stages per count).
    */
  private final case class Stages(
      batch: DataFrame, exact: DataFrame, intra: DataFrame, survivors: DataFrame)

  private def stages(
      corpusIndex: MinHashDedup.Index,
      batch: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      checkpoint: Boolean
  ): Stages = {
    def bound(df: DataFrame): DataFrame = if (checkpoint) df.localCheckpoint() else df
    val b = bound(batch)
    // intra-batch, exact: deterministic min-id winner per text
    val exact = bound(ExactDedup.keepFirst(b, Seq(textCol), Seq(col(idCol))))
    // intra-batch, near: banded candidate pairs -> components -> min id
    val pairs = MinHashDedup
      .nearDuplicatePairs(exact, idCol, textCol, threshold)
      .select(col("id_a"), col("id_b"))
    val labels = ConnectedComponents.assign(
      exact.select(col(idCol).as("id")), pairs)
    val intra = bound(exact.join(
      labels.filter(col("id") === col("component")).select(col("id").as(idCol)),
      Seq(idCol), "left_semi"))
    // cross-corpus, exact: the text-hash anti-join catches EVERY copy,
    // including sub-shingle-width texts the banded probe cannot see.
    // Matching on the PAIR of hashes (see MinHashDedup.Index.textHashes)
    // keeps a 64-bit birthday collision from killing a novel doc.
    val noExactCopy = intra.join(corpusIndex.textHashes,
      xxhash64(intra(textCol)) === corpusIndex.textHashes("text_hash") &&
        xxhash64(lit("graft-th2"), intra(textCol)) ===
          corpusIndex.textHashes("text_hash2"), "left_anti")
    // cross-corpus, near: banded probe + exact-Jaccard verification
    val corpusHits = MinHashDedup
      .probe(noExactCopy, corpusIndex, idCol, textCol, threshold)
      .select(col("new_id").as(idCol))
      .distinct()
    Stages(b, exact, intra, noExactCopy.join(corpusHits, Seq(idCol), "left_anti"))
  }

  /** Batch survivors after the four dedup stages. */
  def survivors(
      corpusIndex: MinHashDedup.Index,
      batch: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.5
  ): DataFrame =
    stages(corpusIndex, batch, idCol, textCol, threshold, checkpoint = false).survivors

  /** One cycle, eagerly: the survivor frame PLUS the per-stage counts
    * `(n_batch, n_after_exact, n_after_intra, n_survivors)` — what a
    * `foreachBatch` ingest sink needs without running the stage chain
    * twice ([[survivors]] then [[report]] would). The survivor frame is
    * localCheckpoint-bounded, so appending it to a sink does not re-run
    * the dedup stages.
    */
  def cycle(
      corpusIndex: MinHashDedup.Index,
      batch: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.5
  ): (DataFrame, Array[Long]) = {
    val st = stages(corpusIndex, batch, idCol, textCol, threshold, checkpoint = true)
    val surv = st.survivors.localCheckpoint()
    (surv, Array(st.batch.count(), st.exact.count(), st.intra.count(), surv.count()))
  }

  /** Per-stage row counts for one ingest cycle — the operational report
    * (what arrived, what each stage removed, what got in). Four bounded
    * actions over checkpointed stage frames.
    */
  def report(
      corpusIndex: MinHashDedup.Index,
      batch: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.5
  ): DataFrame = {
    val spark = batch.sparkSession
    val st = stages(corpusIndex, batch, idCol, textCol, threshold, checkpoint = true)
    import spark.implicits._
    Seq((st.batch.count(), st.exact.count(), st.intra.count(), st.survivors.count()))
      .toDF("n_batch", "n_after_exact", "n_after_intra", "n_survivors")
  }
}
