package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One corpus-ingest cycle — the production loop of a training-data
  * pipeline: a new batch arrives, is deduplicated against ITSELF (exact,
  * then near-dup), then against the EXISTING corpus, and only the
  * survivors are appended (e.g. via `TxTable.merge`) for the next cycle.
  *
  * Cost model at scale: every stage is proportional to the BATCH, never
  * the corpus — intra-batch stages touch batch rows only, and the
  * cross-corpus stage probes `MinHashDedup.buildIndex`'s banded buckets
  * (an equi-join on 64-bit keys; the corpus pair generation never
  * reruns). The corpus index can be built once and reused across many
  * batches; it is a parameter here so callers control that amortization.
  *
  * Composition of proven parts: ExactDedup.keepFirst (q19/q20),
  * MinHashDedup.nearDuplicatePairs (q21), ConnectedComponents.assign
  * (q48/q75), MinHashDedup.probe (q62). q80/q81 gate the composite
  * end-to-end against a DuckDB recompute of all four stages.
  */
object IncrementalIngest {

  /** Batch survivors after the three dedup stages. Lazy — one DataFrame,
    * no actions beyond ConnectedComponents' adaptive edge-count gate.
    *
    * Stage order matters: exact dedup first (cheapest, one keyed
    * shuffle), then intra-batch near-dup (keep the MIN id of every
    * duplicate component — deterministic winner), then the corpus probe
    * (most expensive per survivor, so it sees the fewest rows).
    */
  def survivors(
      corpusIndex: MinHashDedup.Index,
      batch: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.5
  ): DataFrame = {
    val exact = ExactDedup.keepFirst(batch, Seq(textCol), Seq(col(idCol)))
    val pairs = MinHashDedup
      .nearDuplicatePairs(exact, idCol, textCol, threshold)
      .select(col("id_a"), col("id_b"))
    val labels = ConnectedComponents.assign(
      exact.select(col(idCol).as("id")), pairs)
    val intra = exact.join(
      labels.filter(col("id") === col("component")).select(col("id").as(idCol)),
      Seq(idCol), "left_semi")
    val corpusHits = MinHashDedup
      .probe(intra, corpusIndex, idCol, textCol, threshold)
      .select(col("new_id").as(idCol))
      .distinct()
    intra.join(corpusHits, Seq(idCol), "left_anti")
  }

  /** Per-stage row counts for one ingest cycle — the operational report
    * (what arrived, what each stage removed, what got in). Four bounded
    * actions over localCheckpoint'ed stage frames.
    */
  def report(
      corpusIndex: MinHashDedup.Index,
      batch: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.5
  ): DataFrame = {
    val spark = batch.sparkSession
    val b = batch.localCheckpoint()
    val exact = ExactDedup.keepFirst(b, Seq(textCol), Seq(col(idCol))).localCheckpoint()
    val pairs = MinHashDedup
      .nearDuplicatePairs(exact, idCol, textCol, threshold)
      .select(col("id_a"), col("id_b"))
    val labels = ConnectedComponents.assign(exact.select(col(idCol).as("id")), pairs)
    val intra = exact.join(
      labels.filter(col("id") === col("component")).select(col("id").as(idCol)),
      Seq(idCol), "left_semi").localCheckpoint()
    val corpusHits = MinHashDedup
      .probe(intra, corpusIndex, idCol, textCol, threshold)
      .select(col("new_id").as(idCol))
      .distinct()
    val surv = intra.join(corpusHits, Seq(idCol), "left_anti")
    import spark.implicits._
    Seq((b.count(), exact.count(), intra.count(), surv.count()))
      .toDF("n_batch", "n_after_exact", "n_after_intra", "n_survivors")
  }
}
