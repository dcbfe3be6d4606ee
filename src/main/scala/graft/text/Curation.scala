package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.{ConnectedComponents, Contamination, ExactDedup, MinHashDedup}
import graft.operators.Sampling
import graft.similarity.HyperplaneLsh

/** End-to-end corpus curation — the composition the individual operators
  * exist for, in the standard order a pre-training data pipeline runs:
  *
  *   quality filter → exact dedup → near-dup dedup (LSH + connected
  *   components, keep one doc per duplicate cluster) → optional semantic
  *   dedup (embedding-space LSH pairs, same cluster-and-keep-min) →
  *   benchmark decontamination → deterministic sampling →
  *   context-window chunking
  *
  * Every stage is the already-tested operator; this object contributes
  * the plumbing and a per-stage count report. Order matters and is part
  * of the contract: dedup before decontamination (drop clusters once,
  * not per member), sampling after filtering (the fraction applies to
  * the clean pool), chunking last (chunks inherit every upstream
  * guarantee).
  *
  * Scale shape: stages communicate through DataFrames only — each one
  * keeps its own shuffle/broadcast strategy (LSH bucket join, broadcast
  * shingle dictionary, hash-priority sampling filter), so the composed
  * pipeline inherits the per-operator scale designs unchanged. The
  * intermediate corpus is localCheckpoint'ed once per stage boundary
  * where reuse would otherwise re-run upstream stages.
  */
object Curation {

  final case class Report(
      input_docs: Long,
      after_quality: Long,
      after_exact_dedup: Long,
      after_neardup: Long,
      after_semantic: Long,
      after_decontam: Long,
      after_sample: Long,
      chunks: Long)

  /** @param docs       (idCol, textCol) corpus
    * @param benchmark  optional eval set to decontaminate against
    * @param embeddings optional (idCol, embeddingCol) frame for semantic
    *                   dedup — near-identical meaning under different
    *                   surface text, which token-level Jaccard cannot see
    * @param minQuality keep docs with qualityScore ≥ this ([0,1])
    * @param neardupThreshold Jaccard threshold for duplicate clustering
    * @param sampleFraction deterministic keep-fraction of the clean pool
    * @param maxTokens  chunk budget for the context windows
    */
  def run(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      benchmark: Option[DataFrame] = None,
      embeddings: Option[DataFrame] = None,
      embeddingCol: String = "embedding",
      semanticThreshold: Double = 0.9,
      minQuality: Double = 0.5,
      neardupThreshold: Double = 0.5,
      sampleFraction: Double = 1.0,
      maxTokens: Int = 512
  ): (org.apache.spark.sql.Dataset[Chunker.DocChunk], Report) = {
    val spark = docs.sparkSession
    import spark.implicits._

    val input = docs.select(col(idCol).as("id"), col(textCol).as("text"))
    val inputN = input.count()

    // 1. quality gate (scan-side heuristics, narrow)
    val quality = input
      .filter(TextAnalysis.qualityScore(col("text")) >= minQuality)
      .localCheckpoint()
    val qualityN = quality.count()

    // 2. exact dedup (deterministic keep-first per identical text)
    val exact = ExactDedup.keepFirst(quality, Seq("text"), Seq(col("id")))
      .localCheckpoint()
    val exactN = exact.count()

    // 3. near-dup clustering: LSH pairs → components → keep min id
    val pairs = MinHashDedup.nearDuplicatePairs(
      exact, "id", "text", threshold = neardupThreshold)
      .select(col("id_a"), col("id_b"))
    val components = ConnectedComponents.assign(
      exact.select(col("id")), pairs)
    val nearDeduped = exact
      .join(components, Seq("id"))
      .filter(col("id") === col("component"))
      .drop("component")
      .localCheckpoint()
    val nearN = nearDeduped.count()

    // 4. optional semantic dedup: embedding-space LSH pairs over the
    // SURVIVING docs' embeddings, clustered and collapsed exactly like
    // the token-level stage — catches paraphrases Jaccard cannot see.
    val semanticDeduped = embeddings match {
      case Some(emb) =>
        val vecs = emb.select(col(idCol).as("id"), col(embeddingCol).as("emb"))
          .join(nearDeduped.select(col("id")), Seq("id"))
        val sPairs = HyperplaneLsh.nearDuplicatePairs(
          vecs, "id", "emb", threshold = semanticThreshold, nTables = 8)
          .select(col("id_a"), col("id_b"))
        val sComponents = ConnectedComponents.assign(
          nearDeduped.select(col("id")), sPairs)
        nearDeduped
          .join(sComponents, Seq("id"))
          .filter(col("id") === col("component"))
          .drop("component")
          .localCheckpoint()
      case None => nearDeduped
    }
    val semanticN = semanticDeduped.count()

    // 5. decontamination: drop docs sharing 8-grams with the benchmark
    val decontaminated = benchmark match {
      case Some(bench) =>
        val flagged = Contamination.flagged(
          semanticDeduped, bench.select(col(idCol).as("id"), col(textCol).as("text")),
          "id", "text")
        semanticDeduped.join(flagged.select(col("id")), Seq("id"), "left_anti")
          .localCheckpoint()
      case None => semanticDeduped
    }
    val decontamN = decontaminated.count()

    // 6. deterministic sampling (hash-priority filter; reruns identical)
    val sampled =
      if (sampleFraction >= 1.0) decontaminated
      else Sampling.byFraction(decontaminated, "id", sampleFraction)
    val sampledN = sampled.count()

    // 7. context-window chunking — checkpointed like the other stage
    // boundaries: the report's count and the caller's own action would
    // otherwise each run the row-exploding flatMap over the full corpus.
    val chunks = Chunker.chunk(
      sampled.select(col("id"), col("text")).as[(Long, String)], maxTokens)
      .localCheckpoint()
    val chunksN = chunks.count()

    (chunks, Report(inputN, qualityN, exactN, nearN, semanticN, decontamN,
      sampledN, chunksN))
  }
}
