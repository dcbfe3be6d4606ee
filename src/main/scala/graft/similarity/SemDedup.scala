package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SemDeDup-style semantic deduplication: cluster the embedding space
  * with the IVF coarse quantizer, then deduplicate WITHIN each cluster
  * by pairwise cosine — the published recipe (Abbas et al. 2023,
  * "SemDeDup") for making embedding dedup tractable at corpus scale
  * without an all-pairs pass. The reference engine has no embedding
  * operators at all; this is north-star extension surface, composing the
  * existing k-means quantizer ([[IvfIndex]]) with the greedy keep-first
  * rule the exact-dedup family already uses (`ExactDedup`, q19).
  *
  * Semantics: drop a vector v iff some SAME-CELL partner u with u < v
  * has cosine(u, v) ≥ τ — ANY smaller-id partner, kept or itself
  * dropped (deterministic in the id order alone). This is stricter than
  * "τ-close to a kept survivor": in a chain A~B~C (ids A<B<C,
  * cos(A,B) ≥ τ, cos(B,C) ≥ τ, cos(A,C) < τ) both B and C drop — C via
  * the already-dropped B — so a dropped row is NOT always τ-close to a
  * kept one (an id-increasing τ-chain drops link by link). It differs
  * from connected-component dedup in the decision procedure — one
  * pairwise predicate against smaller ids, never component reachability:
  * a row whose τ-neighbors all have LARGER ids survives even inside a
  * big component (a τ-star keeps every leaf and drops only the center,
  * where components would keep one row total) — and the q99 oracle
  * recomputes exactly this rule.
  *
  * Scale shape: one narrow assignment pass (centroid distances are
  * codegen arithmetic against broadcast literals), then a SHUFFLE
  * equi-join on cell id — the per-cell candidate sets are corpus/nCells
  * sized, so the quadratic term is (n/nCells)² per cell, controlled by
  * the same √corpus nCells sizing rule as the IVF probe (IvfIndex.probe
  * doc). The approximation vs a global pass is exactly the SemDeDup
  * trade: a τ-pair straddling a cell boundary is missed. For EXACT
  * duplicates the approximation is lossless by construction — identical
  * vectors compute identical centroid distances and land in the same
  * cell under the deterministic lowest-cell-id tie-break — and
  * `SemDedupSpec` pins the corpus gap property (no natural pair within
  * an order of magnitude of τ on the test corpus) that makes q99's
  * global DuckDB oracle exact.
  */
object SemDedup {

  /** The assignment materialization both sides of the self-join read
    * (instead of re-evaluating the nCells centroid-distance
    * expressions): ephemeral `localCheckpoint` blocks by default, or a
    * fault-tolerant parquet round trip when `checkpointDir` is set — the
    * `BudgetSelect(checkpointDir=)` pattern, 100-TB mode (one lost
    * executor otherwise fails the whole job; r8 #4). No pid stamp is
    * needed here: the materialization is a re-evaluation barrier, not a
    * partition-identity dependency. `SemDedupSpec` pins durable ≡
    * ephemeral.
    */
  private def materialize(
      df: DataFrame, checkpointDir: Option[String], name: String): DataFrame =
    checkpointDir match {
      case None => df.localCheckpoint()
      case Some(dir) =>
        val path = s"$dir/$name"
        df.write.mode("overwrite").parquet(path)
        df.sparkSession.read.parquet(path)
    }

  /** Per-vector verdict: (id, cell, kept). Survivors are the cell-wise
    * greedy keep-first set; `kept` is false iff a smaller-id same-cell
    * τ-partner exists.
    */
  def dedup(
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      model: IvfIndex.Model,
      tau: Double,
      checkpointDir: Option[String] = None
  ): DataFrame = {
    // One pass computes vector + norm + cell, materialized so both
    // sides of the self-join read it instead of re-evaluating the
    // nCells centroid-distance expressions (the approxTopK pattern;
    // ContextCleaner releases ephemeral blocks).
    val a = materialize(
      vectors
        .select(col(idCol).as("id"), VectorOps.toDouble(col(vecCol)).as("v"))
        .withColumn("n", VectorOps.norm(col("v")))
        .withColumn("cell", IvfIndex.assignCell(col("v"), model)),
      checkpointDir, "assigned")

    val dropped = a.as("x")
      .join(
        a.as("y"),
        col("x.cell") === col("y.cell") && col("x.id") < col("y.id") &&
          VectorOps.cosineFromNorms(
            VectorOps.dot(col("x.v"), col("y.v")), col("x.n"), col("y.n")) >= tau)
      .select(col("y.id").as("id"))
      .distinct()

    a.join(dropped.withColumn("is_dropped", lit(true)), Seq("id"), "left")
      .select(
        col("id"),
        col("cell"),
        not(coalesce(col("is_dropped"), lit(false))).as("kept"))
  }

  /** Incremental semantic dedup — the index/probe split of [[dedup]],
    * closing the same incremental series as the MinHash (q62), LSH (q87)
    * and IVF (q96) paths: a NEW batch is checked against the persisted
    * cell assignments of the existing corpus ([[IvfIndex.buildIndex]])
    * without touching corpus text or re-clustering. Cost ∝ batch ×
    * cell occupancy: batch-side quantization is per-row codegen
    * arithmetic against the broadcast centroid literals, and the cell
    * equi-join probes only the batch's cells. An exact duplicate of a
    * corpus vector provably lands in its original's cell (identical
    * distances, deterministic tie-break), so τ-high batch copies can
    * never escape the probe.
    *
    * Returns every batch row: (id, cell, has_duplicate).
    */
  def probe(
      batch: DataFrame,
      index: IvfIndex.Index,
      idCol: String,
      vecCol: String,
      tau: Double,
      checkpointDir: Option[String] = None
  ): DataFrame = {
    val q = materialize(
      batch
        .select(col(idCol).as("id"), VectorOps.toDouble(col(vecCol)).as("v"))
        .withColumn("n", VectorOps.norm(col("v")))
        .withColumn("cell", IvfIndex.assignCell(col("v"), index.model)),
      checkpointDir, "batch_assigned")

    val hits = q
      .join(index.assignments.select(
        col("cell"), col("v").as("cv"), col("n").as("cn")), "cell")
      .filter(VectorOps.cosineFromNorms(
        VectorOps.dot(col("v"), col("cv")), col("n"), col("cn")) >= tau)
      .select(col("id"))
      .distinct()

    q.join(hits.withColumn("is_dup", lit(true)), Seq("id"), "left")
      .select(
        col("id"),
        col("cell"),
        coalesce(col("is_dup"), lit(false)).as("has_duplicate"))
  }

  /** Survivors with their absorption weight: each dropped row is
    * attributed to its SMALLEST-id τ-partner in its cell (its "absorber"
    * — well-defined and deterministic under the greedy order), and a
    * survivor's weight is 1 + the rows it absorbed. Reweighting keeps
    * the deduplicated mixture distribution-faithful: downstream sampling
    * (`Sampling.mixtureEpochs` takes the weight as a cost/quota input)
    * sees the duplicated region at its original mass instead of
    * collapsing it to one vote — the standard follow-up to semantic
    * dedup when the duplicate rate differs across domains.
    *
    * Note absorbers can themselves be dropped (A absorbs B while a
    * smaller C drops A, when cos(A,B) ≥ τ > cos(C,B)): weight rows are
    * emitted for SURVIVORS only, and mass attributed to a dropped
    * absorber is dropped with it — the conservative choice, documented
    * rather than chained (chaining would re-introduce exactly the
    * transitive smearing the pairwise rule avoids). On a planted
    * exact-duplicate corpus no such chain exists and Σ weight = corpus
    * size exactly (the q103 oracle pins both).
    */
  def survivorWeights(
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      model: IvfIndex.Model,
      tau: Double,
      checkpointDir: Option[String] = None
  ): DataFrame = {
    val a = materialize(
      vectors
        .select(col(idCol).as("id"), VectorOps.toDouble(col(vecCol)).as("v"))
        .withColumn("n", VectorOps.norm(col("v")))
        .withColumn("cell", IvfIndex.assignCell(col("v"), model)),
      checkpointDir, "assigned")

    val pairs = a.as("x")
      .join(
        a.as("y"),
        col("x.cell") === col("y.cell") && col("x.id") < col("y.id") &&
          VectorOps.cosineFromNorms(
            VectorOps.dot(col("x.v"), col("y.v")), col("x.n"), col("y.n")) >= tau)
      .select(col("y.id").as("dropped_id"), col("x.id").as("partner_id"))

    val absorbed = pairs
      .groupBy(col("dropped_id"))
      .agg(min(col("partner_id")).as("absorber_id"))
      .groupBy(col("absorber_id"))
      .agg(count(lit(1)).as("n_absorbed"))

    val droppedIds = pairs.select(col("dropped_id").as("id")).distinct()
    a.join(droppedIds.withColumn("is_dropped", lit(true)), Seq("id"), "left")
      .filter(col("is_dropped").isNull)
      .join(absorbed.withColumnRenamed("absorber_id", "id"), Seq("id"), "left")
      .select(
        col("id"),
        col("cell"),
        (lit(1L) + coalesce(col("n_absorbed"), lit(0L))).as("weight"))
  }
}
