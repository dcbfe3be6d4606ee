package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact k-nearest-neighbor search by brute force — the correctness
  * baseline for the ANN paths.
  *
  * Cost is O(|queries| · |corpus| · dim). The corpus side is broadcast
  * when it fits (the planner's broadcast hint below), so the "join" is a
  * BroadcastNestedLoopJoin with no shuffle of the query side; norms are
  * precomputed once per side rather than per pair. This is the right
  * plan up to corpora of ~10⁶ vectors; beyond that use
  * [[HyperplaneLsh]] (or an IVF partitioning) to bound the candidate set.
  */
object BruteForceKnn {

  /** The O(n²) work happens in the map stage that consumes the streamed
    * side, so its parallelism is ITS partition count — and a small-file
    * query side (one parquet block) would run the whole cross product on
    * one core. Widen only when under-partitioned; the explicit partition
    * count keeps AQE from coalescing it back down.
    */
  private def widen(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** Per-query top-k by cosine, deterministic (ties broken on neighbor
    * id). Input frames need (idCol, vecCol) with vecCol: array<float|double>.
    *
    * `excludeSelf` drops pairs with equal ids — correct for self-search
    * (corpus eq queries, the default use); pass false when the two tables
    * have unrelated id spaces, where an id-equality drop would silently
    * discard a legitimate neighbor.
    */
  def topK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      excludeSelf: Boolean = true
  ): DataFrame = {
    val q = widen(queries.select(
      col(idCol).as("query_id"),
      VectorOps.toDouble(col(vecCol)).as("qv")))
      .withColumn("qn", VectorOps.norm(col("qv")))
    val c = corpus.select(
      col(idCol).as("neighbor_id"),
      VectorOps.toDouble(col(vecCol)).as("cv"))
      .withColumn("cn", VectorOps.norm(col("cv")))

    val crossed = q.crossJoin(broadcast(c))
    val scored = (if (excludeSelf) crossed.filter(col("query_id") =!= col("neighbor_id"))
                  else crossed)
      .select(col("query_id"), col("neighbor_id"),
        VectorOps.cosineFromNorms(VectorOps.dot(col("qv"), col("cv")),
          col("qn"), col("cn")).as("cosine"))

    // Rank with the bounded top-k aggregate, not a window: a window would
    // shuffle all |q|·|c| scored rows to rank them, while graft_topk's
    // partial phase reduces each query's candidates to k BEFORE the
    // exchange — with the corpus broadcast, a query's candidates all sit
    // in one partition, so the shuffle carries exactly k rows per query.
    scored
      .groupBy(col("query_id"))
      .agg(call_function("graft_topk", col("cosine"), col("neighbor_id"), lit(k)).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), col("col.payload").as("neighbor_id"),
        (col("pos") + 1).cast("int").as("rnk"), col("col.score").as("cosine"))
  }

  /** Hard-negative mining for contrastive training: per anchor, the k
    * highest-cosine corpus vectors with a DIFFERENT label — the
    * most-confusable negatives, which is what makes a contrastive batch
    * informative (easy random negatives carry no gradient signal). Same
    * exact broadcast + bounded-top-k shape as [[topK]] (the shuffle
    * carries exactly k rows per anchor; ties break on neighbor id); at
    * corpus scale the shortlist comes from an ANN probe (IvfPq/
    * HyperplaneLsh) re-ranked exactly — the q190 two-stage pattern —
    * with this as the oracle-checked exact contract.
    */
  def hardNegatives(
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String,
      k: Int
  ): DataFrame = {
    val q = widen(vectors.select(
      col(idCol).as("query_id"),
      col(labelCol).as("query_label"),
      VectorOps.toDouble(col(vecCol)).as("qv")))
      .withColumn("qn", VectorOps.norm(col("qv")))
    val c = vectors.select(
      col(idCol).as("neighbor_id"),
      col(labelCol).as("neighbor_label"),
      VectorOps.toDouble(col(vecCol)).as("cv"))
      .withColumn("cn", VectorOps.norm(col("cv")))

    q.crossJoin(broadcast(c))
      .filter(col("query_label") =!= col("neighbor_label"))
      .select(col("query_id"), col("query_label"), col("neighbor_id"),
        VectorOps.cosineFromNorms(VectorOps.dot(col("qv"), col("cv")),
          col("qn"), col("cn")).as("cosine"))
      .groupBy(col("query_id"), col("query_label"))
      .agg(call_function("graft_topk", col("cosine"), col("neighbor_id"), lit(k)).as("top"))
      .select(col("query_id"), col("query_label"), posexplode(col("top")))
      .select(col("query_id"), col("query_label"),
        col("col.payload").as("neighbor_id"),
        (col("pos") + 1).cast("int").as("rnk"), col("col.score").as("cosine"))
  }

  /** All pairs (idA < idB) with cosine ≥ threshold — embedding-space
    * near-duplicate detection, exact.
    */
  def nearDuplicatePairs(
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double
  ): DataFrame = {
    val v = vectors.select(
      col(idCol).as("id"),
      VectorOps.toDouble(col(vecCol)).as("v"))
      .withColumn("n", VectorOps.norm(col("v")))
    val a = widen(v.select(col("id").as("id_a"), col("v").as("va"), col("n").as("na")))
    val b = v.select(col("id").as("id_b"), col("v").as("vb"), col("n").as("nb"))
    a.crossJoin(broadcast(b))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", VectorOps.cosineFromNorms(
        VectorOps.dot(col("va"), col("vb")), col("na"), col("nb")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
  }
}
