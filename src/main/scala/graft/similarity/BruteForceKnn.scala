package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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
    val q = queries.select(
      col(idCol).as("query_id"),
      VectorOps.toDouble(col(vecCol)).as("qv"))
      .withColumn("qn", VectorOps.norm(col("qv")))
    val c = corpus.select(
      col(idCol).as("neighbor_id"),
      VectorOps.toDouble(col(vecCol)).as("cv"))
      .withColumn("cn", VectorOps.norm(col("cv")))

    val crossed = q.crossJoin(broadcast(c))
    val scored = (if (excludeSelf) crossed.filter(col("query_id") =!= col("neighbor_id"))
                  else crossed)
      .withColumn("cosine",
        VectorOps.dot(col("qv"), col("cv")) / (col("qn") * col("cn")))

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("query_id", "neighbor_id", "rnk", "cosine")
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
    val a = v.select(col("id").as("id_a"), col("v").as("va"), col("n").as("na"))
    val b = v.select(col("id").as("id_b"), col("v").as("vb"), col("n").as("nb"))
    a.crossJoin(broadcast(b))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", VectorOps.dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
  }
}
