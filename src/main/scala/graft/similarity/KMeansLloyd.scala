package graft.similarity

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed Lloyd k-means over the FULL corpus — the cluster-scale
  * companion of [[IvfIndex.train]]'s bounded-sample loop (which stays
  * the right tool for coarse quantizers; this one is for when the
  * clustering itself is the product, e.g. corpus bucketing for curation
  * or SemDeDup-style cell assignment trained on everything).
  *
  * Scale shape per iteration (the classic Lloyd synchronization):
  *   - assignment: one narrow scan; the argmin over k centroids is the
  *     codegen'd [[graft.functions.CellArgmin]] table loop (no per-cell
  *     expression blowup, broadcast centroid literal).
  *   - update: posexplode to (cell, pos, x) and a partial+final hash
  *     aggregation — the shuffle carries only k·dim rows per map
  *     partition (combiner), never the corpus; the driver holds k·dim
  *     doubles. Nothing else is collected.
  *
  * Deterministic and oracle-replayable by construction:
  *   - init: the k lowest-id vectors (no RNG — replayable in SQL).
  *   - update: per-element sums ride DECIMAL(28,9) (exact in any
  *     summation order; a double sum differs in the last ulp between
  *     partitionings), and each new centroid element is rounded to 6dp —
  *     so the centroid table is bit-identical across engines and
  *     partitionings at every iteration.
  *   - assignment: distances are the CellArgmin arithmetic
  *     (d = (Σv² − 2.0·Σv·c) + Σc², left-to-right, first-minimum
  *     tie-break) over those identical centroids. KMeansSpec pins a
  *     relative best-vs-second-best margin on the testdata so a future
  *     regeneration that lands two centroids equidistant-to-the-ulp
  *     fails loudly there, not silently in a hash gate.
  */
object KMeansLloyd {

  final case class Result(model: IvfIndex.Model, assignments: DataFrame)

  /** Run `iterations` Lloyd steps from the deterministic lowest-id init.
    * @return final model plus per-vector assignments (id, v, cell).
    */
  /** @param checkpointDir Lloyd's only cluster-resident loop state is
    *   the materialized input scan `v` (centroids live on the driver,
    *   k·dim doubles). `None` = `localCheckpoint` (blocks die with an
    *   executor, restarting the whole fit on a long run); `Some(dir)` =
    *   one durable parquet copy every iteration re-reads
    *   ([[graft.core.Durable]]). KMeansSpec pins durable ≡ ephemeral.
    */
  def fit(
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iterations: Int,
      checkpointDir: Option[String] = None
  ): Result = {
    // One durable scan feeds every iteration — without it each Lloyd
    // step re-reads and re-casts the source.
    val v = graft.core.Durable.materialize(
      vectors.select(col(idCol).cast("long").as("id"),
        VectorOps.toDouble(col(vecCol)).as("v")),
      checkpointDir, "vectors")

    // Deterministic seed: the k lowest-id vectors, cell index = id rank.
    // k rows collected — bounded by k, not the corpus.
    val seed: Array[Array[Double]] = v
      .orderBy(col("id"))
      .limit(k)
      .collect()
      .map(_.getSeq[Double](1).toArray)
    require(seed.length == k, s"corpus has ${seed.length} rows < k=$k")

    var centroids: Seq[Seq[Double]] = seed.map(_.toSeq).toSeq
    var it = 0
    while (it < iterations) {
      val assigned = v.withColumn(
        "cell", IvfIndex.assignCell(col("v"), IvfIndex.Model(centroids)))
      // (cell, pos) partial+final agg; DECIMAL(28,9) keeps the sum exact
      // in any order, the 6dp round pins the division's last ulp.
      val updated: Map[(Int, Int), Double] = assigned
        .select(col("cell"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("cell"), col("pos"))
        .agg(sum(col("x").cast("decimal(28,9)")).as("s"), count(lit(1)).as("n"))
        .select(col("cell"), col("pos"),
          round(col("s").cast("double") / col("n"), 6).as("m"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2))
        .toMap
      centroids = centroids.zipWithIndex.map { case (old, c) =>
        // An empty cell keeps its centroid (same policy as IvfIndex.train).
        if (updated.contains((c, 0))) old.indices.map(p => updated((c, p)))
        else old
      }
      it += 1
    }

    val finalAssign = v.withColumn(
      "cell", IvfIndex.assignCell(col("v"), IvfIndex.Model(centroids)))
    Result(IvfIndex.Model(centroids), finalAssign)
  }

  /** Per-cluster size + inertia (Σ of the CellArgmin distance d² to the
    * own-cell centroid). d² is the same left-to-right double arithmetic
    * as the assignment; the per-row value quantizes to DECIMAL(28,12) so
    * the per-cluster SUM is exact in any order.
    */
  def inertia(result: Result): DataFrame = {
    val spark = result.assignments.sparkSession
    import spark.implicits._
    val cents = result.model.centroids.zipWithIndex
      .map { case (c, i) => (i, c, c.foldLeft(0.0)((a, x) => a + x * x)) }
      .toDF("cell", "centroid", "cc")
    result.assignments
      .join(broadcast(cents), "cell")
      .select(col("cell"),
        ((VectorOps.dot(col("v"), col("v")) -
          lit(2.0) * VectorOps.dot(col("v"), col("centroid"))) + col("cc"))
          .cast("decimal(28,12)").as("d2"))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_vectors"),
        round(sum(col("d2")).cast("double"), 6).as("inertia"))
  }
}
