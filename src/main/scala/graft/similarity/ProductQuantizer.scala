package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization — the compressed-domain ANN representation that
  * makes a 100 TB embedding corpus scannable: each vector is split into
  * `m` subspaces and every subvector replaced by the id of its nearest
  * per-subspace centroid, so a dim-64 float vector (256 B) becomes `m`
  * small ints (here 4 codes = 4 B at ksub ≤ 256). Asymmetric distance
  * computation (ADC) then ranks candidates from codes + codebooks alone
  * — the corpus's float vectors never travel again after encoding.
  * (FAISS-style IVF cell pruning composes upstream: [[IvfIndex.probe]]
  * narrows candidates, ADC ranks them; here the flat scan is benchmarked
  * honestly as a scan.)
  *
  * Everything is built from the [[KMeansLloyd]] primitives, so the same
  * cross-engine determinism contract holds end to end: per-subspace
  * codebooks train with DECIMAL-exact updates + 6dp rounding
  * (bit-identical across engines), encoding is the CellArgmin arithmetic
  * over those identical codebooks, and the ADC score is evaluated as the
  * exact distance to the code's RECONSTRUCTION — one left-to-right
  * 64-element dot chain, replayable in SQL as list ops over the
  * concatenated centroid lists.
  */
object ProductQuantizer {

  /** m codebooks of ksub centroids, each `subDim` wide. */
  final case class Model(codebooks: Seq[Seq[Seq[Double]]], subDim: Int) {
    def m: Int = codebooks.length
  }

  /** Train one Lloyd codebook per subspace (deterministic lowest-id
    * init, fixed iterations — [[KMeansLloyd.fit]] per slice). The m
    * fits run sequentially on the driver; each is a handful of narrow
    * distributed jobs, and m is a small constant.
    */
  def train(
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      m: Int,
      ksub: Int,
      iterations: Int
  ): Model = {
    val dim = vectors.select(size(col(vecCol))).head.getInt(0)
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val subDim = dim / m
    val books = (0 until m).map { i =>
      val sliced = vectors.select(col(idCol).as("id"),
        slice(col(vecCol), i * subDim + 1, subDim).as("sub"))
      KMeansLloyd.fit(sliced, "id", "sub", ksub, iterations).model.centroids
    }
    Model(books, subDim)
  }

  /** Codes frame: (id, code0..code{m-1}) — one narrow codegen pass, m
    * CellArgmin table loops against broadcast codebook literals.
    */
  def encode(
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      model: Model
  ): DataFrame = {
    val base = vectors.select(col(idCol).as("id"),
      VectorOps.toDouble(col(vecCol)).as("v"))
    model.codebooks.zipWithIndex.foldLeft(base) { case (df, (book, i)) =>
      df.withColumn(s"code$i",
        IvfIndex.assignCell(
          slice(col("v"), i * model.subDim + 1, model.subDim),
          IvfIndex.Model(book)))
    }.drop("v")
  }

  /** The decoded (reconstructed) vector for a codes row: per-subspace
    * centroid lookup in the broadcast codebook literal, concatenated
    * back to full width.
    */
  def reconstruct(codes: DataFrame, model: Model): DataFrame =
    codes.withColumn("recon",
      concat((0 until model.m).map { i =>
        element_at(typedLit(model.codebooks(i)), col(s"code$i") + 1)
      }: _*))

  /** ADC top-k: score every (query, candidate-code) pair by the exact
    * squared distance between the query vector and the candidate's
    * reconstruction — (Σq² − 2·Σq·r) + Σr², the CellArgmin operand
    * order over the full concatenated width — and keep each query's k
    * best (score asc, id tie-break). The queries frame broadcasts
    * (bounded batch); the corpus side carries codes only.
    */
  def adcTopK(
      queries: DataFrame,
      queryIdCol: String,
      queryVecCol: String,
      codes: DataFrame,
      model: Model,
      k: Int
  ): DataFrame = {
    val q = queries.select(col(queryIdCol).as("query_id"),
      VectorOps.toDouble(col(queryVecCol)).as("q"))
    val recon = reconstruct(codes, model)
      .select(col("id"), col("recon"))
    val score = (VectorOps.dot(col("q"), col("q")) -
      lit(2.0) * VectorOps.dot(col("q"), col("recon"))) +
      VectorOps.dot(col("recon"), col("recon"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").asc, col("id"))
    recon.crossJoin(broadcast(q))
      .select(col("query_id"), col("id"), score.as("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("id").as("vec_id"),
        round(col("score"), 6).as("adc_dist"))
  }
}
