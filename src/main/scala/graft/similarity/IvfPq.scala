package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** IVF-PQ — the composed FAISS-style scale path for vector search over a
  * 100 TB corpus: an inverted-file coarse quantizer prunes the search to
  * `nProbe` cells, and product-quantized RESIDUALS rank the survivors
  * from codes + codebooks alone. The two halves exist separately in this
  * engine ([[IvfIndex]] prunes but ranks with exact vectors that must
  * travel; [[ProductQuantizer]] compresses but scans every code) — this
  * module composes them the way a production index does, so per query
  * the work is nProbe·(n/nCells) ADC evaluations over 4-byte codes and
  * the corpus floats never move after encoding.
  *
  * Residual encoding (encode `v − centroid(cell)`, not `v`) is what
  * makes the composition better than its parts: within a cell the
  * residuals are centered near zero, so the per-subspace codebooks spend
  * their ksub cells on local structure instead of re-learning the coarse
  * geometry.
  *
  * Deterministic and oracle-replayable end to end, inheriting the
  * [[KMeansLloyd]] contract: coarse centroids and per-subspace residual
  * codebooks train with DECIMAL-exact updates + 6dp rounding
  * (bit-identical across engines and partitionings), the residual is the
  * exact elementwise IEEE `v[i] − c[i]` (native codegen
  * `graft_vec_sub`), reconstruction is `c[i] + r[i]` (`graft_vec_add`)
  * over the concatenated subspace centroids, and the ADC score is the
  * usual left-to-right `(Σq² − 2·Σq·recon) + Σrecon²` chain. DuckDB
  * replays every training round, the encode, the probe ranking and the
  * ADC top-k symbol-for-symbol (q179).
  *
  * Scale shape:
  *  - build: one full-corpus Lloyd fit (narrow scans + k·dim-row
  *    combiner shuffles per iteration), one residual projection, m
  *    slice fits over the SAME materialized residual frame, one encode
  *    pass. The codes frame is (id, cell, m small ints) — write it
  *    parquet `partitionBy(cell)` and the probe join is cell-pruned at
  *    the scan.
  *  - probe: query-side cell ranking is per-row codegen arithmetic
  *    against broadcast centroid literals; candidates come from an
  *    equi-join of the (bounded) probe batch against codes on cell —
  *    never a cartesian, never the corpus vectors; the per-query top-k
  *    rides the bounded [[graft.functions.TopKAgg]] partial aggregate,
  *    so only k rows per query cross the final shuffle.
  */
object IvfPq {

  final case class Model(coarse: IvfIndex.Model, pq: ProductQuantizer.Model)

  /** Persisted index: the model plus the codes frame
    * (id, cell, code0..code{m-1}).
    */
  final case class Index(model: Model, codes: DataFrame)

  private def centsDF(df: DataFrame, model: IvfIndex.Model): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    model.centroids.zipWithIndex.map { case (c, i) => (i, c) }
      .toDF("cell", "ccent")
  }

  /** Train coarse + residual-PQ codebooks and encode the corpus.
    *
    * @param nCells      coarse cells (≈ √corpus at scale)
    * @param coarseIters Lloyd iterations for the coarse quantizer
    * @param m           PQ subspaces (dim % m == 0)
    * @param ksub        centroids per subspace (≤ 256 for byte codes)
    * @param pqIters     Lloyd iterations per subspace codebook
    */
  def build(
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      nCells: Int,
      coarseIters: Int,
      m: Int,
      ksub: Int,
      pqIters: Int
  ): Index = {
    val coarse = KMeansLloyd.fit(vectors, idCol, vecCol, nCells, coarseIters)
    // Residual frame (id, cell, r): materialized once — it feeds the m
    // per-subspace fits AND the encode pass; without the checkpoint each
    // would re-run the coarse assignment scan.
    val resid = coarse.assignments
      .join(broadcast(centsDF(coarse.assignments, coarse.model)), "cell")
      .select(col("id"), col("cell"),
        call_function("graft_vec_sub", col("v"), col("ccent")).as("r"))
      .localCheckpoint()
    val pq = ProductQuantizer.train(resid, "id", "r", m, ksub, pqIters)
    // Encode inline (ProductQuantizer.encode drops non-vector columns;
    // re-joining cell on id would shuffle two corpus frames for nothing).
    val base = resid.select(col("id"), col("cell"), col("r").as("v"))
    val codes = pq.codebooks.zipWithIndex.foldLeft(base) { case (df, (book, i)) =>
      df.withColumn(s"code$i",
        IvfIndex.assignCell(
          slice(col("v"), i * pq.subDim + 1, pq.subDim),
          IvfIndex.Model(book)))
    }.drop("v")
    Index(Model(coarse.model, pq), codes)
  }

  /** ADC top-k restricted to each query's `nProbe` nearest cells.
    *
    * Result: (query_id, rank, vec_id, adc_dist) — rank by (adc_dist asc,
    * vec_id asc), adc_dist = squared distance to the candidate's
    * reconstruction `centroid(cell) + decode(codes)`, rounded 6dp.
    */
  def probe(
      queries: DataFrame,
      queryIdCol: String,
      queryVecCol: String,
      index: Index,
      nProbe: Int,
      k: Int
  ): DataFrame = {
    val model = index.model
    // Reconstruction side: codes + broadcast codebooks only. The decoded
    // residual is the per-subspace centroid lookup; the full candidate
    // reconstruction adds the coarse centroid back (both native codegen).
    val rrecon = concat((0 until model.pq.m).map { i =>
      element_at(typedLit(model.pq.codebooks(i)), col(s"code$i") + 1)
    }: _*)
    val recon = index.codes
      .join(broadcast(centsDF(index.codes, model.coarse)), "cell")
      .select(col("cell"), col("id"),
        call_function("graft_vec_add", col("ccent"), rrecon).as("recon"))

    // Probe side: (query_id, cell, q) — |queries|·nProbe rows, broadcast.
    // graft_cell_topk ranks cells by the same distance arithmetic and
    // tie-break as the assignment, so probes(0) ≡ the query's own cell.
    val probes = queries
      .select(col(queryIdCol).as("query_id"),
        VectorOps.toDouble(col(queryVecCol)).as("q"))
      .select(col("query_id"), col("q"),
        explode(IvfIndex.probeCells(col("q"), model.coarse, nProbe)).as("cell"))

    val dist = (call_function("graft_dot", col("q"), col("q")) -
      lit(2.0) * call_function("graft_dot", col("q"), col("recon"))) +
      call_function("graft_dot", col("recon"), col("recon"))

    // Bounded top-k aggregate on NEGATED distance (TopKAgg keeps highest
    // score, ties → smallest payload — exactly (dist asc, id asc) after
    // the sign flip; IEEE negation is exact so no value changes).
    recon.join(broadcast(probes), "cell")
      .select(col("query_id"), col("id"), negate(dist).as("nscore"))
      .groupBy(col("query_id"))
      .agg(call_function("graft_topk", col("nscore"), col("id"), lit(k)).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        col("col.payload").as("vec_id"),
        round(negate(col("col.score")), 6).as("adc_dist"))
  }
}
