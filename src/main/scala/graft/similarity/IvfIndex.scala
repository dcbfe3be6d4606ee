package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor — the second scale
  * path beside [[HyperplaneLsh]], trading a small training step for much
  * better-balanced candidate lists on clustered data.
  *
  *  - Train: Lloyd's k-means on a driver-collected sample (the coarse
  *    quantizer is tiny — nCells × dim doubles — and broadcasts as a
  *    literal; training on a bounded sample is the standard FAISS-style
  *    recipe, not a scale compromise).
  *  - Index: assign every vector to its nearest centroid (one narrow
  *    pass; the argmin over nCells dot products is codegen'd arithmetic).
  *  - Search: probe the `nProbe` nearest cells per query and rank
  *    candidates within them — an equi-join on cell id, never O(n²).
  *
  * Deterministic end to end: seeded sample, seeded init, fixed iteration
  * count.
  */
object IvfIndex {

  final case class Model(centroids: Seq[Seq[Double]]) {
    def nCells: Int = centroids.length
  }

  /** Lloyd's k-means (fixed iterations, k-means||-free seeded init) over a
    * sampled collect. Sample size caps driver memory; at 100 TB you still
    * only collect `sampleSize` rows.
    */
  def train(
      vectors: DataFrame,
      vecCol: String,
      nCells: Int,
      iterations: Int = 10,
      sampleSize: Int = 10000,
      seed: Long = 42L
  ): Model = {
    val n = vectors.count()
    val fraction = math.min(1.0, sampleSize.toDouble / math.max(n, 1))
    val sample: Array[Array[Double]] = vectors
      .sample(withReplacement = false, fraction, seed)
      .select(VectorOps.toDouble(col(vecCol)).as("v"))
      .collect()
      .map(_.getSeq[Double](0).toArray)
    require(sample.length >= nCells, s"sample ${sample.length} < nCells $nCells")

    val rng = new scala.util.Random(seed)
    var centroids = rng.shuffle(sample.toSeq).take(nCells).map(_.clone()).toArray

    def nearest(v: Array[Double]): Int = {
      var best = 0; var bestD = Double.MaxValue; var c = 0
      while (c < centroids.length) {
        var d = 0.0; var i = 0
        val ctr = centroids(c)
        while (i < v.length) { val x = v(i) - ctr(i); d += x * x; i += 1 }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      best
    }

    var it = 0
    while (it < iterations) {
      val sums = Array.fill(nCells)(new Array[Double](sample.head.length))
      val counts = new Array[Long](nCells)
      sample.foreach { v =>
        val c = nearest(v)
        counts(c) += 1
        var i = 0
        while (i < v.length) { sums(c)(i) += v(i); i += 1 }
      }
      centroids = Array.tabulate(nCells) { c =>
        if (counts(c) == 0) centroids(c) // empty cell keeps its centroid
        else sums(c).map(_ / counts(c))
      }
      it += 1
    }
    Model(centroids.map(_.toSeq).toSeq)
  }

  /** Index of the nearest centroid (ties → lowest cell id). One native
    * expression over the centroid table as a single nested-array literal
    * ([[graft.functions.CellArgmin]]): the earlier per-cell literal
    * expression tree generated O(nCells·dim) source and fell off the
    * JIT/whole-stage-codegen cliff at ~126 cells × 64 dims — this form
    * holds any nCells at constant generated-code size, with the same
    * arithmetic bit-for-bit (d = (Σv² − 2.0·Σv·c) + Σc², left-to-right,
    * first-minimum tie-break).
    */
  def assignCell(v: Column, model: Model): Column =
    call_function("graft_cell_argmin", v, typedLit(model.centroids))

  /** The `nProbe` nearest cell ids, as an array column — same native
    * table-loop formulation as [[assignCell]] ([[graft.functions
    * .CellTopCells]]; identical distance arithmetic and tie ordering, so
    * `probeCells(...)(0) ≡ assignCell(...)` bit-for-bit at any nCells).
    */
  def probeCells(v: Column, model: Model, nProbe: Int): Column =
    call_function("graft_cell_topk", v, typedLit(model.centroids), lit(nProbe))

  /** Persisted IVF index: the coarse quantizer plus per-vector cell
    * assignments with vectors + norms for exact-cosine verification —
    * the IVF twin of [[HyperplaneLsh.Index]] (q87/q96): a query batch
    * probes the assignments instead of re-assigning the corpus. The
    * assignments member is a plain DataFrame (write as parquet,
    * partitioned/bucketed by `cell` at scale, which ALSO makes the probe
    * join cell-pruned: only the nProbe probed cells are scanned).
    */
  final case class Index(model: Model, assignments: DataFrame)

  /** Assign every corpus vector to its cell, once. */
  def buildIndex(
      vectors: DataFrame, idCol: String, vecCol: String, model: Model): Index =
    Index(model, vectors
      .select(col(idCol).as("id"), VectorOps.toDouble(col(vecCol)).as("v"))
      .withColumn("n", VectorOps.norm(col("v")))
      .withColumn("cell", assignCell(col("v"), model))
      .select(col("cell"), col("id"), col("v"), col("n")))

  /** Extend a persisted index with a NEW vector batch against the FROZEN
    * coarse quantizer — the FAISS `add` analogue, and the embedding-side
    * twin of `MinHashDedup.extendIndex` (rolling ingest, q231/q232):
    * cost ∝ batch (one narrow codegen assignment pass + a union of
    * parquet-backed assignments), never corpus. The model is
    * deliberately NOT retrained: frozen centroids are what make the
    * extended index EXACTLY equal a from-scratch rebuild over the union
    * (same vector → same argmin → same cell; IvfExtendSpec pins frame
    * equality), and what makes rolling ingest order-insensitive across
    * batches. Distribution drift therefore shows up as cell SKEW rather
    * than silent recall decay — watch [[cellOccupancy]] and
    * retrain+rebuild past a skew budget (the FAISS retrain discipline).
    */
  def extendIndex(
      index: Index, newVectors: DataFrame, idCol: String, vecCol: String): Index =
    Index(index.model,
      index.assignments.unionByName(
        buildIndex(newVectors, idCol, vecCol, index.model).assignments))

  /** Compact a (repeatedly extended) index — same union-lineage
    * maintenance as `MinHashDedup.compactIndex`: parquet round-trip of
    * the assignments frame under `dir`, lineage depth reset to one scan,
    * files doubling as the index's durable restart form (pair with a
    * persisted [[Model]] — the centroids are a driver-held literal).
    * Row-for-row the same index (CompactIndexSpec pins probe equality);
    * the frozen quantizer rides along unchanged. At real scale,
    * partition the write by `cell` so the probe join scans only the
    * nProbe probed cells (the [[Index]] scaladoc's layout note).
    */
  def compactIndex(index: Index, dir: String): Index = {
    val spark = index.assignments.sparkSession
    val path = s"${dir.stripSuffix("/")}/assignments"
    index.assignments.write.mode("overwrite").parquet(path)
    Index(index.model, spark.read.parquet(path))
  }

  /** Per-cell occupancy of the index: `(cell, n_vectors, share)` — one
    * row for EVERY model cell, zero rows included (a fully-drained cell
    * is the strongest drift signal, so it must be visible, not absent),
    * the skew report behind the retrain decision. A healthy index keeps
    * max(share) within a small multiple of 1/nCells; a drifting ingest
    * concentrates new mass in few cells long before probe recall
    * visibly decays. (The total lands on the driver — one long per
    * report, not a single-partition window.)
    */
  def cellOccupancy(index: Index): DataFrame = {
    val spark = index.assignments.sparkSession
    val total = index.assignments.count()
    val counts = index.assignments.groupBy(col("cell"))
      .agg(count(lit(1)).as("occ"))
    spark.range(index.model.nCells).select(col("id").cast("int").as("cell"))
      .join(counts, Seq("cell"), "left")
      .select(col("cell"),
        coalesce(col("occ"), lit(0L)).as("n_vectors"),
        round(coalesce(col("occ"), lit(0L)) /
          lit(math.max(1L, total).toDouble), 6).as("share"))
  }

  /** Probe the index with a NEW query batch: per query, the best cosine
    * and candidate count among vectors in its `nProbe` nearest cells
    * (cells partition the corpus, so the plain count IS the distinct
    * count). Cost ∝ the BATCH: query-side quantization is per-row
    * codegen arithmetic against the broadcast centroid literals, the
    * cell equi-join probes corpus assignments without repartitioning
    * them, and the per-query aggregate rides the join's partitioning.
    * Queries probing only empty cells are absent from the output.
    *
    * Sizing rule (the IVF analogue of the LSH log-n planes rule): cell
    * occupancy is n / nCells, so nCells should grow ~√corpus to balance
    * quantization cost (nCells distances per query) against candidate
    * verification (nProbe × occupancy per query) — both then grow as
    * √corpus. The literal-centroid codegen formulation is comfortable to
    * a few hundred cells; past that, quantize via a broadcast centroid
    * ARRAY (one expression, loop inside) before expression size bites.
    */
  def probe(
      queries: DataFrame,
      index: Index,
      idCol: String,
      vecCol: String,
      nProbe: Int = 3
  ): DataFrame = {
    val q = queries
      .select(col(idCol).as("id"), VectorOps.toDouble(col(vecCol)).as("v"))
      .withColumn("n", VectorOps.norm(col("v")))
      .withColumn("probes", probeCells(col("v"), index.model, nProbe))
      .localCheckpoint()
    q.select(col("id").as("query_id"), explode(col("probes")).as("cell"))
      .join(index.assignments.select(col("cell"), col("v").as("cv"), col("n").as("cn")),
        "cell")
      .join(q.select(col("id").as("query_id"), col("v").as("qv"), col("n").as("qn")),
        "query_id")
      .withColumn("cosine", VectorOps.cosineFromNorms(
        VectorOps.dot(col("qv"), col("cv")), col("qn"), col("cn")))
      .groupBy(col("query_id"))
      .agg(
        count(lit(1)).as("n_candidates"),
        round(max(col("cosine")), 6).as("best_cosine"))
  }

  /** Approximate per-query top-k by cosine over the probed cells.
    * Candidates come from an equi-join on cell id; ranking is exact
    * within the candidate set.
    */
  def approxTopK(
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      model: Model,
      k: Int,
      nProbe: Int = 3
  ): DataFrame = {
    // One pass computes norm + cell + probe list per vector,
    // localCheckpoint'ed: both sides of the candidate self-join read the
    // materialized blocks instead of re-evaluating the nCells-centroid
    // distance expressions, and the ContextCleaner releases the blocks
    // when the frame is unreferenced (persist() would leak — nothing
    // unpersists when a plan finishes).
    val v = vectors.select(
      col(idCol).as("id"), VectorOps.toDouble(col(vecCol)).as("v"))
      .withColumn("n", VectorOps.norm(col("v")))
      .withColumn("cell", assignCell(col("v"), model))
      .withColumn("probes", probeCells(col("v"), model, nProbe))
      .localCheckpoint()

    val indexed = v.select(col("cell"), col("id"), col("v"), col("n"))
    val probes = v.select(
      col("id").as("query_id"), col("v").as("qv"), col("n").as("qn"),
      explode(col("probes")).as("cell"))

    // Bounded top-k aggregate, not a window: the partial phase trims each
    // query's candidate list to k before the exchange (see BruteForceKnn).
    probes
      .join(indexed.select(col("cell"), col("id").as("neighbor_id"),
        col("v").as("cv"), col("n").as("cn")), "cell")
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        VectorOps.cosineFromNorms(VectorOps.dot(col("qv"), col("cv")),
          col("qn"), col("cn")).as("cosine"))
      .groupBy(col("query_id"))
      .agg(call_function("graft_topk", col("cosine"), col("neighbor_id"), lit(k)).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), col("col.payload").as("neighbor_id"),
        (col("pos") + 1).cast("int").as("rnk"),
        round(col("col.score"), 6).as("cosine"))
  }
}
