package graft.similarity

import scala.util.Random

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Random-hyperplane LSH (Charikar '02 SRP) — the approximate scale path
  * for cosine similarity search.
  *
  * Each vector gets an `nPlanes`-bit signature (bit i = sign of the dot
  * product with Gaussian hyperplane i); vectors are bucketed by signature,
  * and search only compares within a bucket (plus, optionally, all
  * Hamming-distance-1 probe buckets — multi-probe trades one more
  * candidate fan-out for recall without more tables).
  *
  * P[bit match] = 1 - θ/π, so a 0.4-cosine pair (θ ≈ 66°) agrees on a
  * 6-bit signature with p ≈ 0.63^6 ≈ 6% per table — hence multi-probe
  * and/or a handful of signature repetitions in practice. The point of
  * the structure is the *plan*: candidate generation is one narrow
  * projection + one equi-join on a small long key, never O(n²).
  *
  * Hyperplanes are pseudo-random but deterministic (fixed seed), so plans
  * are reproducible run-to-run.
  */
object HyperplaneLsh {

  /** `nPlanes` Gaussian hyperplanes of dimension `dim`, seeded. */
  def planes(dim: Int, nPlanes: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rng = new Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(rng.nextGaussian()))
  }

  /** Signature column: long bucket id from sign bits of plane dots. */
  def signature(vec: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(VectorOps.dot(vec, typedLit(p)) > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))

  /** Buckets at Hamming distance ≤ 1 from the signature (the signature
    * itself plus one bit-flip per plane).
    */
  def probeBuckets(sig: Column, nPlanes: Int): Column =
    array(sig +: (0 until nPlanes).map(i => sig.bitwiseXOR(shiftleft(lit(1L), i))): _*)

  /** Approximate per-query nearest neighbor: best cosine among bucket
    * candidates, with the distinct-candidate count for recall
    * diagnostics. Queries with an empty candidate set are absent from
    * the output.
    *
    * `nTables` independent signature tables (the standard LSH recall
    * knob: P[miss] decays exponentially in L) share one plan — each
    * vector indexes under `nTables` bucket ids (table id in the high
    * bits keeps tables disjoint), each query probes its Hamming-≤1 ball
    * in every table, and candidate generation stays one equi-join on a
    * long key. Like [[nearDuplicatePairs]], candidate generation and
    * pair dedup run on SKINNY (id, bucket) rows — a pair colliding in
    * several tables/probes collapses BEFORE the dim-double vectors are
    * attached (up to nTables × (nPlanes + 1) fan-out through the bucket
    * join otherwise rides on ~35× heavier rows), and the exact cosine
    * is evaluated once per unique pair. NOTE this skinny-then-reattach
    * shape is right here because collisions duplicate pairs; in
    * [[IvfIndex.approxTopK]] a pair occurs at most once (each vector
    * indexes in exactly ONE cell), so the same rewrite there would only
    * add a shuffle of the biggest intermediate. On a broadcast-sized
    * input the dedup exchange costs ~1 s that the duplicate cosines
    * never did (measured at sf0.1: 2k vectors, ~1.7M collision rows) —
    * the price of the plan that survives when neither side broadcasts.
    */
  def approxNearest(
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      nPlanes: Int = 6,
      seed: Long = 42L,
      dim: Int = 64,
      nTables: Int = 4
  ): DataFrame = {
    val v = signedFrame(vectors, idCol, vecCol, nPlanes, seed, dim, nTables)

    val probes = v
      .select(col("id").as("query_id"),
        explode(flatten(array((0 until nTables).map(t =>
          probeBuckets(col(s"sig_$t"), nPlanes)): _*))).as("bucket"))
    val cands = v
      .select(col("id").as("neighbor_id"),
        explode(array((0 until nTables).map(t => col(s"sig_$t")): _*)).as("bucket"))
    val pairs = probes
      .join(cands, "bucket")
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"))
      .distinct()

    bestAmongCandidates(pairs, qVecs = v, cVecs = v)
  }

  /** Shared verification tail of [[approxNearest]] and [[probe]]: exact
    * cosine per distinct (query, neighbor) candidate, then per-query
    * best + candidate count. Neighbor reattach FIRST, query reattach
    * LAST: when these run as shuffle joins (the 100-TB regime), the
    * final join leaves the frame partitioned by query_id and the groupBy
    * reuses that exchange instead of adding one more.
    */
  private def bestAmongCandidates(
      pairs: DataFrame, qVecs: DataFrame, cVecs: DataFrame): DataFrame =
    pairs
      .join(cVecs.select(col("id").as("neighbor_id"), col("v").as("cv"), col("n").as("cn")),
        "neighbor_id")
      .join(qVecs.select(col("id").as("query_id"), col("v").as("qv"), col("n").as("qn")),
        "query_id")
      .withColumn("cosine", VectorOps.cosineFromNorms(
        VectorOps.dot(col("qv"), col("cv")), col("qn"), col("cn")))
      .groupBy(col("query_id"))
      // pairs are distinct, so a plain count IS the distinct-neighbor
      // count the recall diagnostics want
      .agg(
        count(lit(1)).as("n_candidates"),
        round(max(col("cosine")), 6).as("best_cosine"))

  /** Embedding-space near-duplicate pairs at cosine ≥ threshold — the
    * semantic-dedup scale path (the exact counterpart is
    * [[BruteForceKnn.nearDuplicatePairs]], O(n²)). Candidates are pairs
    * whose signatures land within Hamming ≤ 1 of each other in ANY of
    * the `nTables` tables (the probe ball on one side covers the
    * distance-1 case); every candidate is then verified with the exact
    * cosine, so false positives are impossible and the only loss is
    * recall on pairs missing every table — P[miss] ≈ (1 - p₁)^L with
    * p₁ = P[Hamming ≤ 1 in one table], e.g. ≥ 0.98 recall at cosine
    * 0.8 with 4×6-bit tables.
    */
  def nearDuplicatePairs(
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      nPlanes: Int = 6,
      seed: Long = 42L,
      dim: Int = 64,
      nTables: Int = 4
  ): DataFrame = {
    val v = signedFrame(vectors, idCol, vecCol, nPlanes, seed, dim, nTables)
    // Candidate generation and dedup run on SKINNY (id, bucket) rows:
    // a hot bucket fans a pair out up to nTables × (nPlanes + 1) ways,
    // and dragging the dim-double vectors through that join + distinct
    // shuffle multiplied the shuffle bytes ~60× (measured 28 s at sf0.1
    // before this split, 1-2 s after). Vectors re-attach by id for the
    // one exact-cosine verification per surviving pair — two hash joins
    // the optimizer can broadcast when the vector side is small.
    val probeSide = v
      .select(col("id").as("id_a"),
        explode(flatten(array((0 until nTables).map(t =>
          probeBuckets(col(s"sig_$t"), nPlanes)): _*))).as("bucket"))
    val candSide = v
      .select(col("id").as("id_b"),
        explode(array((0 until nTables).map(t => col(s"sig_$t")): _*)).as("bucket"))
    val candidatePairs = probeSide
      .join(candSide, "bucket")
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    candidatePairs
      .join(v.select(col("id").as("id_a"), col("v").as("va"), col("n").as("na")), "id_a")
      .join(v.select(col("id").as("id_b"), col("v").as("vb"), col("n").as("nb")), "id_b")
      .withColumn("cosine", VectorOps.cosineFromNorms(
        VectorOps.dot(col("va"), col("vb")), col("na"), col("nb")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
  }

  /** Persisted ANN index of a corpus: per-table bucket postings for
    * candidate lookup plus the (id, vector, norm) frame for exact-cosine
    * verification — the state that makes similarity search INCREMENTAL
    * (mirror of [[graft.dedup.MinHashDedup.Index]]): a query batch
    * probes the index instead of re-signing the corpus. Both members are
    * plain DataFrames (write as parquet, bucketed by `bucket`/`id` at
    * scale). Signature parameters ride along because probe MUST sign
    * queries with the same hyperplanes.
    *
    * Sizing note for 100 TB: bucket occupancy is ~n / 2^nPlanes per
    * table, so nPlanes should grow with log₂(corpus) to keep per-query
    * candidate counts (and thus probe cost) flat — AnnScaleSpec measures
    * exactly this invariant.
    */
  final case class Index(
      buckets: DataFrame, vecs: DataFrame,
      nPlanes: Int, seed: Long, dim: Int, nTables: Int)

  /** Build the index for `vectors`. */
  def buildIndex(
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      nPlanes: Int = 6,
      seed: Long = 42L,
      dim: Int = 64,
      nTables: Int = 4
  ): Index = {
    val v = signedFrame(vectors, idCol, vecCol, nPlanes, seed, dim, nTables)
    Index(
      v.select(col("id"),
        explode(array((0 until nTables).map(t => col(s"sig_$t")): _*)).as("bucket"))
        .select(col("bucket"), col("id")),
      v.select(col("id"), col("v"), col("n")),
      nPlanes, seed, dim, nTables)
  }

  /** Probe the index with a NEW query batch: per query, the best cosine
    * and distinct-candidate count among vectors sharing any Hamming-≤1
    * bucket in any table. Cost ∝ the BATCH (signing + probe fan-out are
    * per-query; the bucket join probes corpus postings without
    * repartitioning them; candidate dedup and vector re-attach ride
    * skinny id rows) — the corpus contributes scans, never shuffles.
    * Queries with an empty candidate set are absent from the output.
    */
  def probe(
      queries: DataFrame,
      index: Index,
      idCol: String,
      vecCol: String
  ): DataFrame = {
    val q = signedFrame(queries, idCol, vecCol,
      index.nPlanes, index.seed, index.dim, index.nTables)
    val probes = q.select(col("id").as("query_id"),
      explode(flatten(array((0 until index.nTables).map(t =>
        probeBuckets(col(s"sig_$t"), index.nPlanes)): _*))).as("bucket"))
    val cands = probes
      .join(index.buckets.select(col("bucket"), col("id").as("neighbor_id")), "bucket")
      .select(col("query_id"), col("neighbor_id"))
      .distinct()
    bestAmongCandidates(cands, qVecs = q, cVecs = index.vecs)
  }

  /** (id, v, n, sig_0..sig_{nTables-1}): the per-vector signature frame
    * both search entry points build their self-join from. Table t's
    * bucket id carries t in the high bits, keeping tables disjoint
    * under one join key. localCheckpoint'ed: both join sides read the
    * materialized blocks — without it the self-join would evaluate the
    * nTables × nPlanes × dim signature dot products TWICE per vector
    * (the double-evaluation trap SimHash.nearPairs documents); the
    * ContextCleaner releases the blocks once the frame is unreferenced.
    */
  private def signedFrame(vectors: DataFrame, idCol: String, vecCol: String,
                          nPlanes: Int, seed: Long, dim: Int, nTables: Int): DataFrame = {
    val tablePlanes = (0 until nTables).map(t => planes(dim, nPlanes, seed + t))
    val sigCols = tablePlanes.zipWithIndex.map { case (ps, t) =>
      signature(col("v"), ps).bitwiseOR(lit(t.toLong << nPlanes)).as(s"sig_$t")
    }
    vectors.select(
      col(idCol).as("id"),
      VectorOps.toDouble(col(vecCol)).as("v"))
      .withColumn("n", VectorOps.norm(col("v")))
      .select(Seq(col("id"), col("v"), col("n")) ++ sigCols: _*)
      .localCheckpoint()
  }
}
