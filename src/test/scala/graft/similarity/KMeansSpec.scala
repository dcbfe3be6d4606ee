package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Gates for the distributed Lloyd fit (q135/q136). Beyond the oracle
  * hash-match, these pin the properties the cross-engine replay SILENTLY
  * depends on, so a testdata regeneration that breaks them fails here
  * with a message instead of flipping a hash:
  *  - argmin margin: every vector's best-vs-second-best centroid
  *    distance gap is far above double noise (a near-tie would make the
  *    assignment depend on summation order);
  *  - no empty cells at any iteration (the engine keeps the old centroid
  *    for an empty cell; the SQL replay's mean-update CTE would drop it);
  *  - determinism: two fits produce identical centroids;
  *  - Lloyd behavior: more iterations never worsen total inertia beyond
  *    the 6dp centroid-rounding wobble.
  */
class KMeansSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val k = 4

  private def emb = graft.sources.Tables.load(spark, dir, "embeddings")

  import RefDist.sqDist

  test("assignment margins are far above double noise; no empty cells at any iteration") {
    val vectors = emb.select(VectorOps.toDouble(col("embedding")).as("v"))
      .collect().map(_.getSeq[Double](0).toArray)
    // Replay the fit per-iteration so EVERY round's assignment is
    // margin-checked — including iters=0, the assignment against the
    // raw lowest-id SEED (the oracle's a1 CTE runs against c0 too).
    for (iters <- 0 to 3) {
      val model = KMeansLloyd.fit(emb, "vec_id", "embedding", k, iters).model
      val cells = Array.fill(k)(0)
      var minMargin = Double.MaxValue
      vectors.foreach { v =>
        val ds = model.centroids.map(c => sqDist(v, c)).toArray
        val best = ds.min
        cells(ds.indexOf(best)) += 1
        val second = ds.sorted.apply(1)
        val margin = (second - best) / math.max(best, 1e-12)
        if (margin < minMargin) minMargin = margin
      }
      assert(cells.forall(_ > 0), s"iters=$iters empty cell: ${cells.toSeq}")
      // Floor rationale: both engines run the SAME sequential
      // left-to-right double sums over identical inputs, so cross-engine
      // distance disagreement is bounded by summation-order noise
      // (~1e-12 relative on 64-term sums). 1e-9 = three orders of
      // safety; the observed seed-round minimum on this data is ~1.5e-7.
      assert(minMargin > 1e-9,
        s"iters=$iters argmin margin $minMargin too close to double noise " +
          "— the cross-engine assignment replay is no longer safe on this data")
    }
  }

  test("fit is deterministic across runs") {
    val a = KMeansLloyd.fit(emb, "vec_id", "embedding", k, iterations = 3).model
    val b = KMeansLloyd.fit(emb, "vec_id", "embedding", k, iterations = 3).model
    assert(a.centroids == b.centroids)
  }

  test("durable checkpointing yields the identical model (the 100-TB mode)") {
    val dir = tmpDir("kmeans-ckpt")
    val ephemeral = KMeansLloyd.fit(emb, "vec_id", "embedding", k, iterations = 2)
    val durable = KMeansLloyd.fit(emb, "vec_id", "embedding", k, iterations = 2,
      checkpointDir = Some(dir))
    assert(durable.model.centroids == ephemeral.model.centroids)
    assert(new java.io.File(dir, "vectors").exists())
    assert(durable.assignments.collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
      == ephemeral.assignments.collect().map(r => r.getLong(0) -> r.getInt(2)).toMap)
  }

  test("inertia does not increase with more Lloyd iterations (mod 6dp rounding wobble)") {
    def total(iters: Int): Double =
      KMeansLloyd.inertia(KMeansLloyd.fit(emb, "vec_id", "embedding", k, iters))
        .agg(sum(col("inertia"))).head.getDouble(0)
    val i1 = total(1)
    val i3 = total(3)
    assert(i3 <= i1 * (1.0 + 1e-6), s"inertia rose: 1-iter $i1 -> 3-iter $i3")
  }

  test("assignments cover every vector exactly once and cells agree with the model") {
    val r = KMeansLloyd.fit(emb, "vec_id", "embedding", k, iterations = 3)
    val n = emb.count()
    assert(r.assignments.count() == n)
    assert(r.assignments.select("id").distinct().count() == n)
    val cells = r.assignments.select("cell").distinct()
      .collect().map(_.getInt(0)).sorted.toSeq
    assert(cells.forall(c => c >= 0 && c < k), s"cells out of range: $cells")
  }
}
