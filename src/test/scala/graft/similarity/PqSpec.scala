package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Gates for product quantization (q138/q139) — same contract class as
  * KMeansSpec: pin the data-dependent properties the cross-engine
  * replay silently relies on, plus wiring checks for encode/ADC.
  */
class PqSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val M = 4
  private val Ksub = 4

  private def emb = graft.sources.Tables.load(spark, dir, "embeddings")

  private def model = ProductQuantizer.train(emb, "vec_id", "embedding",
    m = M, ksub = Ksub, iterations = 2)

  import RefDist.sqDist

  test("per-subspace encode margins are far above double noise at EVERY training round; every final code used") {
    val vectors = emb.select(VectorOps.toDouble(col("embedding")).as("v"))
      .collect().map(_.getSeq[Double](0).toArray)
    // The oracle unrolls the intermediate assignments too (s{i}a1
    // against the seed, s{i}a2 against c1), so the margin gate must
    // cover every round's codebooks, not only the final model's.
    for (iters <- 0 to 2) {
      val m = ProductQuantizer.train(emb, "vec_id", "embedding",
        m = M, ksub = Ksub, iterations = iters)
      for (s <- 0 until M) {
        val book = m.codebooks(s)
        val used = Array.fill(Ksub)(0)
        var minMargin = Double.MaxValue
        vectors.foreach { v =>
          val sub = v.slice(s * m.subDim, (s + 1) * m.subDim)
          val ds = book.map(c => sqDist(sub, c)).toArray
          val best = ds.min
          used(ds.indexOf(best)) += 1
          val margin = (ds.sorted.apply(1) - best) / math.max(best, 1e-12)
          if (margin < minMargin) minMargin = margin
        }
        assert(used.forall(_ > 0),
          s"iters=$iters subspace $s unused code: ${used.toSeq}")
        // Same 1e-9 floor rationale as KMeansSpec: ~1e-12 summation-
        // order noise, three orders of safety.
        assert(minMargin > 1e-9,
          s"iters=$iters subspace $s encode margin $minMargin too close to double noise")
      }
    }
  }

  test("codes are in range and encoding is deterministic") {
    val m = model
    val codes = ProductQuantizer.encode(emb, "vec_id", "embedding", m)
    val rows = codes.collect()
    assert(rows.length == emb.count())
    for (i <- 0 until M) {
      val vals = rows.map(_.getAs[Int](s"code$i"))
      assert(vals.forall(c => c >= 0 && c < Ksub), s"code$i out of range")
    }
    val again = ProductQuantizer.encode(emb, "vec_id", "embedding", m)
      .collect().toSeq
    assert(rows.toSeq == again)
  }

  test("ADC score equals the driver-recomputed distance to the reconstruction") {
    val m = model
    val codes = ProductQuantizer.encode(emb, "vec_id", "embedding", m)
    val queries = emb.filter(col("vec_id") % 50 === 0)
    val got = ProductQuantizer.adcTopK(queries, "vec_id", "embedding", codes, m, k = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val vecs = emb.select(col("vec_id"), VectorOps.toDouble(col("embedding")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val codeRows = codes.collect()
      .map(r => r.getLong(0) -> (0 until M).map(i => r.getAs[Int](s"code$i"))).toMap
    got.foreach { case ((qid, vid), adc) =>
      val recon = (0 until M).flatMap(i => m.codebooks(i)(codeRows(vid)(i))).toArray
      val expected = sqDist(vecs(qid), recon.toSeq)
      assert(math.abs(adc - math.rint(expected * 1e6) / 1e6) < 1e-9,
        s"ADC mismatch for ($qid,$vid): $adc vs $expected")
    }
  }

  test("quantization error is well below the inter-vector spread (codebooks learned the data)") {
    // At ksub=4 the code grid is coarse, so a vector's own code is NOT
    // guaranteed into its ADC top-k (distinct vectors share
    // reconstructions) — the meaningful property is that the mean
    // self-reconstruction error is far below the mean distance to OTHER
    // vectors' reconstructions; a broken codebook (e.g. unused cells,
    // collapsed centroids) fails this immediately.
    val m = model
    val codeRows = ProductQuantizer.encode(emb, "vec_id", "embedding", m)
      .collect()
      .map(r => r.getLong(0) -> (0 until M).map(i => r.getAs[Int](s"code$i"))).toMap
    val vecs = emb.select(col("vec_id"), VectorOps.toDouble(col("embedding")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def recon(id: Long): Seq[Double] =
      (0 until M).flatMap(i => m.codebooks(i)(codeRows(id)(i)))
    val ids = vecs.keys.toSeq.sorted
    val self = ids.map(id => sqDist(vecs(id), recon(id)))
    val cross = for (q <- ids; x <- ids if q != x)
      yield sqDist(vecs(q), recon(x))
    val meanSelf = self.sum / self.size
    val meanCross = cross.sum / cross.size
    // The corpus is near-random in 64 dims, so ksub=4 buys ~20% at
    // sf0.001 — the gate is for CODEBOOK COLLAPSE (meanSelf ≈ meanCross
    // when every cell holds the same centroid), not compression bragging.
    assert(meanSelf < 0.95 * meanCross,
      s"quantization error $meanSelf not meaningfully below the spread $meanCross")
  }
}
