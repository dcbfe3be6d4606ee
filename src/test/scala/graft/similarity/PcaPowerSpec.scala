package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Differential and structural checks for the integer power-iteration
  * PCA: the quantized trace must track a double-precision power
  * iteration on the same gram (quality), stay inside its declared
  * integer bounds (overflow headroom), and the projection must be the
  * exact integer dot product of the quantized corpus with the final
  * iterate (consistency).
  */
class PcaPowerSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val emb = graft.sources.Tables.load(spark, dir, "embeddings")
  private val (qBits, vBits, iters) = (16, 10, 8)

  private lazy val gramLocal: (Array[Array[Long]], Long) = {
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val g = Array.ofDim[Long](dim, dim)
    PcaPower.gram(emb, qBits).collect()
      .foreach(r => g(r.getInt(0))(r.getInt(1)) = r.getLong(2))
    (g, emb.count())
  }

  test("integer iterate tracks a double-precision iteration round-for-round") {
    // The engineering claim under test is QUANTIZATION FIDELITY: the
    // int64 pipeline (div-N gram, 2^vBits rescale truncation) must land
    // on the same direction a float64 power iteration reaches after the
    // SAME number of rounds. (Convergence to the true eigenvector is a
    // property of the spectrum, not the arithmetic — this corpus is
    // near-isotropic, λ1/λ2 ≈ 1.07, so any fixed-round iterate is still
    // mid-flight; the scaladoc documents that dependence.)
    val (g, n) = gramLocal
    val dim = g.length
    val gn = g.map(_.map(x => if (x < 0) -((-x) / n) else x / n))
    var ref = Array.fill(dim)(1.0)
    for (_ <- 1 to iters) {
      val w = Array.tabulate(dim)(a => (0 until dim).map(b => gn(a)(b).toDouble * ref(b)).sum)
      val nrm = math.sqrt(w.map(x => x * x).sum)
      ref = w.map(_ / nrm)
    }
    val v = PcaPower.iterate(g, n, iters, vBits).last.map(_.toDouble)
    val cos = math.abs(
      v.zip(ref).map { case (a, b) => a * b }.sum /
        (math.sqrt(v.map(x => x * x).sum) * math.sqrt(ref.map(x => x * x).sum)))
    assert(cos > 0.999, s"quantized direction drifted off the float64 path: cos=$cos")
  }

  test("every iterate stays inside the declared integer envelope") {
    val (g, n) = gramLocal
    val trace = PcaPower.iterate(g, n, iters, vBits)
    assert(trace.length == iters + 1)
    // rescale bound: |v| ≤ 2^vBits after every round (the overflow-
    // headroom argument in the scaladoc depends on exactly this)
    trace.drop(1).foreach(v => assert(v.forall(x => math.abs(x) <= (1L << vBits))))
    // the max-|component| lands exactly on ±2^vBits (s divides itself)
    trace.drop(1).foreach(v => assert(v.exists(x => math.abs(x) == (1L << vBits))))
  }

  test("projection is the exact integer dot with the final iterate") {
    val (g, n) = gramLocal
    val vFinal = PcaPower.iterate(g, n, iters, vBits).last
    val proj = PcaPower.project(spark, emb, qBits, vBits, iters)
      .limit(20).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val qx = PcaPower.quantize(emb, qBits)
      .filter(col("vec_id").isin(proj.keys.toSeq: _*))
      .collect().groupBy(_.getLong(0))
    proj.foreach { case (id, p) =>
      val expected = qx(id).map(r => r.getLong(2) * vFinal(r.getInt(1))).sum
      assert(p == expected, s"vec $id: $p != $expected")
    }
  }

  test("the gram shuffle carries only dim² rows (in-row pair expansion)") {
    val p = PcaPower.gram(emb, qBits).queryExecution.executedPlan.toString
    // no self-join of the quantized frame — the pair terms expand inside
    // the row and reduce map-side; one hash exchange total
    assert(!p.contains("Join"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
  }
}
