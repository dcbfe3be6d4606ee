package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Gates for the composed IVF-PQ index (q179).
  *
  * The cross-engine replay silently relies on two data-dependent
  * properties beyond what KMeansSpec (coarse margins, k=4 recipe) and
  * PqSpec (raw-vector subspace margins) already pin:
  *   - residual-subspace encode margins at EVERY training round (the
  *     oracle unrolls intermediate assignments too, and residuals are a
  *     different distribution than raw vectors), and
  *   - the probe-cell ranking margin at the nProbe boundary (a tie
  *     between cells ranked nProbe and nProbe+1 would make the candidate
  *     set engine-order-dependent).
  * Plus the behavioral contract of the probe itself.
  */
class IvfPqSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val NCells = 4
  private val CoarseIters = 2
  private val M = 4
  private val Ksub = 4
  private val PqIters = 2

  private def emb = graft.sources.Tables.load(spark, dir, "embeddings")

  private lazy val index = IvfPq.build(emb, "vec_id", "embedding",
    NCells, CoarseIters, M, Ksub, PqIters)

  private def queries = emb.filter(col("vec_id") % 37 === 0)

  import RefDist.sqDist

  /** Driver-side residual frame: (id, cell, residual). */
  private lazy val residuals: Array[(Long, Int, Array[Double])] = {
    val coarse = KMeansLloyd.fit(emb, "vec_id", "embedding", NCells, CoarseIters)
    val cents = coarse.model.centroids.map(_.toArray)
    coarse.assignments.select(col("id"), col("cell"), col("v")).collect().map { r =>
      val v = r.getSeq[Double](2).toArray
      val c = cents(r.getInt(1))
      (r.getLong(0), r.getInt(1), Array.tabulate(v.length)(i => v(i) - c(i)))
    }
  }

  test("graft_vec_sub/graft_vec_add are exact elementwise inverses") {
    import spark.implicits._
    val df = Seq((Seq(1.5, -2.25, 1e-300), Seq(0.5, 3.75, -1e-300)))
      .toDF("a", "b")
      .select(col("a"), col("b"),
        call_function("graft_vec_add", col("b"),
          call_function("graft_vec_sub", col("a"), col("b"))).as("rt"),
        call_function("graft_vec_sub", col("a"), col("b")).as("d"))
    val row = df.head()
    // b + (a - b) is NOT an identity in general IEEE arithmetic, but for
    // these exactly-representable operands it is; the point is wiring
    // (order of operands, no re-association), checked exactly.
    assert(row.getSeq[Double](2) == row.getSeq[Double](0))
    assert(row.getSeq[Double](3) == Seq(1.0, -6.0, 2e-300))
  }

  test("residual-subspace encode margins clear double noise at every training round; codes in range") {
    val subDim = residuals.head._3.length / M
    for (iters <- 0 to PqIters) {
      val residDf = {
        import spark.implicits._
        residuals.toSeq.map { case (id, _, r) => (id, r.toSeq) }.toDF("id", "r")
      }
      val m = ProductQuantizer.train(residDf, "id", "r", M, Ksub, iters)
      for (s <- 0 until M) {
        val book = m.codebooks(s)
        val used = Array.fill(Ksub)(0)
        var minMargin = Double.MaxValue
        residuals.foreach { case (_, _, r) =>
          val sub = r.slice(s * subDim, (s + 1) * subDim)
          val ds = book.map(c => sqDist(sub, c)).toArray
          val best = ds.min
          used(ds.indexOf(best)) += 1
          val margin = (ds.sorted.apply(1) - best) / math.max(best, 1e-12)
          if (margin < minMargin) minMargin = margin
        }
        assert(used.forall(_ > 0), s"iters=$iters residual subspace $s unused code")
        assert(minMargin > 1e-9,
          s"iters=$iters residual subspace $s margin $minMargin too close to double noise")
      }
    }
  }

  test("probe-cell ranking margin at the nProbe boundary clears double noise") {
    val cents = index.model.coarse.centroids
    val qs = queries.select(VectorOps.toDouble(col("embedding")).as("q"))
      .collect().map(_.getSeq[Double](0).toArray)
    var minMargin = Double.MaxValue
    qs.foreach { q =>
      val ds = cents.map(c => sqDist(q, c)).sorted
      // boundary between the probed set (rank nProbe=2) and the first
      // unprobed cell (rank 3), relative.
      val margin = (ds(2) - ds(1)) / math.max(ds(1), 1e-12)
      if (margin < minMargin) minMargin = margin
    }
    assert(minMargin > 1e-9, s"probe boundary margin $minMargin too tight")
  }

  test("probe returns exactly k ranked rows per query, distances non-decreasing, candidates from probed cells only") {
    val k = 5
    val nProbe = 2
    val res = IvfPq.probe(queries, "vec_id", "embedding", index, nProbe, k)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val perQuery = res.groupBy(_._1)
    assert(perQuery.nonEmpty)
    perQuery.foreach { case (qid, rows) =>
      assert(rows.map(_._2).sorted.toSeq == (1 to k), s"query $qid ranks")
      val byRank = rows.sortBy(_._2).map(_._4)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a <= b },
        s"query $qid distances not monotone")
    }
    // Containment: candidate cell ∈ the query's probed cells.
    val cellOf = index.codes.select(col("id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val probed = queries
      .select(col("vec_id"),
        IvfIndex.probeCells(VectorOps.toDouble(col("embedding")),
          index.model.coarse, nProbe).as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toSet).toMap
    res.foreach { case (qid, _, vid, _) =>
      assert(probed(qid).contains(cellOf(vid)), s"query $qid candidate $vid outside probed cells")
    }
  }

  test("widening nProbe to nCells can only improve the best ADC distance") {
    def best(nProbe: Int): Map[Long, Double] =
      IvfPq.probe(queries, "vec_id", "embedding", index, nProbe, k = 1)
        .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val narrow = best(2)
    val wide = best(NCells)
    narrow.foreach { case (qid, d) =>
      assert(wide(qid) <= d + 1e-12, s"query $qid got worse with more probes")
    }
  }

  test("probe plan: equi-join on cell, no cartesian product, codes side carries no vectors") {
    val plan = IvfPq.probe(queries, "vec_id", "embedding", index, nProbe = 2, k = 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "probe plan degenerated to a cartesian")
    assert(!plan.contains("BroadcastNestedLoopJoin"), "probe plan is a nested-loop join")
  }
}
