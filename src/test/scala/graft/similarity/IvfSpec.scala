package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IvfSpec extends SparkSpec {
  import spark.implicits._

  test("assignCell puts identical vectors in the same cell; training is deterministic") {
    val df = Seq(
      (1L, Seq(10.0, 0.0)), (2L, Seq(10.1, 0.0)), (3L, Seq(9.9, 0.1)),
      (4L, Seq(0.0, 10.0)), (5L, Seq(0.1, 9.9)), (6L, Seq(0.0, 10.1))
    ).toDF("vec_id", "embedding")
    val m1 = IvfIndex.train(df, "embedding", nCells = 2, iterations = 5)
    val m2 = IvfIndex.train(df, "embedding", nCells = 2, iterations = 5)
    assert(m1 == m2, "same seed must give identical models")

    val cells = df.select(col("vec_id"), IvfIndex.assignCell(col("embedding").cast("array<double>"), m1).as("c"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(cells(1L) == cells(2L) && cells(2L) == cells(3L))
    assert(cells(4L) == cells(5L) && cells(5L) == cells(6L))
    assert(cells(1L) != cells(4L))
  }

  test("index/probe split: a new batch finds planted originals; empty-cell probes vanish") {
    val corpus = Seq(
      (1L, Seq(10.0, 0.0)), (2L, Seq(10.1, 0.0)), (3L, Seq(9.9, 0.1)),
      (4L, Seq(0.0, 10.0)), (5L, Seq(0.1, 9.9)), (6L, Seq(0.0, 10.1))
    ).toDF("vec_id", "embedding")
    val model = IvfIndex.train(corpus, "embedding", nCells = 2, iterations = 5)
    val index = IvfIndex.buildIndex(corpus, "vec_id", "embedding", model)
    // queries: exact copies of 1 and 4 under new ids, plus a near-variant
    val queries = Seq(
      (101L, Seq(10.0, 0.0)), (104L, Seq(0.0, 10.0)), (105L, Seq(0.2, 9.8))
    ).toDF("vec_id", "embedding")
    val out = IvfIndex.probe(queries, index, "vec_id", "embedding", nProbe = 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out.keySet == Set(101L, 104L, 105L))
    assert(out(101L)._2 == 1.0 && out(104L)._2 == 1.0,
      s"exact copies must find their originals at cosine 1.0: $out")
    // nProbe=1 on a 2-cell index: candidates are exactly the home cell (3 vecs)
    assert(out.values.forall(_._1 == 3L), s"candidate counts: $out")
    assert(out(105L)._2 < 1.0 && out(105L)._2 > 0.99)
  }

  test("native cell-topk matches the struct-sort reference; head equals argmin") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val model = IvfIndex.train(emb, "embedding", nCells = 7)
    val v = VectorOps.toDouble(col("embedding"))
    // Reference: the retired literal formulation — per-cell distance
    // columns, struct array, array_sort, slice. Must agree element-for-
    // element including tie order.
    val refDists = model.centroids.map { ctr =>
      val c = typedLit(ctr)
      VectorOps.dot(v, v) - lit(2.0) * VectorOps.dot(v, c) + lit(ctr.map(x => x * x).sum)
    }
    val refPairs = array(refDists.zipWithIndex.map { case (d, i) =>
      struct(d.as("d"), lit(i).as("cell"))
    }: _*)
    val rows = emb.select(
      col("vec_id"),
      IvfIndex.probeCells(v, model, nProbe = 3).as("fast"),
      transform(slice(array_sort(refPairs), 1, 3), p => p("cell")).as("ref"),
      IvfIndex.assignCell(v, model).as("am"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Int](1) == r.getSeq[Int](2), s"topk mismatch for vec ${r.getLong(0)}")
      assert(r.getSeq[Int](1).head == r.getInt(3), s"head != argmin for vec ${r.getLong(0)}")
    }
  }

  test("IVF recall@1 on sf0.001 embeddings vs brute force") {
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val model = IvfIndex.train(emb, "embedding", nCells = 8)
    val ivf = IvfIndex.approxTopK(emb, "vec_id", "embedding", model, k = 1)
      .select(col("query_id"), col("neighbor_id").as("ivf_nn"), col("cosine").as("ivf_cos"))
    val brute = BruteForceKnn.topK(emb, emb, "vec_id", "embedding", k = 1)
      .select(col("query_id"), col("cosine").as("exact_cos"))

    val joined = brute.join(ivf, Seq("query_id"), "left")
      .agg(
        count(lit(1)).as("n"),
        sum((col("ivf_cos") >= col("exact_cos") - 1e-6).cast("long")).as("hits"),
        sum((col("ivf_cos") > col("exact_cos") + 1e-6).cast("long")).as("violations"))
      .head()
    val (n, hits, violations) =
      (joined.getLong(0), joined.getLong(1), joined.getLong(2))
    assert(violations == 0, "approx cosine can never beat exact")
    // Clustered corpus + 3/8 probes: expect strong recall; pin a floor
    // loose enough to stay stable under centroid-init changes.
    assert(hits.toDouble / n > 0.6, s"recall@1 $hits/$n")
  }
}
