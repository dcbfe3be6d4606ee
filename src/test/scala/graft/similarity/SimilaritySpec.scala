package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def vecs(rows: (Long, Seq[Double])*) =
    rows.toSeq.toDF("vec_id", "embedding")

  test("dot/norm/cosine on known vectors") {
    val df = Seq((Seq(1.0, 0.0), Seq(0.0, 1.0), Seq(3.0, 4.0))).toDF("a", "b", "c")
      .select(
        VectorOps.dot(col("a"), col("b")).as("ab"),
        VectorOps.norm(col("c")).as("nc"),
        VectorOps.cosine(col("a"), col("a")).as("aa"))
    val r = df.head()
    assert(r.getDouble(0) == 0.0)
    assert(r.getDouble(1) == 5.0)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-12)
  }

  test("brute-force topK ranks by cosine with deterministic ties") {
    val df = vecs(
      1L -> Seq(1.0, 0.0),
      2L -> Seq(0.9, 0.1), // closest to 1
      3L -> Seq(0.0, 1.0), // orthogonal to 1
      4L -> Seq(-1.0, 0.0)) // opposite to 1
    val top = BruteForceKnn.topK(df, df, "vec_id", "embedding", k = 2)
      .filter(col("query_id") === 1L).orderBy("rnk")
      .collect().map(r => (r.getAs[Long]("neighbor_id"), r.getAs[Int]("rnk")))
    assert(top.toSeq == Seq((2L, 1), (3L, 2)))
  }

  test("graft_topk agrees with the row_number window on the sf0.001 embeddings") {
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val agg = BruteForceKnn.topK(emb, emb, "vec_id", "embedding", k = 3)
    // Independent ground truth: the window formulation graft_topk replaced.
    val v = emb.select(col("vec_id"), VectorOps.toDouble(col("embedding")).as("v"))
      .withColumn("n", VectorOps.norm(col("v")))
    val windowed = v.as("q").crossJoin(v.as("c"))
      .filter(col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"),
        (VectorOps.dot(col("q.v"), col("c.v")) / (col("q.n") * col("c.n"))).as("cosine"))
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("neighbor_id"))))
      .filter(col("rnk") <= 3)
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"), r.getAs[Int]("rnk"))
    assert(agg.collect().map(key).toSet == windowed.collect().map(key).toSet)
  }

  test("zero-norm vectors don't crash ANSI division; they rank nowhere") {
    val df = vecs(
      1L -> Seq(1.0, 0.0),
      2L -> Seq(0.9, 0.1),
      3L -> Seq(0.0, 0.0)) // zero vector: cosine undefined
    val top = BruteForceKnn.topK(df, df, "vec_id", "embedding", k = 2).collect()
    // null cosines are skipped by the aggregate: the zero vector is never
    // a neighbor, and as a query it has no ranked rows at all
    assert(!top.exists(r => r.getAs[Long]("neighbor_id") == 3L))
    assert(!top.exists(r => r.getAs[Long]("query_id") == 3L))
    val pairs = BruteForceKnn.nearDuplicatePairs(df, "vec_id", "embedding", 0.0)
    assert(!pairs.collect().exists(r => r.getLong(0) == 3L || r.getLong(1) == 3L))
  }

  test("nearDuplicatePairs finds exactly the high-cosine pair") {
    val df = vecs(
      1L -> Seq(1.0, 0.0, 0.0),
      2L -> Seq(0.999, 0.001, 0.0),
      3L -> Seq(0.0, 1.0, 0.0))
    val pairs = BruteForceKnn.nearDuplicatePairs(df, "vec_id", "embedding", threshold = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)))
  }

  test("hyperplane LSH: identical vectors share a bucket and are found") {
    val df = vecs(
      1L -> Seq.fill(8)(0.5),
      2L -> Seq.fill(8)(0.5), // exact duplicate of 1
      3L -> Seq.tabulate(8)(i => if (i % 2 == 0) 1.0 else -1.0))
    val nn = HyperplaneLsh.approxNearest(df, "vec_id", "embedding", nPlanes = 4, dim = 8)
      .collect().map(r => r.getAs[Long]("query_id") -> r.getAs[Double]("best_cosine")).toMap
    assert(math.abs(nn(1L) - 1.0) < 1e-9)
    assert(math.abs(nn(2L) - 1.0) < 1e-9)
  }

  test("LSH near-dup pairs are a verified subset of the exact pairs with high recall") {
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1))
    val exact = BruteForceKnn.nearDuplicatePairs(emb, "vec_id", "embedding", threshold = 0.4)
      .collect().map(key).toSet
    val found = HyperplaneLsh
      .nearDuplicatePairs(emb, "vec_id", "embedding", threshold = 0.4, nTables = 8)
      .collect().map(key).toSet
    assert(found.subsetOf(exact), "every LSH pair must be exact-verified")
    assert(found.size >= (exact.size * 0.8).toInt,
      s"recall ${found.size}/${exact.size} below the 0.8 floor")
  }

  test("LSH recall on the sf0.001 embeddings is bounded by brute force") {
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val brute = BruteForceKnn.topK(emb, emb, "vec_id", "embedding", k = 1)
      .select(col("query_id"), col("cosine").as("best"))
    val ann = HyperplaneLsh.approxNearest(emb, "vec_id", "embedding")
      .select(col("query_id"), col("best_cosine"))
    val joined = ann.join(brute, "query_id")
      .select(count(lit(1)).as("n"),
        // 1e-6 headroom: approxNearest rounds to 6dp, which can round up
        // past the exact (unrounded) brute-force cosine.
        sum((col("best_cosine") <= col("best") + 1e-6).cast("long")).as("bounded"))
      .head()
    assert(joined.getLong(0) > 0)
    assert(joined.getLong(0) == joined.getLong(1), "ANN best cosine must never exceed exact best")
  }
}

class QuantizeSpec extends graft.SparkSpec {
  import org.apache.spark.sql.functions._

  test("int8 round-trip keeps cosine within 1% on real embeddings") {
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val v = VectorOps.toDouble(col("embedding"))
    val deq = Quantize.fromInt8(Quantize.toInt8(v))
    val worst = emb
      .select(VectorOps.cosine(v, deq).as("c"))
      .agg(min(col("c"))).head().getDouble(0)
    assert(worst > 0.99, s"worst-case self-cosine after quantization: $worst")
  }

  test("zero vector quantizes without dividing by zero") {
    import spark.implicits._
    val z = Seq(Seq(0.0, 0.0, 0.0)).toDF("v")
      .select(Quantize.fromInt8(Quantize.toInt8(col("v"))).as("r"))
      .head().getSeq[Double](0)
    assert(z == Seq(0.0, 0.0, 0.0))
  }
}
