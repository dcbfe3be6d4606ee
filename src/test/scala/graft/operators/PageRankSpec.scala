package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  test("symmetric star: hub outranks identical leaves, mass is conserved") {
    val leaves = (1L to 10L)
    val edges = (leaves.map(l => (0L, l)) ++ leaves.map(l => (l, 0L)))
      .toDF("src", "dst")
    val ranks = PageRank.run(edges, iterations = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(leaves.forall(l => ranks(0L) > ranks(l)), s"hub must dominate: $ranks")
    assert(leaves.map(ranks).distinct.size == 1, s"leaves symmetric: $ranks")
    // Symmetric graph has no dangling mass; 12dp rounding wobbles the
    // total by < n*5e-13.
    val total = ranks.values.sum
    assert(math.abs(total - 1.0) < 1e-9, s"mass not conserved: $total")
  }

  test("deterministic across runs on the trade graph") {
    val dir = "/root/testdata/sf0.001"
    def edges = {
      val pairs = graft.sources.Tables.load(spark, dir, "lineitem")
        .select("l_orderkey", "l_suppkey")
        .join(graft.sources.Tables.load(spark, dir, "orders")
            .select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .select((col("l_suppkey") + 1000000L).as("supp"),
          col("o_custkey").as("cust"))
        .distinct()
      pairs.select(col("supp").as("src"), col("cust").as("dst"))
        .unionAll(pairs.select(col("cust").as("src"), col("supp").as("dst")))
    }
    val a = PageRank.run(edges, iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = PageRank.run(edges, iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a == b)
    assert(a.values.forall(_ > 0.0))
  }

  test("durable checkpointing yields identical ranks (the 100-TB mode)") {
    val leaves = (1L to 10L)
    val edges = (leaves.map(l => (0L, l)) ++ leaves.map(l => (l, 0L)))
      .toDF("src", "dst")
    val dir = tmpDir("pagerank-ckpt")
    val ephemeral = PageRank.run(edges, iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val durable = PageRank.run(edges, iterations = 3, checkpointDir = Some(dir))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(durable == ephemeral)
    // every iteration materialized a durable round, plus the static frames
    for (t <- Seq("edges", "outdeg", "nodes", "ranks1", "ranks2", "ranks3"))
      assert(new java.io.File(dir, t).exists(), s"missing durable round $t")
  }
}
