package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Scale smoke for the dedup pipelines: a 10×-replicated corpus (every
  * doc appears 10 times under distinct ids) exercises hot LSH buckets,
  * quadratic intra-bucket pair explosion, and component merging — the
  * stress pattern a crawl corpus exhibits, at test size.
  */
class DedupScaleSpec extends SparkSpec {

  private lazy val corpus10x = {
    val base = graft.sources.Tables
      .load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    (0 until 10).map(i =>
      base.withColumn("doc_id", col("doc_id") + lit(i * 10000L)))
      .reduce(_.unionByName(_))
  }

  test("minhash near-dup on 10x-replicated corpus finds every replica pair") {
    val pairs = MinHashDedup.nearDuplicatePairs(corpus10x, "doc_id", "text", threshold = 0.9)
    // Exact replicas: each of 500 docs → C(10,2)=45 pairs at jaccard 1.0,
    // plus the 25 organic near-dup pairs × 100 replica combinations.
    val exactReplicaPairs = pairs
      .filter(col("id_a") % 10000 === col("id_b") % 10000)
      .count()
    assert(exactReplicaPairs == 500L * 45, s"got $exactReplicaPairs")
  }

  test("connected components collapse each replica group to one component") {
    val edges = MinHashDedup.nearDuplicatePairs(corpus10x, "doc_id", "text", threshold = 0.9)
    val labeled = ConnectedComponents.assign(
      corpus10x.select(col("doc_id").as("id")), edges.select("id_a", "id_b"))
    // 500 base docs; the 25 organic near-dup pairs (jaccard ≥ 0.9 subset)
    // merge some groups, so components ≤ 500 and ≥ 500 - 25.
    val nComponents = labeled.select(countDistinct(col("component"))).head().getLong(0)
    assert(nComponents <= 500 && nComponents >= 475, s"components: $nComponents")
    // Every replica group is fully collapsed: all 10 replicas of a base
    // doc share one component.
    val splitGroups = labeled
      .withColumn("base", col("id") % 10000)
      .groupBy("base")
      .agg(countDistinct(col("component")).as("nc"))
      .filter(col("nc") > 1)
      .count()
    assert(splitGroups == 0, s"$splitGroups replica groups straddle components")
  }
}
