package graft.dedup

import org.apache.spark.sql.functions._

import graft.{MetricsProbe, SparkSpec}

/** Scale smoke for the dedup pipelines: a 10×-replicated corpus (every
  * doc appears 10 times under distinct ids) exercises hot LSH buckets,
  * quadratic intra-bucket pair explosion, and component merging — the
  * stress pattern a crawl corpus exhibits, at test size.
  */
class DedupScaleSpec extends SparkSpec {
  import spark.implicits._

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

  // The adversarial shape at 100 TB: a star / hot-vertex graph, where one
  // label is received by every spoke in the same round. q75 proves the
  // distributed path on a near-dup-shaped graph (piles of tiny cliques);
  // these two cases pin the skew behavior — convergence in rounds =
  // diameter (each label-propagation round is one join + one min-agg, and
  // the detection pass adds exactly one more), and NO single reduce task
  // absorbing the hub's whole neighborhood, because the min-label
  // aggregate combines map-side: each reducer receives at most one
  // partial row per map partition for the hub key.

  test("100k-edge star (min-id hub): 1 propagation round, no task blowup") {
    val nSpokes = 100000L
    val edges = spark.range(1, nSpokes + 1)
      .select(lit(0L).as("id_a"), col("id").as("id_b"))
    val vertices = spark.range(0, nSpokes + 1).toDF("id")
    // maxIterations = 2 makes the round bound an assertion: one round in
    // which every spoke adopts the hub's label 0, one round detecting no
    // further change — a third round means the propagation regressed.
    // AQE partition-coalescing is pinned OFF for the measurement: it
    // deliberately funnels this (tiny) workload into one reduce task,
    // which would make "one task read everything" ambiguous between
    // benign coalescing and the hub-skew regression this gate exists for.
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.get(coalesceKey)
    spark.conf.set(coalesceKey, "false")
    val m =
      try MetricsProbe.measure(spark) {
        ConnectedComponents
          .assign(vertices, edges, maxIterations = 2, maxLocalEdges = 0L)
          .agg(sum(col("component")).as("s"), count(lit(1)).as("n")).head()
      } finally spark.conf.set(coalesceKey, prev)
    assert(m.result.getLong(0) == 0L && m.result.getLong(1) == nSpokes + 1,
      s"every vertex must join component 0: ${m.result}")
    info(s"star wall ${m.wallMs} ms, shuffle r/w " +
      s"${m.shuffleReadBytes}/${m.shuffleWriteBytes} B, " +
      s"peak task shuffle read ${m.peakTaskShuffleReadBytes} B")
    // All 100k hub-keyed label rows land on ONE reducer key; unaggregated
    // they are ~2-4 MB of shuffle into a single task. Map-side combine
    // collapses them to one partial per map partition, so no task may
    // shuffle-read more than a fraction of that.
    assert(m.peakTaskShuffleReadBytes < 1000000L,
      s"a single task shuffle-read ${m.peakTaskShuffleReadBytes} B — hub " +
        "skew is no longer collapsed by partial aggregation")
  }

  test("100k-edge star (MAX-id hub): the label crosses the hub, 2 rounds") {
    // Hub is the LARGEST id, so the winning label (min spoke, 1) must
    // travel spoke → hub → every other spoke: rounds = diameter = 2,
    // plus the detection round. This is the direction that actually
    // exercises propagation THROUGH the hot vertex.
    val nSpokes = 100000L
    val hub = 10000000L
    val edges = spark.range(1, nSpokes + 1)
      .select(col("id").as("id_a"), lit(hub).as("id_b"))
    val vertices = spark.range(1, nSpokes + 1).toDF("id")
      .unionByName(Seq(hub).toDF("id"))
    val labeled = ConnectedComponents
      .assign(vertices, edges, maxIterations = 3, maxLocalEdges = 0L)
    val r = labeled.agg(
      sum(col("component")).as("s"), count(lit(1)).as("n")).head()
    assert(r.getLong(0) == nSpokes + 1 && r.getLong(1) == nSpokes + 1,
      s"every vertex must join component 1 (min spoke id): $r")
  }
}
