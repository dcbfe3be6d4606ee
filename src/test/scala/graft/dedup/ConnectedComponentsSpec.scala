package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  /** Both execution paths must agree: driver union-find (small edge
    * lists, the adaptive default) and distributed label propagation
    * (maxLocalEdges = 0 forces it).
    */
  private val paths: Seq[(String, Long)] =
    Seq("local union-find" -> 1000000L, "distributed propagation" -> 0L)

  for ((pathName, maxLocal) <- paths) {

    test(s"[$pathName] chains, cliques, and isolates resolve to min-id components") {
      val vertices = (1L to 9L).toDF("id")
      // chain 1-2-3 (needs >1 propagation round), clique 4-5-6, pair 7-8, isolate 9
      val edges = Seq(
        (2L, 3L), (1L, 2L),
        (4L, 5L), (5L, 6L), (4L, 6L),
        (7L, 8L)
      ).toDF("id_a", "id_b")
      val got = ConnectedComponents.assign(vertices, edges, maxLocalEdges = maxLocal)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == Map(
        1L -> 1L, 2L -> 1L, 3L -> 1L,
        4L -> 4L, 5L -> 4L, 6L -> 4L,
        7L -> 7L, 8L -> 7L, 9L -> 9L))
    }

    test(s"[$pathName] long path converges within diameter rounds") {
      val n = 12L
      val vertices = (1L to n).toDF("id")
      val edges = (1L until n).map(i => (i, i + 1)).toDF("id_a", "id_b")
      val got = ConnectedComponents.assign(vertices, edges, maxLocalEdges = maxLocal)
        .select(countDistinct(col("component"))).head().getLong(0)
      assert(got == 1L)
    }

    test(s"[$pathName] near-Long.Max vertex ids converge without a long-sum overflow") {
      val ids = Seq(Long.MaxValue, Long.MaxValue - 1, Long.MaxValue - 2, 5L)
      val vertices = ids.toDF("id")
      val edges = Seq((Long.MaxValue, Long.MaxValue - 1)).toDF("id_a", "id_b")
      val got = ConnectedComponents.assign(vertices, edges, maxLocalEdges = maxLocal)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == Map(
        Long.MaxValue -> (Long.MaxValue - 1), (Long.MaxValue - 1) -> (Long.MaxValue - 1),
        (Long.MaxValue - 2) -> (Long.MaxValue - 2), 5L -> 5L))
    }
  }

  test("component-hash split keeps connected rows in one split") {
    val vertices = (1L to 6L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("id_a", "id_b")
    val split = ConnectedComponents.componentSplit(
      ConnectedComponents.assign(vertices, edges), splits = 2)
    val perComponent = split.groupBy("component")
      .agg(countDistinct(col("split")).as("n"))
      .agg(max(col("n"))).head().getLong(0)
    assert(perComponent == 1L, "a component must never straddle splits")
  }

  test("q75 (forced distributed) labels the real corpus identically to q48") {
    val dir = "/root/testdata/sf0.001"
    val adaptive = DedupQueries.queries("q48_dup_components")(spark, dir).collect().toSeq
    val forced = DedupQueries.queries("q75_components_distributed")(spark, dir).collect().toSeq
    assert(adaptive.nonEmpty)
    assert(forced == adaptive,
      "distributed label propagation must reproduce the union-find labeling")
  }

  /** Negative control for the q69 leak counter: the counter pins the
    * "split hashes the COMPONENT id" contract (a pure function of the
    * component, so countDistinct(split) per component is structurally 1).
    * To show the counter is capable of firing at all, split by ROW id
    * instead — multi-row components must then straddle splits.
    */
  test("row-id split (negative control) makes the leak counter fire") {
    val vertices = (1L to 40L).toDF("id")
    // 10 pair-components: (1,2), (3,4), ... (19,20); 21-40 isolates
    val edges = (0L until 10L).map(i => (2 * i + 1, 2 * i + 2)).toDF("id_a", "id_b")
    val labeled = ConnectedComponents.assign(vertices, edges)
    val rowSplit = labeled.withColumn("split",
      pmod(xxhash64(col("id")), lit(2L)).cast("int"))
    val leaky = rowSplit.groupBy("component")
      .agg(countDistinct(col("split")).as("ns"))
      .filter(col("ns") > 1).count()
    assert(leaky > 0L,
      "splitting by row id must leak some multi-row component across splits")
  }
}
