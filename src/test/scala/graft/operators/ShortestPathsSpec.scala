package graft.operators

import graft.SparkSpec

class ShortestPathsSpec extends SparkSpec {

  private def edges(e: Seq[(Long, Long, Long)]) = {
    import spark.implicits._
    e.toDF("src", "dst", "w")
  }

  private def seeds(ids: Long*) = {
    import spark.implicits._
    ids.toDF("id")
  }

  private def run(e: Seq[(Long, Long, Long)], s: Seq[Long], rounds: Int,
      ckpt: Option[String] = None): Map[Long, Long] =
    ShortestPaths.run(edges(e), seeds(s: _*), rounds, ckpt)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap

  // Weighted digraph where the shortest route is NOT the fewest hops:
  // 1→2→3→4 at weight 1 each beats the direct 1→4 edge of weight 10;
  // 5 is reachable only via 4; 6 is unreachable; 7→1 enters the chain.
  private val g = Seq(
    (1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L), (1L, 4L, 10L),
    (4L, 5L, 2L), (7L, 1L, 3L), (6L, 6L, 1L))

  test("multi-hop light path beats the heavy direct edge") {
    val got = run(g, Seq(1L), rounds = 6)
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 5L))
  }

  test("unreachable vertices are absent, not infinite") {
    val got = run(g, Seq(1L), rounds = 6)
    assert(!got.contains(6L) && !got.contains(7L))
  }

  test("multi-source distance is the min over single-source runs") {
    val a = run(g, Seq(1L), rounds = 6)
    val b = run(g, Seq(7L), rounds = 6)
    val both = run(g, Seq(1L, 7L), rounds = 6)
    val ids = a.keySet ++ b.keySet
    ids.foreach { id =>
      val expect = (a.get(id) ++ b.get(id)).min
      assert(both(id) == expect, s"vertex $id")
    }
  }

  test("an under-provisioned round cap fails loudly") {
    // the chain 1→2→3→4→5 needs 4 relaxation rounds; cap 2 still moves
    // at the cap, and the convergence assertion must raise — not return
    // dist(4)=10 from the heavy direct edge as if it were final
    val e = intercept[IllegalArgumentException](run(g, Seq(1L), rounds = 2))
    assert(e.getMessage.contains("converge"))
  }

  test("negative weights are rejected") {
    val e = intercept[IllegalArgumentException](
      run(Seq((1L, 2L, -1L)), Seq(1L), rounds = 3))
    assert(e.getMessage.contains("non-negative"))
  }

  test("extra rounds past the fixpoint change nothing (early exit)") {
    assert(run(g, Seq(1L), rounds = 6) == run(g, Seq(1L), rounds = 20))
  }

  test("durable checkpointing yields identical distances (the 100-TB mode)") {
    val dir = tmpDir("sssp-ckpt")
    assert(run(g, Seq(1L), rounds = 6) == run(g, Seq(1L), rounds = 6, Some(dir)))
    // durable rounds are inspectable on disk
    assert(new java.io.File(dir).listFiles().nonEmpty)
  }

  test("zero-weight edges and self-loops are handled") {
    val got = run(Seq((1L, 2L, 0L), (2L, 2L, 5L), (2L, 3L, 4L)), Seq(1L), 5)
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 4L))
  }
}
