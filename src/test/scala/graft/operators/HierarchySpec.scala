package graft.operators

import graft.SparkSpec

class HierarchySpec extends SparkSpec {

  private def forest(e: Seq[(Long, Long)]) = {
    import spark.implicits._
    e.toDF("node", "parent")
  }

  private def resolve(e: Seq[(Long, Long)], maxRounds: Int,
      ckpt: Option[String] = None): Map[Long, (Long, Long)] =
    Hierarchy.rootAndDepth(forest(e), maxRounds, ckpt)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  // Textbook two-tree forest:
  //   1 -> {2, 3}, 3 -> {4}, 4 -> {5}   (root 1, max depth 3)
  //   10 -> {11}                        (root 10)
  private val f = Seq(
    (1L, 1L), (2L, 1L), (3L, 1L), (4L, 3L), (5L, 4L),
    (10L, 10L), (11L, 10L))

  test("roots, depths, and root assignment on a textbook forest") {
    val got = resolve(f, maxRounds = 4)
    assert(got == Map(
      1L -> (1L, 0L), 2L -> (1L, 1L), 3L -> (1L, 1L),
      4L -> (1L, 2L), 5L -> (1L, 3L),
      10L -> (10L, 0L), 11L -> (10L, 1L)))
  }

  test("doubling resolves a deep chain in log2 rounds") {
    // Chain 0 <- 1 <- ... <- 100: depth 100 needs ceil(log2(100)) = 7
    // doubling rounds; a per-level walk would need 100.
    val chain = (0L to 100L).map(i => (i, math.max(0L, i - 1)))
    val got = resolve(chain, maxRounds = 7)
    assert(got(100L) == (0L, 100L) && got(50L) == (0L, 50L) && got(0L) == (0L, 0L))
  }

  test("an under-provisioned round cap fails loudly, not partially") {
    val chain = (0L to 100L).map(i => (i, math.max(0L, i - 1)))
    val e = intercept[IllegalArgumentException](resolve(chain, maxRounds = 5))
    assert(e.getMessage.contains("raise maxRounds"))
  }

  test("a dangling parent id (not a forest) is detected, not dropped") {
    val e = intercept[IllegalArgumentException](
      resolve(Seq((1L, 1L), (2L, 99L)), maxRounds = 3))
    assert(e.getMessage.contains("not a forest"))
  }

  test("extra rounds past convergence change nothing (jump is a fixpoint)") {
    assert(resolve(f, maxRounds = 3) == resolve(f, maxRounds = 9))
  }

  test("durable checkpointing yields the identical resolution (the 100-TB mode)") {
    val dir = tmpDir("hier-ckpt")
    assert(resolve(f, maxRounds = 4, Some(dir)) == resolve(f, maxRounds = 4))
    assert(new java.io.File(dir, "round1").exists())
  }
}
