package graft.operators

import graft.SparkSpec

class KCoreSpec extends SparkSpec {

  private def edges(e: Seq[(Long, Long)]) = {
    import spark.implicits._
    e.toDF("a", "b")
  }

  // Textbook graph: a 4-clique {1,2,3,4} with a pendant path 4-5-6 and a
  // triangle {7,8,9} bridged to the clique by a single edge 1-7.
  private val g = Seq(
    (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
    (4L, 5L), (5L, 6L),
    (7L, 8L), (7L, 9L), (8L, 9L), (1L, 7L))

  test("2-core drops the pendant path, keeps clique and triangle") {
    val got = KCore.kcore(edges(g), k = 2, maxRounds = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 7L, 8L, 9L))
    // degrees within the 2-core: 5-6 edges gone, 1-7 bridge stays
    assert(got(1L) == 4 && got(4L) == 3 && got(7L) == 3 && got(8L) == 2)
  }

  test("3-core also sheds the triangle and the bridge") {
    val got = KCore.kcore(edges(g), k = 3, maxRounds = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("a k above the degeneracy yields an empty core, not an error") {
    assert(KCore.kcore(edges(g), k = 4, maxRounds = 5).count() == 0)
  }

  test("an under-provisioned round cap fails loudly") {
    // Path 1-2-3-...-8: 1-core is everything; the 2-core is empty but
    // peeling strips one vertex from each end per round, needing 4
    // rounds — a cap of 2 must raise, not return a partial peel.
    val path = (1L until 8L).map(i => (i, i + 1))
    val e = intercept[IllegalArgumentException](
      KCore.kcore(edges(path), k = 2, maxRounds = 2).count())
    assert(e.getMessage.contains("converge"))
    assert(KCore.kcore(edges(path), k = 2, maxRounds = 4).count() == 0)
  }

  test("peeling is idempotent: extra rounds past convergence change nothing") {
    val a = KCore.kcore(edges(g), k = 2, maxRounds = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = KCore.kcore(edges(g), k = 2, maxRounds = 9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }

  test("durable checkpointing yields the identical core (the 100-TB mode)") {
    val dir = tmpDir("kcore-ckpt")
    val ephemeral = KCore.kcore(edges(g), k = 2, maxRounds = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val durable = KCore.kcore(edges(g), k = 2, maxRounds = 4, Some(dir))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(durable == ephemeral)
    // rounds actually hit the durable path (early exit may stop before
    // the cap, but round 1 always materializes)
    assert(new java.io.File(dir, "round1").exists())
  }

  test("oracle generator unrolls the requested round count") {
    val sql = KCore.oracleSql("SELECT 1 AS a, 2 AS b", k = 2, maxRounds = 3)
    assert((1 to 3).forall(r => sql.contains(s"e$r AS")))
    assert(!sql.contains("e4 AS"))
    assert(sql.contains("c >= 2"))
  }
}
