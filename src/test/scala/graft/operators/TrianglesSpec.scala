package graft.operators

import graft.SparkSpec

class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def census(edges: Seq[(Long, Long)]): (Long, Long, Long) = {
    val r = Triangles.globalCount(edges.toDF("u", "v"), "u", "v").head
    (r.getAs[Long]("n_edges"), r.getAs[Long]("n_wedges"), r.getAs[Long]("n_triangles"))
  }

  test("K4 has 6 edges, 12 wedges, 4 triangles") {
    val k4 = for (a <- 0L to 3L; b <- 0L to 3L if a < b) yield (a, b)
    assert(census(k4) == (6L, 12L, 4L))
  }

  test("a star is all wedges, no triangles") {
    assert(census((1L to 6L).map(i => (0L, i))) == (6L, 15L, 0L))
  }

  test("duplicates, reversed directions and self-loops collapse") {
    val messy = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L), (2L, 2L))
    assert(census(messy) == (3L, 3L, 1L))
  }

  test("two triangles sharing an edge") {
    // 1-2-3 and 2-3-4: 5 edges, wedges: deg(1)=2,deg(2)=3,deg(3)=3,deg(4)=2 -> 1+3+3+1=8
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (2L, 4L), (3L, 4L))
    assert(census(g) == (5L, 8L, 2L))
  }
}
