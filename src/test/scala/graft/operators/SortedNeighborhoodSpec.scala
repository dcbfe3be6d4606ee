package graft.operators

import graft.SparkSpec

class SortedNeighborhoodSpec extends SparkSpec {

  private def frame(rows: Seq[(Long, Double, String)]) = {
    import spark.implicits._
    rows.toDF("id", "score", "tag")
  }

  /** Brute-force reference: rank in (score, id) order, all pairs within
    * distance w-1.
    */
  private def reference(rows: Seq[(Long, Double, String)], w: Int): Set[(Long, Long, Long)] = {
    val ranked = rows.sortBy(r => (r._2, r._1)).map(_._1).zipWithIndex
    (for {
      (a, i) <- ranked
      (b, j) <- ranked
      if j > i && j - i <= w - 1
    } yield (a, b, (j - i).toLong)).toSet
  }

  test("pairs match the brute-force windowed self-join across window sizes") {
    val rows = (0L until 40L).map(i => (i, ((i * 37) % 11).toDouble, s"t${i % 3}"))
    for (w <- Seq(2, 3, 5, 8)) {
      val got = SortedNeighborhood.pairs(frame(rows), "id", Seq("score"), w)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == reference(rows, w), s"window=$w")
    }
  }

  test("results are identical across partition counts (rank is truly global)") {
    val rows = (0L until 100L).map(i => (i, ((i * 13) % 7).toDouble, "x"))
    val expected = reference(rows, 4)
    for (p <- Seq(1, 3, 8)) {
      val got = SortedNeighborhood.pairs(frame(rows), "id", Seq("score"), 4, partitions = p)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == expected, s"partitions=$p")
    }
  }

  test("carry columns ride through to both sides") {
    val rows = Seq((1L, 1.0, "a"), (2L, 2.0, "b"), (3L, 3.0, "a"))
    val got = SortedNeighborhood.pairs(frame(rows), "id", Seq("score"), 2, carry = Seq("tag"))
      .orderBy("id_a")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(3), r.getString(4)))
    assert(got.toSeq == Seq((1L, 2L, "a", "b"), (2L, 3L, "b", "a")))
  }

  test("no pair is emitted twice (block fan-out is exactly-once)") {
    val rows = (0L until 64L).map(i => (i, (i % 4).toDouble, "x"))
    val df = SortedNeighborhood.pairs(frame(rows), "id", Seq("score"), 6)
    assert(df.count() == df.distinct().count())
  }

  test("window below 2 is rejected") {
    assertThrows[IllegalArgumentException](
      SortedNeighborhood.pairs(frame(Seq((1L, 1.0, "a"))), "id", Seq("score"), 1))
  }
}
