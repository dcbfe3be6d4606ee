package graft.functions

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM property tests of the bounded top-k heap backing `graft_topk`
  * — no SparkSession needed; the distributed behavior is covered by
  * SimilaritySpec's differential test against the window formulation.
  */
class TopKAggSpec extends AnyFunSuite {

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val entriesGen: Gen[List[(Double, Long)]] =
    Gen.listOf(Gen.zip(
      Gen.chooseNum(-1e6, 1e6), Gen.chooseNum(Long.MinValue, Long.MaxValue)))

  /** Reference semantics: sort by (score desc, payload asc), take k. */
  private def reference(xs: Seq[(Double, Long)], k: Int): Seq[(Double, Long)] =
    xs.sortBy { case (s, p) => (-s, p) }.take(k)

  private def drain(buf: TopKBuffer): Seq[(Double, Long)] =
    buf.sortedIndices.toSeq.map(i => (buf.scores(i), buf.payloads(i)))

  test("insert stream matches sort-and-take for random inputs and k") {
    for {
      xs <- samples(entriesGen, 200)
      k <- Seq(1, 2, 3, 7)
    } {
      val buf = new TopKBuffer(k)
      xs.foreach { case (s, p) => buf.insert(s, p) }
      assert(drain(buf) == reference(xs, k), s"k=$k xs=$xs")
    }
  }

  test("merge of split streams equals single-stream result (partial-agg law)") {
    for (xs <- samples(entriesGen, 200)) {
      val k = 5
      val (l, r) = xs.splitAt(xs.length / 2)
      val a = new TopKBuffer(k); l.foreach { case (s, p) => a.insert(s, p) }
      val b = new TopKBuffer(k); r.foreach { case (s, p) => b.insert(s, p) }
      var i = 0
      while (i < b.size) { a.insert(b.scores(i), b.payloads(i)); i += 1 }
      assert(drain(a) == reference(xs, k), s"xs=$xs")
    }
  }

  test("NaN scores rank above real values (total order, matches window desc)") {
    val buf = new TopKBuffer(2)
    Seq((1.0, 1L), (Double.NaN, 2L), (2.0, 3L)).foreach { case (s, p) => buf.insert(s, p) }
    val out = drain(buf)
    assert(out.head._1.isNaN && out.head._2 == 2L)
    assert(out(1) == (2.0, 3L))
    // many NaNs must not break the heap/sort invariants
    val b2 = new TopKBuffer(3)
    Seq((Double.NaN, 5L), (1.0, 1L), (Double.NaN, 4L), (2.0, 2L), (Double.NaN, 6L))
      .foreach { case (s, p) => b2.insert(s, p) }
    assert(drain(b2).map(_._2) == Seq(4L, 5L, 6L))
  }

  test("serialize/deserialize round-trips the buffer (the exchange path)") {
    val agg = TopKByScore(
      org.apache.spark.sql.catalyst.expressions.Literal(1.0),
      org.apache.spark.sql.catalyst.expressions.Literal(1L), k = 4)
    for (xs <- samples(entriesGen, 100)) {
      val buf = new TopKBuffer(4)
      xs.foreach { case (s, p) => buf.insert(s, p) }
      val back = agg.deserialize(agg.serialize(buf))
      assert(drain(back) == drain(buf), s"xs=$xs")
    }
  }

  test("duplicate scores break ties on the smaller payload") {
    val buf = new TopKBuffer(2)
    Seq((1.0, 9L), (1.0, 3L), (1.0, 7L)).foreach { case (s, p) => buf.insert(s, p) }
    assert(drain(buf) == Seq((1.0, 3L), (1.0, 7L)))
  }
}
