package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Differential tests: the scalable as-of / range join formulations must
  * equal naive theta-join references on randomized inputs. The naive
  * plans are exactly what we refuse to run at scale — which makes them
  * perfect ground truth at test size.
  */
class DifferentialJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Int) = new Timestamp(1700000000000L + s * 1000L)

  private def randomCase(seed: Long): (Seq[(Long, String, Timestamp)], Seq[(String, Timestamp, Double)]) = {
    val keys = Gen.oneOf("k1", "k2", "k3")
    val secs = Gen.chooseNum(0, 500)
    def sample[A](g: Gen[A], n: Int, s: Long): Seq[A] =
      (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(s * 1000 + i)))
    val left = sample(Gen.zip(keys, secs), 40, seed).zipWithIndex
      .map { case ((k, t), i) => (i.toLong, k, ts(t)) }
    val right = sample(Gen.zip(keys, secs), 15, seed + 7).zipWithIndex
      .map { case ((k, t), i) => (k, ts(t), i * 1.5) }
    // Distinct (key, time) on the right: equal-ts duplicate snapshots are
    // resolved arbitrarily (deterministically) by the operator but
    // genuinely ambiguously by the naive reference.
    (left, right.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq)
  }

  test("as-of join equals the naive greatest-time-at-or-before theta join") {
    for (seed <- 1L to 5L) {
      val (l, r) = randomCase(seed)
      val left = l.toDF("event_id", "k", "t")
      val right = r.toDF("k", "rt", "snap")

      val got = AsOfJoin.backward(left, right.withColumnRenamed("rt", "t"),
        Seq("k"), "t", "t", Seq("snap"))
        .select(col("event_id"), col("asof_t"), col("snap"))

      // Naive: per left row, the max right time ≤ t, then its value.
      val naive = left.as("l")
        .join(right.as("r"), col("l.k") === col("r.k") && col("r.rt") <= col("l.t"), "left")
        .groupBy(col("event_id"), col("l.t"))
        .agg(max(col("r.rt")).as("asof_t"),
          max_by(col("r.snap"), col("r.rt")).as("snap"))
        .select(col("event_id"), col("asof_t"), col("snap"))

      val gotRows = got.collect().map(row => row.getLong(0) ->
        (Option(row.get(1)), Option(row.get(2)))).toMap
      val naiveRows = naive.collect().map(row => row.getLong(0) ->
        (Option(row.get(1)), Option(row.get(2)))).toMap
      assert(gotRows == naiveRows, s"seed $seed")
    }
  }

  test("forward as-of equals the naive smallest-time-at-or-after theta join") {
    for (seed <- 1L to 5L) {
      val (l, r) = randomCase(seed)
      val left = l.toDF("event_id", "k", "t")
      val right = r.toDF("k", "rt", "snap")

      val got = AsOfJoin.forward(left, right, Seq("k"), "t", "rt", Seq("snap"))
        .select(col("event_id"), col("asof_rt"), col("snap"))

      val naive = left.as("l")
        .join(right.as("r"), col("l.k") === col("r.k") && col("r.rt") >= col("l.t"), "left")
        .groupBy(col("event_id"), col("l.t"))
        .agg(min(col("r.rt")).as("asof_rt"),
          min_by(col("r.snap"), col("r.rt")).as("snap"))
        .select(col("event_id"), col("asof_rt"), col("snap"))

      val gotRows = got.collect().map(row => row.getLong(0) ->
        (Option(row.get(1)), Option(row.get(2)))).toMap
      val naiveRows = naive.collect().map(row => row.getLong(0) ->
        (Option(row.get(1)), Option(row.get(2)))).toMap
      assert(gotRows == naiveRows, s"seed $seed")
    }
  }

  test("range join equals the naive containment theta join") {
    for (seed <- 1L to 5L) {
      val (l, r) = randomCase(seed)
      val points = l.toDF("event_id", "k", "t")
      // Intervals: start = rt, end = rt + 90s (crosses the 60s bins).
      val iv = r.zipWithIndex
        .map { case ((k, st, _), i) => (k, i.toLong, st, new Timestamp(st.getTime + 90000L)) }
        .toDF("k", "interval_id", "s", "e")

      val got = RangeJoin.pointInInterval(points, iv, Seq("k"), "t", "s", "e",
        binWidthSec = 60L)
        .select("event_id", "interval_id").as[(Long, Long)].collect().sorted.toSeq

      val naive = points.as("p").join(iv.as("i"),
        col("p.k") === col("i.k") && col("p.t") >= col("i.s") && col("p.t") <= col("i.e"))
        .select("event_id", "interval_id").as[(Long, Long)].collect().sorted.toSeq

      assert(got == naive, s"seed $seed")
    }
  }
}
