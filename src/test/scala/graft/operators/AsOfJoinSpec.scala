package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Int) = Timestamp.valueOf(f"2024-01-01 00:00:$s%02d")

  test("backward as-of: latest at-or-before match, ties included, outer nulls") {
    val left = Seq(
      (1L, "u1", ts(5)), // between snapshots → snap@3
      (2L, "u1", ts(10)), // exact tie with snap@10 → included
      (3L, "u1", ts(1)), // before any snapshot → nulls
      (4L, "u2", ts(30)) // other key → u2's snapshot only
    ).toDF("event_id", "k", "t")
    val right = Seq(
      ("u1", ts(3), 30.0), ("u1", ts(10), 100.0), ("u2", ts(20), 200.0)
    ).toDF("k", "t", "snap")

    val out = AsOfJoin.backward(left, right, Seq("k"), "t", "t", Seq("snap"))
      .collect().map(r => r.getAs[Long]("event_id") ->
        // Row.get (not getAs[Double]) so SQL NULL stays None instead of
        // unboxing to 0.0.
        (Option(r.get(r.fieldIndex("asof_t"))), Option(r.get(r.fieldIndex("snap"))))).toMap

    assert(out(1L) == (Some(ts(3)), Some(30.0)))
    assert(out(2L) == (Some(ts(10)), Some(100.0)))
    assert(out(3L) == (None, None))
    assert(out(4L) == (Some(ts(20)), Some(200.0)))
  }

  test("a NULL inside the matched snapshot is carried as NULL, not an older value") {
    val left = Seq((1L, "u1", ts(6))).toDF("event_id", "k", "t")
    val right = Seq(
      ("u1", ts(1), Option(30.0)), // older snapshot, non-null
      ("u1", ts(5), Option.empty[Double]) // matched snapshot, NULL value
    ).toDF("k", "t", "snap")
    val r = AsOfJoin.backward(left, right, Seq("k"), "t", "t", Seq("snap")).head()
    assert(r.getAs[Timestamp]("asof_t") == ts(5), "must match the ts=5 snapshot")
    assert(r.isNullAt(r.fieldIndex("snap")),
      "NULL in the matched snapshot must not be backfilled from ts=1")
  }

  test("colliding right value names are rejected") {
    val l = Seq((1L, "u", ts(1), 5.0)).toDF("id", "k", "t", "v")
    val r = Seq(("u", ts(1), 6.0)).toDF("k", "t", "v")
    intercept[IllegalArgumentException] {
      AsOfJoin.backward(l, r, Seq("k"), "t", "t", Seq("v"))
    }
  }
}
