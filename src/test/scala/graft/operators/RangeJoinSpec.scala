package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int) = Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:00")

  test("containment incl. boundaries, bin-crossing intervals, key isolation") {
    val points = Seq(
      (1L, "u1", ts(0)), // == interval start → match
      (2L, "u1", ts(90)), // inside, in a later 1h bin than the start → match
      (3L, "u1", ts(120)), // == interval end → match
      (4L, "u1", ts(121)), // past end → no match
      (5L, "u2", ts(60)) // other key, no interval → no match
    ).toDF("event_id", "k", "t")
    val intervals = Seq(
      ("u1", 100L, ts(0), ts(120)) // 2h interval spanning 3 hourly bins
    ).toDF("k", "interval_id", "s", "e")

    val out = RangeJoin.pointInInterval(points, intervals,
      Seq("k"), "t", "s", "e", binWidthSec = 3600L)
      .select("event_id", "interval_id")
      .as[(Long, Long)].collect().sorted.toSeq
    assert(out == Seq((1L, 100L), (2L, 100L), (3L, 100L)))
  }

  test("colliding non-key columns are rejected") {
    val p = Seq((1L, "u", ts(1))).toDF("id", "k", "t")
    val i = Seq(("u", ts(0), ts(2), 1L)).toDF("k", "s", "e", "id")
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(p, i, Seq("k"), "t", "s", "e")
    }
  }
}
