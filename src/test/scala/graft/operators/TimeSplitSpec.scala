package graft.operators

import graft.SparkSpec

class TimeSplitSpec extends SparkSpec {

  private def ts(minute: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  private def frame(minutes: Seq[Int]) = {
    import spark.implicits._
    minutes.map(m => (m.toLong, ts(m))).toDF("id", "ts")
  }

  test("roles match hand-computed bounds with embargo on both sides") {
    // span 0..40 min, k=2 → fold 0 test [0,20), fold 1 test [20,40];
    // embargo 5 min around each boundary
    val rows = frame(Seq(0, 10, 18, 22, 30, 40))
    val got = TimeSplit.purgedFolds(rows, "ts", k = 2, embargoUs = 5L * 60 * 1000000)
      .collect().map(r => ((r.getLong(0), r.getInt(2)), r.getString(3))).toMap
    // fold 0: test < 20min; embargo [20,25) and [-5,0) — 22 is embargo; 30/40 train
    assert(got((0L, 0)) == "test" && got((18L, 0)) == "test")
    assert(got((22L, 0)) == "embargo")
    assert(got((30L, 0)) == "train" && got((40L, 0)) == "train")
    // fold 1: test [20,40] (last fold closed); embargo [15,20); 0/10 train
    assert(got((22L, 1)) == "test" && got((40L, 1)) == "test")
    assert(got((18L, 1)) == "embargo")
    assert(got((0L, 1)) == "train" && got((10L, 1)) == "train")
  }

  test("every row appears exactly k times and test folds partition the rows") {
    val rows = frame(0 to 40 by 2)
    val out = TimeSplit.purgedFolds(rows, "ts", k = 4, embargoUs = 0L)
    assert(out.count() == rows.count() * 4)
    // with zero embargo, each row is test in exactly one fold
    val testCounts = out.where(org.apache.spark.sql.functions.col("role") === "test")
      .groupBy("id").count().collect().map(_.getLong(1)).toSet
    assert(testCounts == Set(1L))
  }

  test("empty frame and degenerate k fail loudly") {
    import spark.implicits._
    assertThrows[IllegalArgumentException](
      TimeSplit.purgedFolds(Seq.empty[(Long, java.sql.Timestamp)].toDF("id", "ts"), "ts", 3, 0L))
    assertThrows[IllegalArgumentException](
      TimeSplit.purgedFolds(frame(Seq(1, 2)), "ts", k = 1, embargoUs = 0L))
  }
}
