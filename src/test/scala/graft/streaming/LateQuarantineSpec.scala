package graft.streaming

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Unit semantics of the late-data quarantine router, driven directly
  * as the (batch, id) function foreachBatch calls: horizon lag (a
  * batch never counts against itself), the delay tolerance band, the
  * exact boundary, monotone horizon under out-of-order batches, and
  * restart resume from the persisted horizon.
  */
class LateQuarantineSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("ts", TimestampType), StructField("k", LongType)))

  private def frame(rows: (String, Long)*) =
    spark.createDataFrame(
      java.util.List.of(rows.map(r =>
        Row(java.sql.Timestamp.valueOf(r._1), r._2)): _*), schema)

  private def counts(dir: String): Map[String, Long] =
    Seq("sink", "late").map { d =>
      val p = new org.apache.hadoop.fs.Path(s"$dir/$d")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      d -> (if (fs.exists(p)) spark.read.schema(schema).parquet(s"$dir/$d").count()
            else 0L)
    }.toMap

  test("horizon lags one batch; delay band tolerates bounded disorder") {
    val dir = graft.core.ScratchDirs.lease("graft-lateq-spec")
    try {
      val sink = StreamingIngest.lateQuarantineSink(
        s"$dir/sink", s"$dir/late", s"$dir/hwm", tsCol = "ts")
      // batch 0: everything on-time (no horizon yet), even wildly old rows
      sink(frame("2024-01-10 12:00:00" -> 1L, "2020-01-01 00:00:00" -> 2L), 0L)
      assert(counts(dir) == Map("sink" -> 2L, "late" -> 0L))
      // horizon is now 2024-01-10 12:00 − 1h = 11:00
      // batch 1: 11:00 exactly = boundary (on-time, >= horizon);
      //          10:59:59 = late; 11:30 = in the tolerance band
      sink(frame("2024-01-10 11:00:00" -> 3L, "2024-01-10 10:59:59" -> 4L,
        "2024-01-10 11:30:00" -> 5L), 1L)
      assert(counts(dir) == Map("sink" -> 4L, "late" -> 1L))
      // the late batch must NOT regress the horizon: still 11:00
      sink(frame("2024-01-10 11:00:00" -> 6L), 2L)
      assert(counts(dir) == Map("sink" -> 5L, "late" -> 1L))
    } finally graft.core.ScratchDirs.release(dir)
  }

  test("a restarted router resumes from the persisted horizon") {
    val dir = graft.core.ScratchDirs.lease("graft-lateq-restart")
    try {
      StreamingIngest.lateQuarantineSink(
        s"$dir/sink", s"$dir/late", s"$dir/hwm", tsCol = "ts")(
        frame("2024-01-10 12:00:00" -> 1L), 0L)
      // a FRESH function instance (simulated restart) must read the
      // stored horizon, not start from -inf
      StreamingIngest.lateQuarantineSink(
        s"$dir/sink", s"$dir/late", s"$dir/hwm", tsCol = "ts")(
        frame("2024-01-10 01:00:00" -> 2L), 1L)
      assert(counts(dir) == Map("sink" -> 1L, "late" -> 1L))
    } finally graft.core.ScratchDirs.release(dir)
  }

  test("an empty batch leaves the horizon untouched") {
    val dir = graft.core.ScratchDirs.lease("graft-lateq-empty")
    try {
      val sink = StreamingIngest.lateQuarantineSink(
        s"$dir/sink", s"$dir/late", s"$dir/hwm", tsCol = "ts")
      sink(frame("2024-01-10 12:00:00" -> 1L), 0L)
      sink(frame().limit(0), 1L)
      sink(frame("2024-01-10 11:00:00" -> 2L), 2L) // boundary: still on-time
      assert(counts(dir) == Map("sink" -> 2L, "late" -> 0L))
    } finally graft.core.ScratchDirs.release(dir)
  }
}
