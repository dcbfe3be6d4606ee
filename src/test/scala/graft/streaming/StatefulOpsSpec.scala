package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.streaming.StatefulOps.{Drift, Event}

class StatefulOpsSpec extends SparkSpec {
  import spark.implicits._

  test("drift detector: per-key state persists across micro-batches, emits on shift") {
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Event]
    val q = StatefulOps.detectDrift(input.toDS(), threshold = 0.5)
      .writeStream.format("memory").queryName("drift").outputMode("append").start()
    try {
      input.addData(Event(1L, 10.0), Event(1L, 10.0), Event(2L, 5.0))
      q.processAllAvailable()
      assert(spark.table("drift").count() == 0, "first batch has no previous state")

      input.addData(Event(1L, 100.0)) // user 1 mean 10 → 40: |30| > 0.5·10 → emit
      input.addData(Event(2L, 5.0)) //   user 2 mean 5 → 5: stable → silent
      q.processAllAvailable()

      val drifts = spark.table("drift").as[Drift].collect().toSeq
      assert(drifts == Seq(Drift(1L, 3L, 10.0, 40.0)))
    } finally q.stop()
  }

  test("batch execution runs the same fold (single pass, no prior state)") {
    val out = StatefulOps.detectDrift(
      Seq(Event(1L, 1.0), Event(1L, 100.0)).toDS())
    assert(out.count() == 0, "all data in one batch = one fold with empty prior state")
  }
}
