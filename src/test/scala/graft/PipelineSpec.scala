package graft

import org.apache.spark.sql.functions._

import graft.core.{FileFormat, SinkSpec, SourceSpec}
import graft.meta.{FileNotifier, JobLedger}

/** End-to-end driver test (EP2, lambda_handler.py:41-153 semantics): one
  * CSV through extract → six-stage transform → partitioned parquet, with
  * ledger + notification side effects.
  */
class PipelineSpec extends SparkSpec {

  test("E→T→L success path: output, stats, ledger SUCCESS, notification") {
    val in = tmpDir("pipe-in")
    val out = tmpDir("pipe-out")
    sampleSales.coalesce(1).write.mode("overwrite").option("header", "true").csv(in)
    val csv = new java.io.File(in).listFiles().find(_.getName.endsWith(".csv")).get

    val ledger = new JobLedger(spark, s"$out/_ledger")
    val notes = s"$out/notes.txt"
    val outcome = Pipeline.run(spark,
      SourceSpec.SingleFile(csv.getAbsolutePath),
      SinkSpec(out, FileFormat.Parquet),
      ledger = Some(ledger),
      notifier = new FileNotifier(notes))

    assert(outcome.status == "success", outcome.error)
    assert(outcome.stats.get.inputRows == 3)
    assert(outcome.load.get.rowsLoaded == 3)

    val written = spark.read.parquet(outcome.load.get.destination)
    assert(written.columns.toSet.contains("_row_hash"))
    assert(written.filter(col("_year") === 2024).count() == 3)

    val latest = ledger.getJob(outcome.jobId).get
    assert(latest.getAs[String]("status") == "SUCCESS")
    assert(ledger.listJobs(Some("SUCCESS")).count() == 1)

    val noteLines = scala.io.Source.fromFile(notes).getLines().toSeq
    assert(noteLines.exists(_.contains("ETL Job Success")))
  }

  test("failure path: bad source → FAILED ledger record, failure note, no throw") {
    val out = tmpDir("pipe-fail")
    val ledger = new JobLedger(spark, s"$out/_ledger")
    val notes = s"$out/notes.txt"
    val outcome = Pipeline.run(spark,
      SourceSpec.SingleFile("/nonexistent/input.csv"),
      SinkSpec(out, FileFormat.Parquet),
      ledger = Some(ledger),
      notifier = new FileNotifier(notes))

    assert(outcome.status == "failed")
    assert(ledger.getJob(outcome.jobId).get.getAs[String]("status") == "FAILED")
    assert(scala.io.Source.fromFile(notes).getLines().exists(_.contains("ETL Job Failed")))
  }

  test("ledger compaction preserves records and shrinks file count") {
    val dir = tmpDir("ledger-compact")
    val ledger = new JobLedger(spark, dir)
    (1 to 5).foreach(i => ledger.startJob(s"job-$i", Map("i" -> i.toString)))
    ledger.completeJob("job-1", Map.empty, 1.0)

    def parquetFiles = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(parquetFiles == 6)
    ledger.compact()
    assert(parquetFiles == 1)
    assert(ledger.read().count() == 6)
    assert(ledger.getJob("job-1").get.getAs[String]("status") == "SUCCESS")
  }
}
