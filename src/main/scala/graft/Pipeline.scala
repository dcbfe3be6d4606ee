package graft

import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}

import org.apache.spark.sql.SparkSession

import graft.core.{EngineConfig, FileFormat, SinkSpec, SourceSpec}
import graft.meta.{JobLedger, LogMetricsSink, LogNotifier, MetricsSink, Notifier}
import graft.operators.TransformPipeline
import graft.sinks.Writers
import graft.sources.Readers

/** The ETL driver (O1, lambda_handler.py:41-153): mint a job id, ledger
  * start, extract → transform → load, ledger complete/fail, notify. One
  * Spark application replaces one Lambda invocation; the same code path
  * serves single-file, batch, and scheduled triggers via [[SourceSpec]].
  */
object Pipeline {

  final case class JobOutcome(
      jobId: String,
      status: String, // success | failed
      stats: Option[TransformPipeline.TransformStats],
      load: Option[Writers.LoadResult],
      error: Option[String]
  )

  private val jobIdFmt =
    DateTimeFormatter.ofPattern("yyyyMMdd-HHmmss").withZone(ZoneOffset.UTC)

  /** `etl-<UTC yyyymmdd-HHMMSS>` (lambda_handler.py:57) + an 8-hex random
    * suffix so concurrent jobs in the same second don't collide (the
    * reference accepts that collision; we don't). Not nanoTime: its origin
    * is arbitrary (can be negative → malformed id) and 10^5 values is a
    * weak birthday bound.
    */
  def mintJobId(at: Instant = Instant.now()): String =
    s"etl-${jobIdFmt.format(at)}-${java.util.UUID.randomUUID().toString.take(8)}"

  def run(
      spark: SparkSession,
      source: SourceSpec,
      sink: SinkSpec,
      config: EngineConfig = EngineConfig.default,
      ledger: Option[JobLedger] = None,
      notifier: Notifier = LogNotifier,
      metrics: MetricsSink = LogMetricsSink
  ): JobOutcome = {
    val jobId = mintJobId()
    val t0 = System.nanoTime()
    // The default-param sink was built from EngineConfig.default at class
    // init; when the caller passed a custom config but kept the default
    // sink, rebuild it so monitoring.cloudwatch.metric_namespace applies.
    val metricsSink =
      if (metrics eq LogMetricsSink) new LogMetricsSink(config) else metrics
    ledger.foreach(_.startJob(jobId, describeSource(source)))
    try {
      // Oversize-input guard. The reference DEFINES max_file_size_mb
      // (config.yaml:79) but never enforces it; enforcement here (error
      // on a direct source, skip-with-warning in batch) is a deliberate
      // extension beyond the reference, OFF by default — set the key > 0
      // to opt in. A batch skip is a data drop, so it must never happen
      // unless the operator asked for it.
      val maxMb = config.getInt("etl.extract.max_file_size_mb", 0).toLong
      val raw = Readers.extract(spark, source,
        maxFileSizeMb = if (maxMb > 0) Some(maxMb) else None)
      val (transformed, stats) = TransformPipeline.runWithStats(raw, config)
      val load = Writers.load(transformed, jobId, sink)
      val duration = (System.nanoTime() - t0) / 1e9
      ledger.foreach(_.completeJob(jobId, Map(
        "status" -> load.status,
        "destination" -> load.destination,
        "rows_loaded" -> load.rowsLoaded.toString,
        "input_rows" -> stats.inputRows.toString,
        "output_rows" -> stats.outputRows.toString
      ), duration))
      notifier.notify(s"ETL Job Success: $jobId",
        s"rows=${load.rowsLoaded} dest=${load.destination} duration=${duration}s")
      // N2 metric emission (aws_clients.py:167-201 contract: failures in
      // the sink must not fail the job — sinks are expected to swallow).
      metricsSink.putMetric("JobDuration", duration, "Seconds", Map("job_id" -> jobId))
      metricsSink.putMetric("RowsProcessed", load.rowsLoaded.toDouble, "Count", Map("job_id" -> jobId))
      JobOutcome(jobId, "success", Some(stats), Some(load), None)
    } catch {
      case e: Exception =>
        val sw = new java.io.StringWriter()
        e.printStackTrace(new java.io.PrintWriter(sw))
        ledger.foreach(_.failJob(jobId, String.valueOf(e.getMessage), sw.toString))
        notifier.notify(s"ETL Job Failed: $jobId", String.valueOf(e.getMessage))
        metricsSink.putMetric("JobFailed", 1.0, "Count", Map("job_id" -> jobId))
        JobOutcome(jobId, "failed", None, None, Some(String.valueOf(e.getMessage)))
    }
  }

  /** O2 event parser (lambda_handler.py:155-197) is [[SourceSpec.fromEvent]];
    * this records the parsed spec into the ledger's trigger_event map.
    */
  private def describeSource(s: SourceSpec): Map[String, String] = s match {
    case SourceSpec.SingleFile(p) => Map("type" -> "direct", "path" -> p)
    case SourceSpec.Batch(d)      => Map("type" -> "batch", "dir" -> d)
    case sc: SourceSpec.Scheduled => Map("type" -> "scheduled", "dir" -> sc.pendingDir)
  }

  /** O3 local CLI runner (scripts/run_local.py:184-251):
    * `runMain graft.Pipeline <inPathOrDir> <outDir> [format]`.
    */
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Pipeline <inPathOrDir> <outDir> [parquet|csv|json]")
    val spark = graft.core.EngineSession.create()
    val in = args(0)
    val source =
      if (new java.io.File(in).isDirectory) SourceSpec.Batch(in)
      else SourceSpec.SingleFile(in)
    val fmt = if (args.length > 2) FileFormat.fromName(args(2)) else FileFormat.Parquet
    val ledger = new JobLedger(spark, s"${args(1).stripSuffix("/")}/_ledger")
    val outcome = run(spark, source, SinkSpec(args(1), fmt), ledger = Some(ledger))
    println(s"job=${outcome.jobId} status=${outcome.status} " +
      outcome.load.map(l => s"rows=${l.rowsLoaded} dest=${l.destination}").getOrElse("") +
      outcome.error.map(e => s"error=$e").getOrElse(""))
    spark.stop()
    if (outcome.status != "success") sys.exit(1)
  }
}
