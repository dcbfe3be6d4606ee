package graft.meta

import java.time.Instant

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Append-only job-metadata ledger — the Spark-native replacement for the
  * reference's DynamoDB table (metadata.py:16-234, main.tf:148-178).
  *
  * DynamoDB's update_item has no clean parquet equivalent, so status changes
  * are event-sourced: every M1/M2/M3 call appends one immutable record and
  * "current status" is a latest-timestamp-wins read (SURVEY.md §7.4). Each
  * append is a single tiny parquet file — fine for a control-plane table
  * written once per job; compact periodically if job volume is high.
  */
final class JobLedger(spark: SparkSession, ledgerDir: String) {
  import JobLedger._

  /** M1 start_job (metadata.py:50-80). */
  def startJob(jobId: String, triggerEvent: Map[String, String],
               environment: String = "dev", at: Instant = Instant.now()): Unit =
    append(record(jobId, at, "RUNNING", environment,
      startedAt = Some(at.toString), triggerEvent = triggerEvent))

  /** M2 complete_job (metadata.py:82-124). */
  def completeJob(jobId: String, result: Map[String, String],
                  durationSeconds: Double, environment: String = "dev",
                  at: Instant = Instant.now()): Unit =
    append(record(jobId, at, "SUCCESS", environment,
      completedAt = Some(at.toString),
      durationSeconds = Some(new java.math.BigDecimal(durationSeconds)),
      jobResult = result))

  /** M3 fail_job — traceback truncated to 10k chars (metadata.py:126-174). */
  def failJob(jobId: String, errorMessage: String, errorTraceback: String = "",
              environment: String = "dev", at: Instant = Instant.now()): Unit =
    append(record(jobId, at, "FAILED", environment,
      failedAt = Some(at.toString),
      errorMessage = Some(errorMessage),
      errorTraceback = Some(errorTraceback.take(10000))))

  /** M4 get_job: latest record for a job id (metadata.py:176-200). */
  def getJob(jobId: String): Option[Row] =
    read().filter(col("job_id") === jobId)
      .orderBy(col("timestamp").desc).limit(1).collect().headOption

  /** Latest record per job id, as an unbounded DataFrame — the input for
    * both the display table ([[listJobs]]) and whole-ledger aggregations
    * (status counts, duration stats), which must stay distributed because
    * the ledger is append-only and grows without bound.
    */
  def latestJobs(status: Option[String] = None): DataFrame = {
    val w = Window.partitionBy(col("job_id")).orderBy(col("timestamp").desc)
    val latest = read()
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
    status.fold(latest)(s => latest.filter(col("status") === s))
  }

  /** M5 list_jobs with optional status filter + limit (metadata.py:202-234).
    * Status means *latest* status: event-sourcing makes this a max-by-
    * timestamp window per job id, then filter.
    */
  def listJobs(status: Option[String] = None, limit: Int = 50): DataFrame =
    latestJobs(status)
      .orderBy(col("timestamp").desc)
      .limit(limit)

  /** Maintenance: rewrite the many tiny per-append files into `parts`
    * files (small-file compaction; run it periodically on busy ledgers).
    * Read fully, write to a temp dir, swap — the ledger is a control-plane
    * table so a brief swap window is acceptable.
    */
  def compact(parts: Int = 1): Unit = {
    if (!exists) return
    val tmp = s"$ledgerDir.compact.tmp"
    read().coalesce(parts).write.mode(SaveMode.Overwrite).parquet(tmp)
    val dir = new org.apache.hadoop.fs.Path(ledgerDir)
    val tmpP = new org.apache.hadoop.fs.Path(tmp)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(dir, true)
    // rename signals some failures by returning false, not throwing —
    // unchecked, that would silently leave the ledger destroyed with the
    // data stranded in the tmp dir.
    if (!fs.rename(tmpP, dir))
      throw new java.io.IOException(
        s"ledger compaction rename failed; data preserved at $tmp")
  }

  def read(): DataFrame =
    if (exists) spark.read.schema(schema).parquet(ledgerDir)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)

  private def exists: Boolean = {
    val p = new org.apache.hadoop.fs.Path(ledgerDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).exists(_.getPath.getName.endsWith(".parquet"))
  }

  private def append(r: Row): Unit =
    spark.createDataFrame(java.util.List.of(r), schema)
      .coalesce(1)
      .write.mode(SaveMode.Append).parquet(ledgerDir)
}

object JobLedger {

  /** Fixed-width ISO-8601 (always 6 fraction digits): Instant.toString
    * varies fraction length (none/millis/nanos), and '…00Z' > '…00.4Z'
    * lexicographically — latest-wins ordering on the string column needs
    * every timestamp the same shape.
    */
  private val tsFormat = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'")
    .withZone(java.time.ZoneOffset.UTC)

  def fixedWidthIso(at: Instant): String = tsFormat.format(at)

  /** Fixed ledger schema (FIXTURES.md §8; metadata.py:65-74, :97-117). */
  val schema: StructType = StructType(Seq(
    StructField("job_id", StringType, nullable = false),
    StructField("timestamp", StringType, nullable = false), // ISO-8601
    StructField("status", StringType, nullable = false), // RUNNING|SUCCESS|FAILED
    StructField("started_at", StringType),
    StructField("completed_at", StringType),
    StructField("failed_at", StringType),
    StructField("duration_seconds", DecimalType(38, 18)), // Decimal parity, metadata.py:115
    StructField("environment", StringType),
    StructField("trigger_event", MapType(StringType, StringType)),
    StructField("job_result", MapType(StringType, StringType)),
    StructField("error_message", StringType),
    StructField("error_traceback", StringType)
  ))

  private def record(
      jobId: String, at: Instant, status: String, environment: String,
      startedAt: Option[String] = None, completedAt: Option[String] = None,
      failedAt: Option[String] = None,
      durationSeconds: Option[java.math.BigDecimal] = None,
      triggerEvent: Map[String, String] = Map.empty,
      jobResult: Map[String, String] = Map.empty,
      errorMessage: Option[String] = None, errorTraceback: Option[String] = None
  ): Row =
    Row(jobId, fixedWidthIso(at), status,
      startedAt.orNull, completedAt.orNull, failedAt.orNull,
      durationSeconds.map(_.setScale(18, java.math.RoundingMode.HALF_UP)).orNull,
      environment,
      triggerEvent, jobResult,
      errorMessage.orNull, errorTraceback.orNull)
}
