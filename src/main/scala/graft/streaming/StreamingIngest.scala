package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.core.{EngineConfig, FileFormat}
import graft.operators.TransformPipeline

/** Structured-Streaming ingestion — the idiomatic replacement for the
  * reference's two trigger modes (S3 ObjectCreated → Lambda,
  * main.tf:372-390; hourly EventBridge sweep, main.tf:396-415).
  *
  * A file-source stream with `Trigger.AvailableNow` + checkpointing covers
  * both: each run drains exactly the new files since the last checkpoint
  * and exits — event-driven semantics without an always-on cluster, and
  * exactly-once sink semantics via the checkpoint + file-sink manifest.
  * Swapping `AvailableNow` for `ProcessingTime` turns the same pipeline
  * into a continuous micro-batch service; the dataflow is unchanged.
  *
  * The transform stage reuses [[TransformPipeline.plan]] — the lazy
  * variant: data-dependent stages (null-flag columns, the 80%-numeric
  * rule) need a stats pass the streaming engine can't do per-batch without
  * an action, so streaming runs the static stages only (names, drop/fill
  * nulls, casts by name, derived fields) and leaves flag-mode to batch.
  */
object StreamingIngest {

  /** Start an ingest stream: watch `inDir` for `format` files with a fixed
    * `schema` (streams require declared schemas — inference would race
    * writers), transform, write partitioned parquet + checkpoint.
    */
  def start(
      spark: SparkSession,
      inDir: String,
      schema: StructType,
      format: FileFormat,
      outDir: String,
      checkpointDir: String,
      config: EngineConfig = EngineConfig.default,
      availableNow: Boolean = true
  ): StreamingQuery = {
    val reader = spark.readStream.schema(schema)
    val raw = format match {
      case FileFormat.Csv     => reader.option("header", "true").csv(inDir)
      case FileFormat.Json    => reader.json(inDir)
      case FileFormat.Parquet => reader.parquet(inDir)
      case FileFormat.Orc     => reader.orc(inDir)
    }

    val transformed = TransformPipeline.plan(raw, config)

    val trigger =
      if (availableNow) Trigger.AvailableNow()
      else Trigger.ProcessingTime("1 minute")

    val writer = transformed.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
    val partitioned =
      if (Seq("_year", "_month", "_day").forall(transformed.columns.contains))
        writer.partitionBy("_year", "_month", "_day")
      else writer
    partitioned.start()
  }

  /** Watermarked hourly aggregation over an event stream — the streaming
    * twin of ParityQueries.q14 (same window semantics, checked there
    * against the batch oracle). Late data beyond the watermark is dropped;
    * output mode append emits each window once it's final.
    */
  def hourlyCounts(
      events: DataFrame,
      tsCol: String = "ts",
      watermark: String = "2 hours"
  ): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), "1 hour"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("hour_start"), col("n_events"))

  /** Streaming exact dedup with BOUNDED state: keys older than the
    * watermark are evicted, so state size tracks the de-dup window, not
    * the stream's lifetime — the continuous-ingest counterpart of the
    * batch `ExactDedup`. Within the window, re-deliveries (at-least-once
    * sources, replayed batches) and content duplicates collapse to the
    * first arrival; duplicates farther apart than the watermark delay
    * are batch dedup's job downstream. Pass the columns that define
    * identity (e.g. a row hash) — not the event time itself.
    */
  def dedupWithinWatermark(
      events: DataFrame,
      keyCols: Seq[String],
      tsCol: String = "ts",
      watermark: String = "2 hours"
  ): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Gap-based sessionization (stateful): session_window groups events
    * per user whose gaps are < `gap`. Works identically over batch frames
    * (exercised by the oracle-checked q17) and streams (with watermark).
    */
  def sessionize(
      events: DataFrame,
      userCol: String = "user_id",
      tsCol: String = "ts",
      gap: String = "6 hours"
  ): DataFrame =
    events
      .groupBy(session_window(col(tsCol), gap), col(userCol))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
      .select(
        col(userCol),
        col("session_window.start").as("session_start"),
        col("n_events"), col("sum_value"))

  /** Late-data quarantine router (`foreachBatch` sink): each micro-batch
    * splits against the ENGINE'S OWN high-watermark — max event time
    * seen across all prior batches, persisted beside the checkpoint, so
    * a restart resumes with the same horizon — rows older than
    * `hwm − delay` land in `quarantineDir`, the rest in `sinkDir`. The
    * batch's own rows never count against themselves (the horizon
    * advances AFTER the split), matching Spark's one-trigger watermark
    * lag.
    *
    * This is the quarantine pattern rather than silent dropping: late
    * rows are DATA (reconciliation, backfill, upstream-lag alerting) —
    * and the split rule is engine-owned and exactly replayable, rather
    * than leaning on the internal aggregation filter whose
    * admit-vs-drop behavior is version-dependent.
    */
  def lateQuarantineSink(
      sinkDir: String,
      quarantineDir: String,
      hwmPath: String,
      tsCol: String = "ts",
      delayMicros: Long = 3600L * 1000000L
  ): (DataFrame, Long) => Unit = { (batch, _) =>
    val spark = batch.sparkSession
    val fs = new org.apache.hadoop.fs.Path(hwmPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(hwmPath)
    val hwm: Long =
      if (fs.exists(p)) {
        val in = fs.open(p)
        try in.readLong() finally in.close()
      } else Long.MinValue
    val stamped = batch
      .withColumn("__micros", unix_micros(col(tsCol)))
      .localCheckpoint() // split + max must see ONE evaluation of the batch
    val horizon = if (hwm == Long.MinValue) Long.MinValue else hwm - delayMicros
    stamped.filter(col("__micros") < horizon).drop("__micros")
      .write.mode("append").parquet(quarantineDir)
    stamped.filter(col("__micros") >= horizon).drop("__micros")
      .write.mode("append").parquet(sinkDir)
    val batchMax = stamped.agg(max(col("__micros"))).head().get(0)
    val newHwm = if (batchMax == null) hwm else math.max(hwm, batchMax.asInstanceOf[Long])
    if (newHwm != Long.MinValue) {
      val out = fs.create(p, true)
      try out.writeLong(newHwm) finally out.close()
    }
  }
}
