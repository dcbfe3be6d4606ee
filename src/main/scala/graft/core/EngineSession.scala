package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's standard tuning.
  *
  * Replaces the reference's process bootstrap (lambda_handler.py:63-66): one
  * shared SparkSession instead of per-invocation boto3 clients. Defaults are
  * chosen for correctness-portability (UTC; ANSI pinned ON, with the
  * reference's errors="coerce" permissiveness expressed through explicit
  * try_* functions — try_to_timestamp, try_cast — rather than a lax
  * session) and scale (AQE on, shuffle partitions sized to the local core
  * count rather than Spark's default 200 — on a real cluster callers pass
  * the cluster parallelism instead).
  */
object EngineSession {

  def builder(
      master: String = s"local[${Runtime.getRuntime.availableProcessors()}]",
      shufflePartitions: Int = Runtime.getRuntime.availableProcessors(),
      appName: String = "graft-engine"
  ): SparkSession.Builder =
    SparkSession
      .builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      // Pinned, not inherited: the engine's semantics (overflow/0-div
      // throw; coercion goes through try_*) must not flip if Spark's
      // default changes or a host session sets the flag differently.
      .config("spark.sql.ansi.enabled", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // Parquet TIMESTAMP(NANOS) (e.g. pandas-written ns columns) is
      // otherwise an illegal type for the Spark reader; as-long + an
      // explicit ns→µs conversion at load (Tables.load) matches DuckDB's
      // truncating read of the same files.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Write µs-precision parquet timestamps (the modern logical type;
      // INT96 is the deprecated default and breaks min/max pushdown in
      // other readers).
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      // The status store tracks every job/stage/task/SQL execution the
      // session ever ran (defaults: 1000 executions with full plan
      // graphs, 100k tasks) even with the UI disabled. A long-lived
      // session — a full bench battery is ~550 query executions in one
      // JVM — accumulates hundreds of MB of dead bookkeeping whose only
      // effect is late-session GC drag (measured: queries post warm
      // medians ABOVE their cold sample late in the battery while
      // running 2-3× faster in isolation). Keep a small debugging
      // window instead.
      .config("spark.sql.ui.retainedExecutions", "25")
      .config("spark.ui.retainedJobs", "100")
      .config("spark.ui.retainedStages", "100")
      .config("spark.ui.retainedTasks", "2000")

  def create(): SparkSession = {
    val spark = builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Silence the two known-noise WARNs that pollute the driver-kept tail
    * of the bench output. Scoped to the exact loggers that emit them —
    * everything else at WARN stays visible.
    *
    *  - "RDD was locally checkpointed, its lineage has been truncated…":
    *    the engine unpersists localCheckpoint blocks DELIBERATELY between
    *    bench/verify queries, one warning per unpersist.
    *  - "Truncated the string representation of a plan…"
    *    (SparkStringUtils): a once-per-JVM cosmetic note about plan
    *    PRINTING width, irrelevant to execution, that landed directly in
    *    front of the one JSON line the driver parses (BENCH_r08 tail).
    */
  def quietLocalCheckpointWarnings(): Unit = {
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.rdd.MapPartitionsRDD", org.apache.logging.log4j.Level.ERROR)
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.util.SparkStringUtils", org.apache.logging.log4j.Level.ERROR)
    // "Assume no metadata directory…" + full FileNotFoundException stack:
    // FileStreamSink.hasMetadata probes every batch-read path for a
    // streaming `_spark_metadata` dir and logs the miss at WARN with the
    // exception attached — on a glob path (the tar-shard scans) the probe
    // ALWAYS throws. Cosmetic; the read proceeds via the glob resolver.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.streaming.sinks.FileStreamSink",
      org.apache.logging.log4j.Level.ERROR)
  }
}
