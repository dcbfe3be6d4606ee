package graft.operators

import org.apache.spark.sql.DataFrame

import graft.core.EngineConfig

/** The reference's fixed six-stage transform sequence (transformer.py:39-92):
  * clean names → nulls → dedup → cast → derive → validate, with the stats
  * dict re-expressed as [[TransformStats]].
  *
  * Job accounting (the 100 TB concern): `run` costs exactly one stats job
  * (the fused [[ColumnStats]] aggregate, skipped when no stage needs it) —
  * the returned plan is otherwise lazy. `runWithStats` adds one counting
  * job for the output-side counters. The reference's eager per-stage
  * len(df)/isnull() calls would be 6+ full scans here; we refuse to
  * replicate that.
  */
object TransformPipeline {

  final case class TransformStats(
      inputRows: Long,
      outputRows: Long,
      rowsRemoved: Long,
      duplicatesRemoved: Long,
      totalNullsFound: Long,
      nullHandling: String,
      transformationsApplied: Seq[String],
      validation: Stages.ValidationReport
  )

  /** Lazy path: compose the full transform plan. The single ColumnStats job
    * runs only if the chosen strategy/casts need it (flag-mode nulls and the
    * 80% numeric rule are data-dependent — SURVEY.md §7.4).
    */
  def plan(df: DataFrame, config: EngineConfig = EngineConfig.default): DataFrame = {
    // T0 guard, lazily: a schema-less frame can't be transformed; a merely
    // row-empty frame flows through the (lazy) plan at zero cost.
    if (df.columns.isEmpty) return df
    val strategy = Stages.NullStrategy.fromString(
      config.getString("etl.transform.null_handling", "drop"))
    val threshold = config.getDouble("etl.transform.numeric_parse_threshold", 0.8)
    val dedup = config.getBoolean("etl.transform.deduplicate", default = true)

    val cleaned = Stages.cleanColumnNames(df)
    // At most one stats job, lazily — and never on a streaming plan, where
    // an aggregate action is illegal: streams run the static stages only
    // (flag-mode adds no columns, the 80% numeric rule doesn't fire).
    lazy val stats =
      if (df.isStreaming) ColumnStats.unknown else ColumnStats.collect(cleaned)
    val afterNulls = Stages.handleNulls(cleaned, strategy, stats)
    val afterDedup = if (dedup) Stages.deduplicate(afterNulls) else afterNulls
    val cast = Stages.castTypes(afterDedup, stats, threshold)
    Stages.deriveFields(cast)
  }

  /** Eager path with the reference's full stats contract. Costs the stats
    * job + two counting jobs (input count fused into ColumnStats; output
    * count fused into validation).
    */
  def runWithStats(
      df: DataFrame,
      config: EngineConfig = EngineConfig.default
  ): (DataFrame, TransformStats) = {
    val strategy = Stages.NullStrategy.fromString(
      config.getString("etl.transform.null_handling", "drop"))
    val threshold = config.getDouble("etl.transform.numeric_parse_threshold", 0.8)
    val dedup = config.getBoolean("etl.transform.deduplicate", default = true)

    val cleaned = Stages.cleanColumnNames(df)
    val stats = ColumnStats.collect(cleaned)
    if (stats.rowCount == 0) {
      val report = Stages.ValidationReport(isValid = true, 0L, df.columns.length,
        df.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap, Seq.empty)
      return (df, TransformStats(0, 0, 0, 0, 0, "empty_input", Seq.empty, report))
    }

    val afterNulls = Stages.handleNulls(cleaned, strategy, stats)
    // Row count after null handling, before dedup — needed for the
    // duplicates_removed counter (transformer.py:160-170). drop is the only
    // strategy that changes the row count.
    val rowsBeforeDedup =
      if (strategy == Stages.NullStrategy.Drop) afterNulls.count() else stats.rowCount
    val afterDedup = if (dedup) Stages.deduplicate(afterNulls) else afterNulls
    val cast = Stages.castTypes(afterDedup, stats, threshold)
    val derived = Stages.deriveFields(cast)

    val validation = Stages.validate(derived) // fused output-side aggregate
    val applied = Seq("clean_column_names", "null_handling") ++
      (if (dedup) Seq("deduplication") else Nil) ++
      Seq("type_casting", "derived_fields")
    (derived, TransformStats(
      inputRows = stats.rowCount,
      outputRows = validation.rowCount,
      rowsRemoved = stats.rowCount - validation.rowCount,
      duplicatesRemoved = rowsBeforeDedup - validation.rowCount,
      totalNullsFound = stats.totalNulls,
      nullHandling = strategy.toString.toLowerCase,
      transformationsApplied = applied,
      validation = validation
    ))
  }
}
