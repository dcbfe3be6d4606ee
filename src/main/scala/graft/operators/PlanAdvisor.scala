package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Automated physical-plan audit — the PlanSpec ".explain and iterate"
  * review frozen as a runtime operator, so a pipeline can gate ITSELF
  * on plan quality before burning cluster hours: run the audit on a
  * dry plan, fail the deploy on a `critical` finding.
  *
  * Checks (string-level over the executed-plan tree, the same surface
  * PlanSpec pins — stable across AQE because the initial plan prints
  * the full tree):
  *
  *  - `cartesian-product` (critical): a CartesianProduct node — O(n·m)
  *    at any scale.
  *  - `nested-loop-join` (warn): BroadcastNestedLoopJoin — fine for a
  *    tiny broadcast side, a disaster if the build side grows.
  *  - `single-partition-exchange` (warn): Exchange SinglePartition —
  *    a global collection point (global sort/window/limit) that stops
  *    scaling past one core.
  *  - `global-window` (warn): a window function with an empty PARTITION
  *    BY — every row through one task's sorter.
  *  - `unpushed-scan-filter` (info): a FileScan whose DataFilters carry
  *    a real predicate while PushedFilters holds at most the derived
  *    IsNotNull guards — the scan reads everything the filter will
  *    discard (e.g. the predicate wraps the column in an expression).
  */
object PlanAdvisor {

  final case class Finding(check: String, severity: String, evidence: String)

  private val globalWindow =
    """windowspecdefinition\([^,)]+ (ASC|DESC)""".r.unanchored
  private val dataFilters = """DataFilters: \[([^\]]*)\]""".r.unanchored
  private val pushedFilters = """PushedFilters: \[([^\]]*)\]""".r.unanchored

  /** True when the scan line carries a non-null-guard data filter but
    * pushed at most IsNotNull guards down. (Comma-splitting is a
    * heuristic over nested predicate text; fragments of a nested pushed
    * predicate read as non-trivial, which only ever UN-flags.)
    */
  private def unpushedScan(l: String): Boolean = {
    def items(m: Option[String]) =
      m.getOrElse("").split(", ").toSeq.filter(_.nonEmpty)
    val data = items(dataFilters.findFirstMatchIn(l).map(_.group(1)))
    val pushed = items(pushedFilters.findFirstMatchIn(l).map(_.group(1)))
    data.exists(!_.startsWith("isnotnull(")) &&
      !pushed.exists(!_.startsWith("IsNotNull("))
  }

  /** Audit one frame's physical plan (analysis only — nothing runs). */
  def findings(df: DataFrame): Seq[Finding] = {
    val plan = df.queryExecution.executedPlan.toString
    def ev(marker: String): String =
      plan.linesIterator.find(_.contains(marker)).map(_.trim.take(120)).getOrElse(marker)
    val out = Seq.newBuilder[Finding]
    if (plan.contains("CartesianProduct"))
      out += Finding("cartesian-product", "critical", ev("CartesianProduct"))
    if (plan.contains("BroadcastNestedLoopJoin"))
      out += Finding("nested-loop-join", "warn", ev("BroadcastNestedLoopJoin"))
    if (plan.contains("Exchange SinglePartition"))
      out += Finding("single-partition-exchange", "warn", ev("Exchange SinglePartition"))
    if (plan.linesIterator.exists(l =>
        l.contains("Window ") && globalWindow.findFirstIn(l).isDefined))
      out += Finding("global-window", "warn", ev("windowspecdefinition"))
    if (plan.linesIterator.exists(l => l.contains("FileScan") && unpushedScan(l)))
      out += Finding("unpushed-scan-filter", "info", ev("FileScan"))
    out.result()
  }

  /** Audit a set of named frames into one report frame — a row per
    * finding, plus a `no_findings` sentinel for clean plans so a clean
    * case is a positive assertion rather than an absence.
    */
  def audit(spark: SparkSession, cases: Seq[(String, DataFrame)]): DataFrame = {
    val rows = cases.flatMap { case (name, df) =>
      val fs = findings(df)
      if (fs.isEmpty) Seq(Row(name, "no_findings", "ok"))
      else fs.map(f => Row(name, f.check, f.severity))
    }
    spark.createDataFrame(
      java.util.List.of(rows: _*),
      StructType(Seq(
        StructField("case_name", StringType, nullable = false),
        StructField("check_name", StringType, nullable = false),
        StructField("severity", StringType, nullable = false))))
  }
}
