package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] exercises one operator from SURVEY.md §2 (or a
  * north-star extension op) over the driver-generated parquet tables in the
  * given sf directory; [[oracleSql]] carries the DuckDB-equivalent SQL the
  * driver hash-compares against. Column names are aliased identically on both
  * sides, floating-point aggregates are rounded on both sides, and every
  * oracle-checked query has a total deterministic ORDER BY.
  */
object SparkEntry {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.operators.ParityQueries.queries ++
      graft.dedup.DedupQueries.queries ++
      graft.similarity.SimilarityQueries.queries ++
      graft.text.TextQueries.queries ++
      graft.text.LangIdQueries.queries ++
      graft.multimodal.MultimodalQueries.queries ++
      graft.sinks.TxQueries.queries ++
      graft.streaming.StreamingQueries.queries ++
      graft.gold.AnalyticsQueries.queries ++
      graft.gold.BehaviorQueries.queries ++
      graft.sources.TarQueries.queries ++
      graft.sources.WarcQueries.queries ++ Map(
    // A1-A4 (SURVEY §2.4): hash group-by + multi-agg + arithmetic-in-agg +
    // count + group/order report (reference etl/README.md:679-685 pattern).
    "q1_agg" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
          round(avg(col("l_discount")), 6).as("avg_disc"),
          count(lit(1)).as("n_rows")
        )
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.operators.ParityQueries.oracles ++
      graft.dedup.DedupQueries.oracles ++
      graft.similarity.SimilarityQueries.oracles ++
      graft.text.TextQueries.oracles ++
      graft.text.LangIdQueries.oracles ++
      graft.multimodal.MultimodalQueries.oracles ++
      graft.sinks.TxQueries.oracles ++
      graft.streaming.StreamingQueries.oracles ++
      graft.gold.AnalyticsQueries.oracles ++
      graft.gold.BehaviorQueries.oracles ++
      graft.sources.TarQueries.oracles ++
      graft.sources.WarcQueries.oracles ++ Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
        |  round(avg(l_discount), 6) AS avg_disc,
        |  count(*) AS n_rows
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}
