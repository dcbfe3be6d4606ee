package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Adaptive re-crawl scheduling — WHEN to refetch, the missing half of
  * the change-aware seen-set (which stores WHAT changed): from each
  * URL's fetch history, derive the next fetch time by the standard
  * freshness heuristic — a page that keeps changing gets the base
  * revisit interval, a page observed unchanged k consecutive times
  * backs off exponentially (`base * 2^k`, clamped to `maxInterval`).
  * This is the incremental-crawl scheduling rule (cf. Cho &
  * Garcia-Molina, "Effective Page Refresh Policies for Web Crawlers",
  * TODS 2003 — churners deserve the crawl budget; static pages don't).
  *
  * Input: one row per (url, fetch) with a monotone fetch time (epoch
  * seconds — any monotone double works) and the fetch's content hash.
  * Output per url: `last_fetch`, `n_fetches`, `unchanged_streak`
  * (consecutive trailing no-change observations), `interval_seconds`,
  * `next_fetch = last_fetch + interval_seconds`.
  *
  * Scale shape: one window pass keyed by url (lag + row_number in a
  * single window — one shuffle of the history table) and one hash
  * aggregation per url. History tables are fetches-not-corpus sized and
  * naturally pruned by retention; no joins, no skew pivot (a url's
  * history is its own small group).
  */
object RecrawlSchedule {

  def schedule(
      fetches: DataFrame,
      urlCol: String,
      timeCol: String,
      hashCol: String,
      baseIntervalSeconds: Double = 86400.0,
      maxIntervalSeconds: Double = 86400.0 * 64
  ): DataFrame = {
    require(baseIntervalSeconds > 0,
      s"base interval must be positive, got $baseIntervalSeconds")
    require(maxIntervalSeconds >= baseIntervalSeconds,
      s"max interval $maxIntervalSeconds < base $baseIntervalSeconds")
    val w = Window.partitionBy(col(urlCol)).orderBy(col("__t"))
    val hist = fetches.select(
        col(urlCol), col(timeCol).cast("double").as("__t"),
        col(hashCol).as("__h"))
      .withColumn("__prev", lag(col("__h"), 1).over(w))
      .withColumn("__rn", row_number().over(w))
    val changed = col("__prev").isNotNull && !(col("__prev") <=> col("__h"))
    val agg = hist.groupBy(col(urlCol))
      .agg(
        max(col("__t")).as("last_fetch"),
        count(lit(1)).as("n_fetches"),
        max(col("__rn")).as("__max_rn"),
        // the rank of the LAST observed change; null = never changed
        max(when(changed, col("__rn"))).as("__last_change_rn"))
    // observations since the last change (a never-changed page counts
    // from its first fetch — one fetch alone is zero evidence either way)
    val streak = (col("__max_rn") - coalesce(col("__last_change_rn"), lit(1)))
      .cast("int")
    val interval = least(lit(maxIntervalSeconds),
      lit(baseIntervalSeconds) * pow(lit(2.0), streak))
    agg
      .withColumn("unchanged_streak", streak)
      .withColumn("interval_seconds", interval)
      .withColumn("next_fetch", col("last_fetch") + col("interval_seconds"))
      .drop("__max_rn", "__last_change_rn")
  }
}
