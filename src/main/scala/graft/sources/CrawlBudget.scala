package graft.sources

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

/** Per-host politeness budgeting — the scheduling stage between
  * frontier discovery ([[HtmlLinks]]) and the next drain: a crawler
  * that respects `Crawl-delay` can fetch at most
  * `floor(horizon / delay)` URLs per host per drain window, so the
  * frontier is CAPPED per host to that quota (floored at one fetch —
  * liveness: even the politest host makes progress). Deterministic:
  * within a host, the lexicographically smallest URLs win (URLs are
  * unique post-canonical-dedup, so the order is total).
  *
  * Scale shape: ranking per host is a window over the frontier — one
  * shuffle keyed by host. Real frontiers are Zipf-skewed (one hot host
  * can carry a large share of all discovered URLs), so the rank runs in
  * TWO phases when `skewSalts > 1`: phase one ranks within
  * (host, xxhash64(url) % salts) subgroups and keeps only each
  * subgroup's top-quota (the classic distributed top-k bound — a
  * host's global top-quota is contained in the union of its per-salt
  * top-quotas), phase two ranks the ≤ salts×quota survivors per host.
  * Phase one's shuffle carries the same bytes a single window would,
  * but no single partition ever holds a hot host whole; phase two's
  * input is quota-bounded. `skewSalts = 1` is the plain single-window
  * form; CrawlBudgetSpec pins salted ≡ unsalted.
  */
object CrawlBudget {

  /** Cap `frontier` to each host's politeness quota.
    *
    * @param delays (host, delay_seconds) — [[RobotsTxt.delayFor]]'s
    *   output, broadcast (per-host rows are tiny by construction)
    * @param horizonSeconds the drain window the quota divides
    * @param defaultDelaySeconds delay for hosts absent from `delays`
    * @param priorityCol when set, the HIGHEST-priority URLs win each
    *   host's quota (crawl-value scheduling — e.g. a domain-rank or
    *   quality score joined upstream), with the URL as the
    *   deterministic tie-break; unset = lexicographic URL order. The
    *   two-phase skew bound holds for any total order, since both
    *   phases rank by the same key.
    */
  def cap(
      frontier: DataFrame,
      urlCol: String,
      delays: DataFrame,
      horizonSeconds: Double,
      defaultDelaySeconds: Double,
      skewSalts: Int = 16,
      priorityCol: Option[String] = None
  ): DataFrame = {
    require(horizonSeconds > 0, s"horizon must be positive, got $horizonSeconds")
    require(defaultDelaySeconds > 0,
      s"default delay must be positive, got $defaultDelaySeconds")
    require(skewSalts > 0, s"skewSalts must be positive, got $skewSalts")
    val withHost = frontier
      .withColumn("__host", UrlOps.host(col(urlCol)))
      .join(broadcast(delays.select(col("host").as("__dhost"),
        col("delay_seconds").as("__delay"))),
        col("__host") === col("__dhost"), "left")
    val quota = greatest(lit(1L),
      floor(lit(horizonSeconds) /
        coalesce(col("__delay"), lit(defaultDelaySeconds))).cast("long"))
    val budgeted = withHost.withColumn("__quota", quota)
    val order = priorityCol
      .map(p => Seq(col(p).desc, col(urlCol).asc))
      .getOrElse(Seq(col(urlCol).asc))
    val preCapped =
      if (skewSalts == 1) budgeted
      else {
        // phase one: bound every partition's rows to quota before the
        // per-host rank — a hot host never lands whole on one core
        val salted = Window
          .partitionBy(col("__host"), F.pmod(xxhash64(col(urlCol)), lit(skewSalts)))
          .orderBy(order: _*)
        budgeted
          .withColumn("__srn", row_number().over(salted))
          .filter(col("__srn") <= col("__quota"))
          .drop("__srn")
      }
    val perHost = Window.partitionBy(col("__host")).orderBy(order: _*)
    preCapped
      .withColumn("__rn", row_number().over(perHost))
      .filter(col("__rn") <= col("__quota"))
      .drop("__host", "__dhost", "__delay", "__quota", "__rn")
  }
}
