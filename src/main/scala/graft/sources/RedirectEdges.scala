package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** 3xx redirect harvesting — the crawl loop's third frontier source
  * (beside page outlinks, [[HtmlLinks]], and sitemap seeds,
  * [[Sitemaps]]): a redirect response carries no content, but its
  * `Location` header is exactly the URL that should be fetched next,
  * and the (source → final destination) pair is a CANONICAL-ALIAS
  * signal (the source URL names the destination's content — dedup and
  * link analysis should treat them as one page). A loop that keeps only
  * `http_status = 200` drops both (r15 verdict #1).
  *
  * [[edges]] turns records into single-hop edges (the `Location` value
  * resolved against the record's own URI — relative Locations are
  * legal per RFC 9110 §10.2.2); [[resolveChains]] follows multi-hop
  * chains (301 → 301 → 200) to each source's final destination,
  * dropping chains that are still redirecting after `maxHops` (cycles
  * and too-long chains — real crawlers abandon both).
  *
  * Scale shape: edges are 3xx-record-sized (a slice of the drain's
  * batch, never the corpus); [[resolveChains]] is `maxHops` self
  * equi-joins over that small frame. The frontier-side gates
  * (domain/robots/seen/budget) stay downstream, shared with outlink
  * discovery.
  */
object RedirectEdges {

  /** Single-hop redirect edges `(src, dst, status)` from a WARC record
    * frame ([[WarcShards.readRecords]] columns): 3xx records with a
    * `Location`, the Location resolved against the record URI.
    * Self-redirects (src = dst — an immediate loop) are dropped here;
    * longer cycles die in [[resolveChains]]. Distinct: a URL captured
    * twice with the same answer is one edge.
    */
  def edges(records: DataFrame,
      uriCol: String = "target_uri",
      statusCol: String = "http_status",
      locationCol: String = "http_location"): DataFrame =
    records
      .where(col(statusCol).between(300, 399) && col(locationCol).isNotNull &&
        col(uriCol).isNotNull)
      .select(col(uriCol).as("src"),
        HtmlLinks.resolve(col(uriCol), col(locationCol)).as("dst"),
        col(statusCol).cast("int").as("status"))
      .where(col("dst").isNotNull && col("dst") =!= col("src"))
      .distinct()

  /** Follow redirect chains to their final destination:
    * `(src, final_dst, hops)` for every source whose chain TERMINATES
    * (final_dst is not itself a redirect source) within `maxHops`;
    * cyclic or over-long chains are dropped whole. Intermediate hops
    * each get their own row (b → c appears beside a → c for the chain
    * a → b → c) — every alias maps to the canonical end.
    *
    * Feed one-dst-per-src edges (canonically deduped batches); a src
    * with two conflicting dsts fans out into both chains.
    */
  def resolveChains(edges: DataFrame, maxHops: Int = 5): DataFrame = {
    require(maxHops >= 1, s"maxHops must be positive, got $maxHops")
    val e = edges.select(col("src"), col("dst")).localCheckpoint()
    var cur = e.select(col("src"), col("dst").as("cur"),
      lit(1).cast("int").as("hops"))
    for (_ <- 2 to maxHops) {
      val nxt = e.select(col("src").as("__s"), col("dst").as("__d"))
      cur = cur.join(nxt, cur("cur") === col("__s"), "left")
        .select(cur("src"),
          coalesce(col("__d"), cur("cur")).as("cur"),
          when(col("__d").isNotNull, cur("hops") + 1)
            .otherwise(cur("hops")).as("hops"))
    }
    // still redirecting after maxHops = cycle or over-long → dropped
    cur.join(e.select(col("src").as("__still")).distinct(),
        cur("cur") === col("__still"), "left_anti")
      .select(col("src"), col("cur").as("final_dst"), col("hops"))
  }
}
