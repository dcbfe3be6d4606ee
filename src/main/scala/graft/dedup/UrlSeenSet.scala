package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Rolling CANONICAL-URL seen-set — the crawl loop's cheapest kill: a
  * re-crawled unchanged page dies on its `UrlOps.canonicalize`d URL by
  * exact anti-join BEFORE any text stage (extraction, shingling,
  * quality) spends a cycle on it. The extendIndex-style twin of
  * `MinHashDedup.Index.textHashes`, for URLs instead of texts.
  *
  * The index stores the distinct (xxhash64, salted-xxhash64) PAIR per
  * URL — 16 bytes/URL, never the string. The pair matters at scale
  * (the textHashes birthday argument): one 64-bit hash hits its
  * birthday bound around ~4B URLs — real crawl-frontier size — where a
  * collision silently kills a never-seen page; matching on two
  * domain-separated draws pushes that to ~1e-19 at 10^10 URLs.
  *
  * Scale shape: [[filterNew]] is one equi-anti-join on two longs — the
  * batch side is the micro-batch, the index side a skinny parquet-backed
  * frame (bucket by `url_hash` at scale so the join co-locates);
  * [[extend]] costs ∝ the batch; [[compact]] bounds the per-batch union
  * lineage exactly like `MinHashDedup.compactIndex`.
  */
object UrlSeenSet {

  /** The seen-set: distinct (url_hash, url_hash2) pairs. */
  final case class Index(hashes: DataFrame)

  /** Hash pairs for the NON-NULL URLs only. Spark's `xxhash64` SKIPS
    * null arguments (it returns the running seed, a non-null constant),
    * so an unfiltered null URL would plant the deterministic pair
    * (xxhash64 seed, salt-only hash) in the set — after which every
    * later null-URL row would be silently killed as "seen". The filter
    * here makes build/extend unable to plant that pair, whatever the
    * caller feeds in.
    */
  private def hashPair(urls: DataFrame, urlCol: String): DataFrame =
    urls.where(col(urlCol).isNotNull)
      .select(
        xxhash64(col(urlCol)).as("url_hash"),
        xxhash64(lit("graft-url2"), col(urlCol)).as("url_hash2"))
      .distinct()

  /** An empty seen-set (a crawl frontier's first batch). */
  def empty(spark: SparkSession): Index = {
    import spark.implicits._
    Index(Seq.empty[(Long, Long)].toDF("url_hash", "url_hash2"))
  }

  /** Build from a URL column (canonicalize upstream — the set stores
    * whatever key it is given). Checkpoint-bounded like
    * `MinHashDedup.buildIndex`.
    */
  def build(urls: DataFrame, urlCol: String): Index =
    Index(hashPair(urls, urlCol).localCheckpoint())

  /** Batch rows whose `urlCol` has never been seen — the URL-stage kill.
    * Null URLs are KEPT (no evidence to kill on): the `isNotNull` join
    * term means a null row matches nothing, and [[hashPair]] guarantees
    * the index can never hold the null pair — both sides of the
    * contract are enforced here, not in the caller.
    */
  def filterNew(batch: DataFrame, urlCol: String, index: Index): DataFrame =
    batch.join(index.hashes,
      batch(urlCol).isNotNull &&
        xxhash64(batch(urlCol)) === index.hashes("url_hash") &&
        xxhash64(lit("graft-url2"), batch(urlCol)) === index.hashes("url_hash2"),
      "left_anti")

  /** Grow the set with a batch's URLs, at cost ∝ the batch. Extend with
    * the [[filterNew]] survivors — already-seen URLs are already in the
    * set, and skipping them keeps the frame duplicate-free (a duplicate
    * pair would not change anti-join verdicts, only waste bytes). Null
    * URLs among the survivors are SAFE to pass: [[hashPair]] drops them,
    * so they can never poison the set against future null rows.
    */
  def extend(index: Index, batch: DataFrame, urlCol: String): Index =
    Index(index.hashes.unionByName(hashPair(batch, urlCol).localCheckpoint()))

  /** Parquet round-trip under `dir` — bounds the per-extension union
    * lineage and doubles as the set's durable restart form (the
    * `MinHashDedup.compactIndex` contract; UrlSeenSetSpec pins
    * compacted ≡ uncompacted verdicts).
    */
  def compact(index: Index, dir: String): Index = {
    val spark = index.hashes.sparkSession
    val path = s"${dir.stripSuffix("/")}/url_hashes"
    index.hashes.write.mode("overwrite").parquet(path)
    Index(spark.read.parquet(path))
  }
}
