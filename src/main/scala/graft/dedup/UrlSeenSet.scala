package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Rolling CANONICAL-URL seen-set — the crawl loop's cheapest kill: a
  * re-crawled unchanged page dies on its `UrlOps.canonicalize`d URL by
  * exact anti-join BEFORE any text stage (extraction, shingling,
  * quality) spends a cycle on it. The extendIndex-style twin of
  * `MinHashDedup.Index.textHashes`, for URLs instead of texts.
  *
  * The index stores one row per URL: the distinct (xxhash64,
  * salted-xxhash64) PAIR — 16 bytes/URL, never the string — plus an
  * optional CONTENT hash for change-aware re-crawl. The pair matters at
  * scale (the textHashes birthday argument): one 64-bit hash hits its
  * birthday bound around ~4B URLs — real crawl-frontier size — where a
  * collision silently kills a never-seen page; matching on two
  * domain-separated draws pushes that to ~1e-19 at 10^10 URLs.
  *
  * Change-aware mode (the content overloads): a URL-only seen-set kills
  * a re-crawled URL even when the page CHANGED, so the corpus can never
  * refresh. With a content column, [[filterNew]] keeps a row when its
  * URL is new OR its content hash differs from the stored one, and
  * [[extend]] UPSERTS the latest hash (delete-and-insert on the skinny
  * frame) — a re-published changed page passes the URL stage and
  * supersedes its stored hash; its unchanged twin still dies.
  *
  * Scale shape: [[filterNew]] is one equi-join on two longs — the batch
  * side is the micro-batch, the index side a skinny parquet-backed
  * frame; past the broadcast threshold, [[compactBucketed]] lays the
  * set out bucketed on the hash pair so the join co-locates and the
  * corpus-sized side NEVER shuffles (only the drop-sized batch does);
  * [[extend]] costs ∝ the batch in URL-only mode and ∝ one index scan
  * in upsert mode; [[compact]] bounds the per-batch union/join lineage
  * exactly like `MinHashDedup.compactIndex`.
  */
object UrlSeenSet {

  /** The seen-set: one row per URL — (url_hash, url_hash2,
    * content_hash), content_hash null when the URL was recorded without
    * content evidence (URL-only build/extend).
    */
  final case class Index(hashes: DataFrame)

  /** Hash rows for the NON-NULL URLs only. Spark's `xxhash64` SKIPS
    * null arguments (it returns the running seed, a non-null constant),
    * so an unfiltered null URL would plant the deterministic pair
    * (xxhash64 seed, salt-only hash) in the set — after which every
    * later null-URL row would be silently killed as "seen". The filter
    * here makes build/extend unable to plant that pair, whatever the
    * caller feeds in.
    *
    * With a content column, the row carries xxhash64(content); a URL
    * appearing twice in one batch keeps the max content hash (feed
    * canonically deduped batches — `ExactDedup.keepFirst` on the canon
    * column — so this tiebreak never actually fires). Null content also
    * hashes to xxhash64's seed constant: all null-content rows form ONE
    * deterministic change-class (they compare equal to each other and
    * unequal to any real content's hash).
    */
  private def hashRows(urls: DataFrame, urlCol: String,
      contentCol: Option[String]): DataFrame = {
    val nonNull = urls.where(col(urlCol).isNotNull)
    val keyed = nonNull.select(
      xxhash64(col(urlCol)).as("url_hash"),
      xxhash64(lit("graft-url2"), col(urlCol)).as("url_hash2"),
      contentCol.map(c => xxhash64(col(c)))
        .getOrElse(lit(null).cast("long")).as("content_hash"))
    if (contentCol.isEmpty) keyed.distinct()
    else keyed.groupBy(col("url_hash"), col("url_hash2"))
      .agg(max(col("content_hash")).as("content_hash"))
  }

  /** An empty seen-set (a crawl frontier's first batch). */
  def empty(spark: SparkSession): Index = {
    import spark.implicits._
    Index(Seq.empty[(Long, Long, java.lang.Long)]
      .toDF("url_hash", "url_hash2", "content_hash"))
  }

  /** Build from a URL column (canonicalize upstream — the set stores
    * whatever key it is given). Checkpoint-bounded like
    * `MinHashDedup.buildIndex`.
    */
  def build(urls: DataFrame, urlCol: String): Index =
    Index(hashRows(urls, urlCol, None).localCheckpoint())

  /** Change-aware build: each URL is stored with its content hash, so
    * [[filterNew]]'s content form can tell an unchanged re-crawl from a
    * re-published CHANGED page.
    */
  def build(urls: DataFrame, urlCol: String, contentCol: String): Index =
    Index(hashRows(urls, urlCol, Some(contentCol)).localCheckpoint())

  /** Batch rows whose `urlCol` has never been seen — the URL-stage kill.
    * Null URLs are KEPT (no evidence to kill on): the `isNotNull` join
    * term means a null row matches nothing, and [[hashRows]] guarantees
    * the index can never hold the null pair — both sides of the
    * contract are enforced here, not in the caller.
    */
  def filterNew(batch: DataFrame, urlCol: String, index: Index): DataFrame =
    batch.join(index.hashes,
      batch(urlCol).isNotNull &&
        xxhash64(batch(urlCol)) === index.hashes("url_hash") &&
        xxhash64(lit("graft-url2"), batch(urlCol)) === index.hashes("url_hash2"),
      "left_anti")

  /** Change-aware kill: keep rows whose URL is NEW, or whose content
    * hash DIFFERS from the stored one — the re-crawl refresh path (a
    * changed page re-enters the corpus; its unchanged twin dies). Rows
    * whose stored content_hash is null (the URL was recorded URL-only,
    * no content evidence) are KEPT: kill-on-content needs evidence,
    * like the null-URL rule. Null URLs are kept as in the URL-only
    * form. Same scale shape — one equi-join on two longs, index side
    * broadcast or bucket-co-located.
    */
  def filterNew(batch: DataFrame, urlCol: String, contentCol: String,
      index: Index): DataFrame =
    batch.join(index.hashes,
      batch(urlCol).isNotNull &&
        xxhash64(batch(urlCol)) === index.hashes("url_hash") &&
        xxhash64(lit("graft-url2"), batch(urlCol)) === index.hashes("url_hash2"),
      "left")
      .where(index.hashes("url_hash").isNull ||
        index.hashes("content_hash").isNull ||
        index.hashes("content_hash") =!= xxhash64(batch(contentCol)))
      .drop(index.hashes("url_hash"))
      .drop(index.hashes("url_hash2"))
      .drop(index.hashes("content_hash"))

  /** Grow the set with a batch's URLs, at cost ∝ the batch. Extend with
    * the [[filterNew]] survivors — already-seen URLs are already in the
    * set, and skipping them keeps the frame one-row-per-URL (the
    * invariant the content join relies on). Null URLs among the
    * survivors are SAFE to pass: [[hashRows]] drops them, so they can
    * never poison the set against future null rows.
    */
  def extend(index: Index, batch: DataFrame, urlCol: String): Index =
    extendWith(index, deltaRows(batch, urlCol))

  /** A batch's hash-row DELTA — the unit the crawl CLI persists
    * per-drain (ExactlyOnce-keyed) so a crash between drains cannot
    * lose state the checkpoint already committed (r15 ADVICE). Same
    * rows [[extend]] unions; hand them to [[extendWith]]/[[upsertWith]]
    * so the durable write and the in-memory extension share one
    * computation.
    */
  def deltaRows(batch: DataFrame, urlCol: String): DataFrame =
    hashRows(batch, urlCol, None).localCheckpoint()

  /** Change-aware delta rows (content hash carried). */
  def deltaRows(batch: DataFrame, urlCol: String, contentCol: String): DataFrame =
    hashRows(batch, urlCol, Some(contentCol)).localCheckpoint()

  /** [[extend]] over precomputed [[deltaRows]]. */
  def extendWith(index: Index, delta: DataFrame): Index =
    Index(index.hashes.unionByName(
      delta.select("url_hash", "url_hash2", "content_hash")))

  /** Change-aware [[extend]] (upsert) over precomputed [[deltaRows]]. */
  def upsertWith(index: Index, delta: DataFrame): Index = {
    val d = delta.select("url_hash", "url_hash2", "content_hash")
    Index(index.hashes
      .join(d.select("url_hash", "url_hash2"),
        Seq("url_hash", "url_hash2"), "left_anti")
      .unionByName(d))
  }

  /** Change-aware UPSERT: delete-and-insert on the skinny frame — the
    * batch's URLs replace their stored rows (superseding the content
    * hash of a re-published changed page), new URLs append. Extend with
    * the content-form [[filterNew]] survivors: unchanged re-crawls are
    * already stored, and survivors include CHANGED urls whose pair IS
    * in the set — which is exactly why this is an upsert, not a union.
    * Cost: one scan of the index (anti-join against the broadcast-sized
    * batch) per extension; [[compact]] bounds the join lineage.
    */
  def extend(index: Index, batch: DataFrame, urlCol: String,
      contentCol: String): Index =
    upsertWith(index, deltaRows(batch, urlCol, contentCol))

  /** Parquet round-trip under `dir` — bounds the per-extension
    * union/join lineage and doubles as the set's durable restart form
    * (the `MinHashDedup.compactIndex` contract; UrlSeenSetSpec pins
    * compacted ≡ uncompacted verdicts).
    */
  def compact(index: Index, dir: String): Index = {
    val spark = index.hashes.sparkSession
    val path = s"${dir.stripSuffix("/")}/url_hashes"
    index.hashes.write.mode("overwrite").parquet(path)
    Index(spark.read.parquet(path))
  }

  /** Restore a [[compact]]-written set from its durable form — the
    * restart path the crawl CLI pairs with its streaming checkpoint.
    */
  def load(spark: SparkSession, dir: String): Index =
    Index(spark.read.parquet(s"${dir.stripSuffix("/")}/url_hashes"))

  /** The past-broadcast-threshold layout: compact into a BUCKETED table
    * (bucketed and sorted on the full join key, (url_hash, url_hash2)),
    * so [[filterNew]] against a corpus-scale set runs as a sort-merge
    * join in which the INDEX side needs no exchange and no sort — the
    * scan's bucketing IS the join distribution. At 100 TB this is the
    * difference between shuffling the frontier every drain and
    * shuffling only the drop-sized batch into the bucket layout.
    * Both key columns are bucket columns: v1 bucketed joins eliminate
    * the exchange when the bucket set matches the join keys, and the
    * batch side's exchange must land on the same key set to co-locate.
    *
    * `table` names the catalog entry (the data lives under `dir`, an
    * external table); re-compacting into the same name overwrites it.
    */
  def compactBucketed(index: Index, dir: String, table: String,
      buckets: Int): Index = {
    require(buckets > 0, s"bucket count must be positive, got $buckets")
    val spark = index.hashes.sparkSession
    val path = s"${dir.stripSuffix("/")}/url_hashes_bucketed"
    index.hashes.write
      .mode("overwrite")
      .bucketBy(buckets, "url_hash", "url_hash2")
      .sortBy("url_hash", "url_hash2")
      .option("path", path)
      .format("parquet")
      .saveAsTable(table)
    Index(spark.table(table))
  }
}
