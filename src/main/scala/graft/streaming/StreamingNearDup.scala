package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.dedup.{MinHashDedup, Shingles}

/** Streaming near-duplicate CANDIDATE detection — the continuous
  * counterpart of [[graft.dedup.MinHashDedup]]'s batch LSH, for ingest
  * pipelines that must flag "this document near-duplicates something we
  * already took" without re-pairing the corpus per micro-batch.
  *
  * Shape: the narrow per-doc stages are identical to batch (shingle set
  * → minhash signature → banded buckets, all codegen'd expressions);
  * what changes is candidate generation — instead of a bucket-collect
  * over a complete corpus, each (band, bucket) key holds bounded
  * per-bucket state (the ids seen in that bucket, within a horizon) in
  * `flatMapGroupsWithState`, and an arriving doc emits one candidate
  * per retained same-bucket id. The stream stays append-mode and
  * per-key state is the ONLY memory — nothing global, nothing O(n²).
  *
  * Contract mirrors the batch discovery path: the output is CANDIDATES
  * (exact verification is a downstream batch join on the texts by id,
  * exactly like [[MinHashDedup.probe]]'s verify stage — LSH false
  * positives are expected here and filtered there), and a pair that
  * collides in several bands is emitted at-least-once per colliding
  * band; dedup downstream with `distinct` on (first_id, later_id).
  *
  * Boundedness, the part that matters at stream scale:
  *  - `horizon` — an entry stops matching once the watermark passes its
  *    event time + horizon (evicted at next probe or timeout; same
  *    "duplicates farther apart are batch dedup's job" contract as
  *    [[StreamingIngest.dedupWithinWatermark]]).
  *  - `maxPerBucket` — a HOT bucket (boilerplate shingles) is exactly
  *    where unbounded per-key state kills a streaming job; the bucket
  *    keeps its newest `maxPerBucket` entries, oldest dropped first.
  *    That bounds recall loss to pathological buckets LSH would flood
  *    with false positives anyway, and it is a documented cap, not a
  *    silent one: set it from expected bucket occupancy
  *    (docs-in-horizon / 2^bucket-bits × safety factor).
  *
  * Works identically over a batch frame (watermark 0 → nothing evicts,
  * timeouts never fire), which is how the differential spec pins the
  * candidate set against `MinHashDedup.candidatePairs` without a
  * cluster.
  */
object StreamingNearDup {

  final case class BucketedDoc(band: Int, bucket: Long, doc_id: Long,
                               ts: java.sql.Timestamp)
  final case class Entry(id: Long, tsUs: Long)
  /** first_id arrived (event-time, then id) before later_id. */
  final case class Candidate(first_id: Long, later_id: Long)

  def candidates(
      docs: DataFrame,
      idCol: String,
      tsCol: String,
      textCol: String,
      shingleWidth: Int = 3,
      bands: Int = 32,
      rows: Int = 4,
      watermarkDelay: String = "10 seconds",
      horizonMs: Long = 2L * 60 * 60 * 1000,
      maxPerBucket: Int = 64
  ): Dataset[Candidate] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val streaming = docs.isStreaming
    val horizonUs = horizonMs * 1000L

    // Project/rename BEFORE the watermark and never re-cast `ts` after:
    // a cast re-projection mints a fresh attribute without the watermark
    // tag, and the stateful operator then fails analysis with "event-time
    // timeout not supported without watermark".
    val projected = docs.select(
      col(idCol).cast("long").as("doc_id"),
      col(tsCol).cast("timestamp").as("ts"),
      Shingles.shingleSet(col(textCol), shingleWidth).as("shset"))
    val withWm =
      if (streaming) projected.withWatermark("ts", watermarkDelay) else projected
    // Bucket generation is MinHashDedup's OWN recipe (shared, not
    // re-implemented): a drift between the two would silently break the
    // spec'd streaming-equals-batch candidate equivalence.
    val bucketed = MinHashDedup.bandBuckets(
      withWm
        .filter(size(col("shset")) > 0)
        .withColumn("sig", MinHashDedup.signature(col("shset"), bands * rows)),
      "doc_id", "sig", bands, rows, keep = Seq("ts"))
      .select(col("band").cast("int").as("band"), col("bucket"),
        col("doc_id"), col("ts"))
      .as[BucketedDoc]

    // Local function only — a module-object reference inside the fold
    // would drag non-serializable state into the closure.
    import TimeUs.toMicros

    def fold(key: (Int, Long), it: Iterator[BucketedDoc],
             state: GroupState[List[Entry]]): Iterator[Candidate] = {
      val wmUs = if (streaming) state.getCurrentWatermarkMs() * 1000L else 0L
      def live(es: List[Entry]): List[Entry] =
        es.filter(_.tsUs + horizonUs >= wmUs)
      def arm(es: List[Entry]): Unit =
        if (es.isEmpty) { if (state.exists) state.remove() }
        else {
          state.update(es)
          if (streaming) state.setTimeoutTimestamp(
            math.max(es.map(_.tsUs + horizonUs).min / 1000L,
              state.getCurrentWatermarkMs() + 1))
        }

      val prior = live(state.getOption.getOrElse(Nil))
      if (state.hasTimedOut) { // pure eviction wake-up
        arm(prior)
        return Iterator.empty
      }
      // Deterministic intra-batch order: event time, then id (the
      // group iterator's own order is not a contract).
      val incoming = it.toVector.sortBy(d => (toMicros(d.ts), d.doc_id))
      val out = Vector.newBuilder[Candidate]
      var entries = prior
      for (d <- incoming) {
        val dUs = toMicros(d.ts)
        // Orientation is EVENT time (then id), never arrival order: a
        // late doc processed after an event-time-newer one must still
        // come out as first_id, or a downstream keep-first consumer
        // drops the wrong document.
        entries.foreach { e =>
          if (e.id != d.doc_id) {
            if (e.tsUs < dUs || (e.tsUs == dUs && e.id < d.doc_id))
              out += Candidate(e.id, d.doc_id)
            else out += Candidate(d.doc_id, e.id)
          }
        }
        // At-least-once re-delivery of a doc re-emits its pairs above
        // but must not duplicate its state entry. The cap keeps the
        // EVENT-TIME-newest entries — resorting before takeRight, so a
        // late arrival cannot masquerade as newest and evict a newer
        // entry.
        if (!entries.exists(_.id == d.doc_id))
          entries = (entries :+ Entry(d.doc_id, dUs))
            .sortBy(e => (e.tsUs, e.id))
            .takeRight(maxPerBucket)
      }
      arm(entries)
      out.result().iterator
    }

    bucketed
      .groupByKey(d => (d.band, d.bucket))
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(fold)
  }
}
