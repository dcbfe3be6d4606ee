package graft.core

/** When to compact a rolling index — the cadence knob the crawl loop
  * (and the `Pipeline crawl` CLI) applies to every index it rolls
  * forward (`MinHashDedup.compactIndex`, `IvfIndex.compactIndex`,
  * `UrlSeenSet.compact`). Compaction bounds per-extension union lineage
  * and doubles as the durable restart form, so the policy is about
  * AMORTIZATION, not correctness: compacted ≡ uncompacted by frame
  * equality (CompactIndexSpec), and `everyK` trades re-write cost
  * (∝ index size each firing) against plan depth between firings.
  */
final case class CompactionPolicy(everyK: Int) {
  require(everyK > 0, s"compaction cadence must be positive, got $everyK")

  /** True on the LAST ordinal of each k-wide window (2, 5, 8, … for
    * k=3) — firing at a window's end rather than its start means a
    * fresh index is never rewritten before it has absorbed anything.
    * Negative ordinals are rejected: ordinals are drain/batch sequence
    * numbers, and a negative one means the caller's counter is broken.
    */
  def due(ordinal: Long): Boolean = {
    require(ordinal >= 0, s"batch ordinal must be non-negative, got $ordinal")
    ordinal % everyK == everyK - 1
  }

  /** Apply `compact` to `index` when [[due]], else pass it through —
    * the one-liner the loop composes per rolled index.
    */
  def maybe[I](ordinal: Long, index: I)(compact: I => I): I =
    if (due(ordinal)) compact(index) else index
}

object CompactionPolicy {
  /** Never compact — for bounded runs whose lineage stays shallow. */
  val Never: CompactionPolicy = CompactionPolicy(Int.MaxValue)
}
