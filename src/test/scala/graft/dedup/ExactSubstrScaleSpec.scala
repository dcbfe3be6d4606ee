package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{MetricsProbe, SparkSpec}

/** MEASURES (not argues) ExactSubstr's cost model — the two sentences its
  * scaladoc stakes the 100 TB story on:
  *
  *   1. the shuffle carries (id, pos, h) rows, never the window TEXT
  *      (ExactSubstr.scala: "the shuffle rows are 16 bytes + id
  *      regardless of w"), and total volume is LINEAR in corpus chars —
  *      the distributed answer to Lee et al.'s single-machine suffix
  *      array, which a quadratic (all-pairs) or text-shipping regression
  *      would silently destroy;
  *   2. winnowing (`every` = k) cuts that volume to ~2/(k+1) — the scale
  *      mode's whole point.
  *
  * Mirrors IngestScaleSpec's discipline: shuffle bytes are the primary
  * (deterministic) gate, best-of-2 to de-noise scheduler jitter; wall
  * time is not gated (this host swings ~15%).
  */
class ExactSubstrScaleSpec extends SparkSpec {

  /** Deterministic synthetic corpus: ~300 chars per doc, all-distinct
    * text (the id is woven into every token) so the duplicated-hash set
    * is tiny and the measured volume is a pure function of corpus chars;
    * 4× is a strict superset of 1×.
    */
  private def corpus(n: Long): DataFrame =
    spark.range(n).select(col("id").as("doc_id"),
      concat_ws(" ",
        (0 until 24).map(k => concat(lit("tok"), col("id"), lit(s"x$k"))): _*)
        .as("text"))

  // aggregate the report's VALUE columns: a bare count() lets Catalyst
  // eliminate the left join against the (provably key-unique) span
  // aggregate and with it the whole window pipeline — 236 B of shuffle
  // and nothing measured
  private def run(docs: DataFrame, every: Int): Long =
    ExactSubstr.report(docs, "doc_id", "text", width = 40, every = every)
      .agg(count(lit(1)) + sum(col("dup_chars"))).head.getLong(0)

  private def measureBest(docs: DataFrame, every: Int): (Long, Long) = {
    val a = MetricsProbe.measure(spark)(run(docs, every))
    val b = MetricsProbe.measure(spark)(run(docs, every))
    assert(a.result == b.result)
    (math.min(a.shuffleWriteBytes, b.shuffleWriteBytes), a.result)
  }

  test("shuffle volume is linear in corpus chars and winnowing cuts it ~2/(k+1)") {
    val c1 = corpus(2000L).localCheckpoint()
    val c4 = corpus(8000L).localCheckpoint()

    // warm-up (JIT, codegen cache) before measuring
    run(c1, 1); run(c4, 1); run(c1, 5)

    val (sw1, n1) = measureBest(c1, 1)
    val (sw4, n4) = measureBest(c4, 1)
    val (sw1w, _) = measureBest(c1, 5)
    assert(n1 == 2000L && n4 == 8000L)

    info(f"1x exact: $sw1%d B shuffled; 4x exact: $sw4%d B; 1x winnowed(k=5): $sw1w%d B")

    // Gate 1: LINEAR in corpus — 4× the chars must shuffle ≈4× the bytes.
    // An all-pairs/cartesian regression is 16×; shipping per-doc state
    // into a global structure is also super-linear. Window [3, 6] allows
    // partition-count rounding both ways.
    val growth = sw4.toDouble / math.max(1L, sw1)
    info(f"corpus-growth ratio: $growth%.2f (corpus grew 4.00)")
    assert(growth > 3.0 && growth < 6.0,
      f"shuffle bytes grew $growth%.2f× on a 4× corpus — the window stage " +
        "is no longer linear in corpus chars")

    // Gate 2: winnowing (k=5) must cut exact-mode volume well under half
    // (theory ~2/(k+1) = 0.33 of the window rows; downstream stages add
    // a few percent of fixed cost).
    val cut = sw1w.toDouble / math.max(1L, sw1)
    info(f"winnowed/exact shuffle ratio: $cut%.2f (theory ~0.33 at k=5)")
    assert(cut < 0.55,
      f"winnowed mode shuffled $cut%.2f× of exact mode — selection is not " +
        "thinning the window stream")

    // Gate 3: bytes per window row stay hash-sized. Exact mode emits one
    // (pos:int, h:long) row per char-window; those rows cross at most two
    // shuffles (the dup-count agg and the semi-join repartition), so even
    // with per-row framing overhead the budget is well under ~48 B/window.
    // Shipping the 40-char window TEXT instead would blow this gate even
    // after lz4 (>= 40 B payload before overhead, in each crossing).
    val nWindows = c1.select(explode(call_function("graft_char_windows",
      col("text"), lit(40), lit(1)))).count()
    val perWindow = sw1.toDouble / math.max(1L, nWindows)
    info(f"exact mode: $nWindows%d windows, $perWindow%.1f shuffled B/window")
    assert(perWindow < 48.0,
      f"$perWindow%.1f shuffle bytes per window — the window text is " +
        "leaking into the shuffle")
  }
}
