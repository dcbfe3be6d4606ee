package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact edit-distance (Levenshtein) join — the entity-resolution /
  * record-linkage primitive: match every left string to every right
  * string within `maxDistance` edits, without ever comparing all pairs.
  *
  * The naive formulation (`levenshtein(l, r) <= k` as a theta join) is a
  * cartesian product — quadratic in the corpus and the classic fuzzy-join
  * trap at scale. The scale formulation here is the segment-pigeonhole
  * filter (the PassJoin family, Li/Deng/Feng 2011, public literature):
  * partition each INDEXED string into k+1 contiguous segments — an
  * optimal alignment applies ≤ k edits, so at least one segment survives
  * untouched and appears VERBATIM in any string within distance k, at a
  * position shifted by at most k (the net insert/delete drift of the
  * edits before it). Candidate discovery is therefore an equi-join:
  *
  *   - index side: k+1 `(segIdx, len, segment)` keys per string;
  *   - probe side: for each candidate indexed length n ∈ [|s|-k, |s|+k]
  *     (semi-joined against the lengths that actually exist on the index
  *     side — a tiny broadcast that prunes the fan-out before it is
  *     exploded), each segment index, and each allowed start position
  *     within the ±k shift window, the matching substring of s —
  *     ≤ (2k+1)·(k+1)·(2k+1) keys per string, a small constant for the
  *     k ≤ 3 this operator targets.
  *
  * Keys cross the shuffle as a single `xxhash64` long (hash collisions
  * only add candidates, which verification removes), candidate pairs are
  * deduplicated as skinny (id, id) rows BEFORE the strings re-attach
  * (the same lever the LSH near-dup path measures at ~60×), and the
  * final verify uses Spark's codegen'd `levenshtein(l, r, k)` — the
  * thresholded form, which abandons a DP row as soon as the bound is
  * exceeded. The filter is exact-complete (the pigeonhole admits no
  * false negatives), so the output equals the cartesian ground truth.
  *
  * Strings shorter than k+1 cannot be partitioned into k+1 non-empty
  * segments; they ride a separate stratum: a right string t with
  * |t| ≤ k can only match left strings with |s| ≤ |t|+k ≤ 2k, so both
  * sides of that stratum are distinct-deduplicated (bounded by content
  * diversity — at most Σ|alphabet|^2k distinct short strings — never by
  * corpus size) and verified via a broadcast join, then re-attached to
  * their ids. Null strings on either side never match (SQL semantics).
  */
object FuzzyJoin {

  /** The persisted side of an incremental fuzzy-match cycle: skinny
    * hashed segment keys (two longs per row), the id→string frames each
    * stratum verifies against, and the distinct index lengths that prune
    * probe fan-out. All four are plain DataFrames a caller can write to
    * parquet and re-read; at production scale `keys` would be
    * bucket-written on `__key` so repeated probes co-locate against it
    * without re-shuffling the corpus side.
    */
  final case class Index(
      keys: DataFrame, longStrs: DataFrame, shortStrs: DataFrame,
      lens: DataFrame, maxDistance: Int)

  // Even partition of an n-char string into k+1 segments: the first
  // (k+1 - n%(k+1)) segments get floor(n/(k+1)) chars, the rest one
  // more. start/len below are the closed forms of that convention —
  // index and probe recompute them from (n, i) alone, so the two sides
  // can never disagree on where a segment lives.
  private def segLen(kk: Int)(n: Column, i: Column): Column =
    (n.cast("int") / kk).cast("int") +
      when(i >= lit(kk) - pmod(n.cast("int"), lit(kk)), 1).otherwise(0)
  private def segStart(kk: Int)(n: Column, i: Column): Column = // 0-based
    i * (n.cast("int") / kk).cast("int") +
      greatest(lit(0), i - (lit(kk) - pmod(n.cast("int"), lit(kk))))
  private def key(i: Column, n: Column, seg: Column): Column =
    xxhash64(lit("graft-fj"), i, n, seg)

  /** Build the segment index over the `right` side once; probe it with
    * any number of batches. Strings shorter than k+1 land in the short
    * stratum (see class doc on [[join]] semantics).
    */
  def buildIndex(
      right: DataFrame,
      rightId: String,
      rightStr: String,
      maxDistance: Int
  ): Index = {
    require(maxDistance >= 0, s"maxDistance must be >= 0, got $maxDistance")
    val k = maxDistance
    val kk = k + 1
    val r = right.select(col(rightId).as("__rid"), col(rightStr).as("__rs"))
      .filter(col("__rs").isNotNull)
    val rLong = r.filter(length(col("__rs")) >= kk)
    // Index keys: k+1 rows per string, ids + a hashed long only.
    val idxKeys = rLong
      .withColumn("__n", length(col("__rs")))
      .withColumn("__i", explode(sequence(lit(0), lit(k))))
      .select(col("__rid"),
        key(col("__i"), col("__n"),
          substring(col("__rs"), segStart(kk)(col("__n"), col("__i")) + 1,
            segLen(kk)(col("__n"), col("__i")))  // 3-arg substring: pos is 1-based
            .as("__seg")).as("__key"))
      .distinct()
    Index(
      keys = idxKeys,
      longStrs = rLong,
      shortStrs = r.filter(length(col("__rs")) < kk),
      // Lengths that exist on the index side — a tiny frame, broadcast
      // to prune the probe's candidate-length fan-out before it explodes.
      lens = rLong.select(length(col("__rs")).as("__n")).distinct(),
      maxDistance = k)
  }

  /** Probe the index with a batch. Cost ∝ the batch: the probe fan-out
    * (≤ (2k+1)(k+1)(2k+1) hashed keys per string) and the verify joins
    * are per-batch-row; the index contributes skinny (long, id) postings
    * to one equi-join and string lookups for the candidates only.
    * Output shape is [[join]]'s: `leftId`, the index side's id column
    * under its original name, `dist`.
    */
  def probe(
      left: DataFrame,
      leftId: String,
      leftStr: String,
      index: Index,
      rightIdOut: String = "right_id"
  ): DataFrame = {
    val k = index.maxDistance
    val kk = k + 1
    val l = left.select(col(leftId).as("__lid"), col(leftStr).as("__ls"))
      .filter(col("__ls").isNotNull)

    val probeKeys = l
      .withColumn("__m", length(col("__ls")))
      // candidate indexed lengths: |n - m| <= k and n >= k+1 …
      .withColumn("__n", explode(sequence(
        greatest(col("__m") - k, lit(kk)), col("__m") + k)))
      .filter(col("__n") >= kk)
      // … further pruned to lengths the index actually contains
      .join(broadcast(index.lens), Seq("__n"), "left_semi")
      .withColumn("__i", explode(sequence(lit(0), lit(k))))
      .withColumn("__li", segLen(kk)(col("__n"), col("__i")))
      .withColumn("__pi", segStart(kk)(col("__n"), col("__i")))
      .withColumn("__lo", greatest(lit(0), col("__pi") - k))
      .withColumn("__hi", least(col("__m") - col("__li"), col("__pi") + k))
      // sequence(lo, hi) runs DESCENDING when lo > hi — guard, don't trust
      .filter(col("__lo") <= col("__hi"))
      .withColumn("__p", explode(sequence(col("__lo"), col("__hi"))))
      .select(col("__lid"),
        key(col("__i"), col("__n"),
          substring(col("__ls"), col("__p") + 1, col("__li"))).as("__key"))
      .distinct()

    // Skinny candidate pairs (two longs), deduped BEFORE strings attach.
    val candidates = probeKeys.join(index.keys, "__key")
      .select(col("__lid"), col("__rid")).distinct()

    val verifiedLong = candidates
      .join(l, "__lid")
      .join(index.longStrs, "__rid")
      .withColumn("__dist", levenshtein(col("__ls"), col("__rs"), k))
      // thresholded levenshtein returns -1 past the bound
      .filter(col("__dist") >= 0)
      .select(col("__lid"), col("__rid"), col("__dist"))

    // ---- short stratum: right strings with |t| <= k --------------------
    // ed(s, t) <= k forces |s| <= 2k, so both sides are drawn from the
    // bounded universe of very short strings: distinct the STRINGS (not
    // the rows), verify the tiny distinct×distinct grid via a broadcast
    // join, and re-attach ids by string equality.
    val shortRs = index.shortStrs.select(col("__rs")).distinct()
    val shortLs = l.filter(length(col("__ls")) <= 2 * k)
      .select(col("__ls")).distinct()
    // One DP per pair: compute the thresholded distance as a column on
    // the broadcast product and filter it, instead of evaluating the
    // identical levenshtein once as a join predicate and again as the
    // output column.
    val shortMatches = shortLs.crossJoin(broadcast(shortRs))
      .withColumn("__dist", levenshtein(col("__ls"), col("__rs"), k))
      .filter(col("__dist") >= 0)
    val verifiedShort = shortMatches
      .join(l, "__ls")
      .join(index.shortStrs, "__rs")
      .select(col("__lid"), col("__rid"), col("__dist"))

    verifiedLong.unionByName(verifiedShort)
      .select(col("__lid").as(leftId), col("__rid").as(rightIdOut),
        col("__dist").as("dist"))
  }

  /** Join `left` to `right` on edit distance ≤ `maxDistance` between
    * `leftStr` and `rightStr` — [[buildIndex]] + [[probe]] composed.
    *
    * @return one row per matching (left, right) pair: `leftId`,
    *         `rightId`, and `dist` (the exact Levenshtein distance,
    *         0 ≤ dist ≤ maxDistance).
    */
  def join(
      left: DataFrame,
      leftId: String,
      leftStr: String,
      right: DataFrame,
      rightId: String,
      rightStr: String,
      maxDistance: Int
  ): DataFrame =
    probe(left, leftId, leftStr,
      buildIndex(right, rightId, rightStr, maxDistance), rightIdOut = rightId)
}
