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

  /** Join `left` to `right` on edit distance ≤ `maxDistance` between
    * `leftStr` and `rightStr`.
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
  ): DataFrame = {
    require(maxDistance >= 0, s"maxDistance must be >= 0, got $maxDistance")
    val k = maxDistance
    val kk = k + 1

    val l = left.select(col(leftId).as("__lid"), col(leftStr).as("__ls"))
      .filter(col("__ls").isNotNull)
    val r = right.select(col(rightId).as("__rid"), col(rightStr).as("__rs"))
      .filter(col("__rs").isNotNull)

    // ---- main stratum: right strings long enough to partition ----------
    val rLong = r.filter(length(col("__rs")) >= kk)

    // Even partition of an n-char string into k+1 segments: the first
    // (k+1 - n%(k+1)) segments get floor(n/(k+1)) chars, the rest one
    // more. start/len below are the closed forms of that convention —
    // the probe side recomputes them from (n, i) alone, so the two sides
    // can never disagree on where a segment lives.
    def segLen(n: Column, i: Column): Column =
      (n.cast("int") / kk).cast("int") +
        when(i >= lit(kk) - pmod(n.cast("int"), lit(kk)), 1).otherwise(0)
    def segStart(n: Column, i: Column): Column = // 0-based
      i * (n.cast("int") / kk).cast("int") +
        greatest(lit(0), i - (lit(kk) - pmod(n.cast("int"), lit(kk))))

    def key(i: Column, n: Column, seg: Column): Column =
      xxhash64(lit("graft-fj"), i, n, seg)

    // Index keys: k+1 rows per string, ids + a hashed long only.
    val idxKeys = rLong
      .withColumn("__n", length(col("__rs")))
      .withColumn("__i", explode(sequence(lit(0), lit(k))))
      .select(col("__rid"),
        key(col("__i"), col("__n"),
          substring(col("__rs"), segStart(col("__n"), col("__i")) + 1,
            segLen(col("__n"), col("__i")))  // 3-arg substring: pos is 1-based
            .as("__seg")).as("__key"))
      .distinct()

    // Lengths that exist on the index side — a tiny frame, broadcast to
    // prune the probe's candidate-length fan-out before it explodes.
    val idxLens = rLong.select(length(col("__rs")).as("__n")).distinct()

    val probeKeys = l
      .withColumn("__m", length(col("__ls")))
      // candidate indexed lengths: |n - m| <= k and n >= k+1 …
      .withColumn("__n", explode(sequence(
        greatest(col("__m") - k, lit(kk)), col("__m") + k)))
      .filter(col("__n") >= kk)
      // … further pruned to lengths the index actually contains
      .join(broadcast(idxLens), Seq("__n"), "left_semi")
      .withColumn("__i", explode(sequence(lit(0), lit(k))))
      .withColumn("__li", segLen(col("__n"), col("__i")))
      .withColumn("__pi", segStart(col("__n"), col("__i")))
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
    val candidates = probeKeys.join(idxKeys, "__key")
      .select(col("__lid"), col("__rid")).distinct()

    val verifiedLong = candidates
      .join(l, "__lid")
      .join(rLong, "__rid")
      .withColumn("__dist", levenshtein(col("__ls"), col("__rs"), k))
      // thresholded levenshtein returns -1 past the bound
      .filter(col("__dist") >= 0)
      .select(col("__lid"), col("__rid"), col("__dist"))

    // ---- short stratum: right strings with |t| <= k --------------------
    // ed(s, t) <= k forces |s| <= 2k, so both sides are drawn from the
    // bounded universe of very short strings: distinct the STRINGS (not
    // the rows), verify the tiny distinct×distinct grid via a broadcast
    // join, and re-attach ids by string equality.
    val rShort = r.filter(length(col("__rs")) < kk)
    val shortRs = rShort.select(col("__rs")).distinct()
    val shortLs = l.filter(length(col("__ls")) <= 2 * k)
      .select(col("__ls")).distinct()
    val shortMatches = shortLs.join(broadcast(shortRs),
        levenshtein(col("__ls"), col("__rs"), k) >= 0)
      .withColumn("__dist", levenshtein(col("__ls"), col("__rs"), k))
    val verifiedShort = shortMatches
      .join(l, "__ls")
      .join(rShort, "__rs")
      .select(col("__lid"), col("__rid"), col("__dist"))

    verifiedLong.unionByName(verifiedShort)
      .select(col("__lid").as(leftId), col("__rid").as(rightId),
        col("__dist").as("dist"))
  }
}
