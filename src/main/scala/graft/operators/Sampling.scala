package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data curation — every operator
  * here is a pure function of row identity, so the same rows are chosen
  * regardless of partitioning, task order, or cluster size (reruns and
  * backfills produce byte-identical mixtures; `df.sample` cannot promise
  * that across re-partitions).
  */
object Sampling {

  /** Pseudo-uniform [0,1) priority from a row id (+salt). */
  private def priority(id: Column, salt: Long): Column =
    (pmod(xxhash64(id, lit(salt)), lit(1000000000L)).cast("double") / 1e9)

  /** Deterministic fraction-sample: keep rows whose hash-priority falls
    * under `fraction`. No shuffle, no state — a filter that any engine
    * replays identically. Different `salt`s draw independent samples.
    */
  def byFraction(df: DataFrame, idCol: String, fraction: Double, salt: Long = 0L): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction $fraction outside [0,1]")
    df.filter(priority(col(idCol), salt) < fraction)
  }

  /** Deterministic stratified sample: per-stratum fractions (strata
    * absent from the map keep `defaultFraction`). Still shuffle-free —
    * the mixture knob for balancing domains/languages/sources in a
    * training set.
    */
  def stratified(
      df: DataFrame,
      strataCol: String,
      fractions: Map[String, Double],
      idCol: String,
      defaultFraction: Double = 0.0,
      salt: Long = 0L
  ): DataFrame = {
    val frac = fractions.foldLeft(lit(defaultFraction)) { case (els, (s, f)) =>
      when(col(strataCol) === s, lit(f)).otherwise(els)
    }
    df.filter(priority(col(idCol), salt) < frac)
  }

  /** Deterministic k-per-group sample (bottom-k-by-hash sketch): each
    * row's priority is its id hash; the k smallest per group win. Rides
    * the `graft_topk` partial aggregate, so each map task forwards at
    * most k candidates per group — shuffle volume is groups × k, never
    * the raw rows. Returns (groupCols..., idCol) of the sampled rows;
    * join back on id for payload columns.
    */
  def perGroup(
      df: DataFrame,
      groupCols: Seq[String],
      idCol: String,
      k: Int,
      salt: Long = 0L
  ): DataFrame = {
    // topk keeps the HIGHEST scores; negate the [0,1) priority to keep
    // the k smallest hashes. Ties (same truncated priority) break on the
    // id payload — still deterministic.
    val sampled = df
      .groupBy(groupCols.map(col): _*)
      .agg(call_function("graft_topk",
        -priority(col(idCol), salt), col(idCol), lit(k)).as("top"))
    sampled
      .select(groupCols.map(col) :+ explode(col("top.payload")).as(idCol): _*)
  }

  /** Deterministic mixture resampling — domain reweighting: `targets`
    * carries (strataCol, weight); stratum s contributes its
    * floor(weight·total) best-by-hash rows (capped at the stratum's
    * size), the per-stratum counterpart of [[perGroup]]'s uniform k.
    * Strata absent from `targets` contribute nothing.
    *
    * Shape: one `graft_topk` aggregation with the mixture's LARGEST
    * quota (each map task forwards ≤ maxK candidates per stratum —
    * shuffle is strata × maxK, never the raw rows), then a broadcast
    * join against the tiny quota table trims each stratum to its own k.
    * graft_topk's output is sorted best-first, so the posexplode rank IS
    * the within-stratum rank.
    */
  def mixture(
      df: DataFrame,
      strataCol: String,
      idCol: String,
      targets: DataFrame, // (strataCol, "weight")
      total: Long,
      salt: Long = 0L
  ): DataFrame = {
    require(total >= 0L, s"total must be non-negative, got $total")
    // One row per stratum or the inner join fans out: duplicate target
    // rows would feed graft_topk each candidate twice (displacing
    // legitimate ones within the quota) and emit one sample per
    // duplicate — silently wrong counts, so it must be an error here.
    val (nTargets, nStrata) = {
      val r = targets.agg(count(lit(1)), countDistinct(col(strataCol))).head()
      (r.getLong(0), r.getLong(1))
    }
    require(nTargets == nStrata,
      s"targets must have one row per stratum; got $nTargets rows over $nStrata strata")
    // Zero quotas (total = 0, or every weight·total < 1) contribute
    // nothing; dropping them here also keeps graft_topk's k ≥ 1 require
    // from firing on a semantically-empty request.
    val quotas = targets.select(col(strataCol),
      floor(col("weight") * total).cast("long").as("__k"))
      .filter(col("__k") > 0L)
    val maxK = quotas.agg(coalesce(max(col("__k")), lit(0L))).head().getLong(0)
    require(maxK <= Int.MaxValue.toLong, s"largest quota $maxK exceeds Int range")
    if (maxK == 0L)
      return df.select(col(strataCol), col(idCol)).limit(0)
    df
      .join(broadcast(quotas), Seq(strataCol), "inner")
      .groupBy(col(strataCol), col("__k"))
      .agg(call_function("graft_topk",
        -priority(col(idCol), salt), col(idCol), lit(maxK.toInt)).as("top"))
      .select(col(strataCol), col("__k"),
        posexplode(col("top.payload")).as(Seq("__rank", idCol)))
      .filter(col("__rank") < col("__k"))
      .select(col(strataCol), col(idCol))
  }

  /** Original-mass mixture targets from a WEIGHTED frame — the
    * composition glue between `SemDedup.survivorWeights` and
    * [[mixtureEpochs]] (r9 #8): a deduplicated corpus sampled at
    * survivor-count shares under-represents every domain whose duplicate
    * rate was high, so the target share of stratum s is its ORIGINAL
    * mass Σ weight_s / Σ weight — the distribution the corpus had before
    * dedup collapsed duplicates to single voting survivors. The returned
    * (strataCol, weight ∈ (0,1]) frame plugs straight into
    * [[mixture]]/[[mixtureEpochs]] as `targets`.
    *
    * Shape: one per-stratum aggregation (≤ strata skinny rows) and a
    * broadcast of the single-row grand total — nothing
    * corpus-proportional beyond the one scan.
    */
  def massTargets(
      rows: DataFrame,
      strataCol: String,
      weightCol: String
  ): DataFrame = {
    val per = rows.groupBy(col(strataCol)).agg(sum(col(weightCol)).as("__mass"))
    val tot = per.agg(sum(col("__mass")).as("__tot"))
    per.crossJoin(broadcast(tot))
      .select(col(strataCol),
        (col("__mass").cast("double") / col("__tot").cast("double")).as("weight"))
  }

  /** Epoch-aware mixture oversampling — [[mixture]] without the
    * stratum-size cap: a quota LARGER than its stratum repeats the
    * stratum, the way a pretraining mix runs a small high-value domain
    * for several epochs (quota 2.3 × |stratum| = every row 2×, the best
    * 30% by hash priority 3×). Deterministic with-replacement semantics
    * as arithmetic: quota k over n rows means base = k div n copies of
    * every row plus one extra copy for the k mod n best-by-hash rows —
    * so per-row multiplicities within a stratum never differ by more
    * than one, and Σ copies = k EXACTLY (the q102 oracle recomputes the
    * whole per-stratum contract from n and k alone).
    *
    * Returns (strataCol, idCol, n_copies ≥ 1) — one row per surviving
    * physical row with its multiplicity, NOT k exploded rows: the
    * consumer is a weighted sampler/packer (and at 100 TB you want to
    * ship a long, not clone documents in the mix plan).
    *
    * Shape: a skinny per-stratum size aggregation (≤ strata rows to the
    * driver-free broadcast), the same bounded `graft_topk` pass as
    * [[mixture]] for the partial-epoch extras (shuffle ≤ strata ×
    * max(k mod n)), and one equi-join marking extras — rows never fan
    * out by their copy count anywhere.
    */
  def mixtureEpochs(
      df: DataFrame,
      strataCol: String,
      idCol: String,
      targets: DataFrame, // (strataCol, "weight")
      total: Long,
      salt: Long = 0L
  ): DataFrame = {
    require(total >= 0L, s"total must be non-negative, got $total")
    val (nTargets, nStrata) = {
      val r = targets.agg(count(lit(1)), countDistinct(col(strataCol))).head()
      (r.getLong(0), r.getLong(1))
    }
    require(nTargets == nStrata,
      s"targets must have one row per stratum; got $nTargets rows over $nStrata strata")

    val sizes = df.groupBy(col(strataCol)).agg(count(lit(1)).as("__n"))
    val quotas = targets
      .select(col(strataCol), floor(col("weight") * total).cast("long").as("__q"))
      .filter(col("__q") > 0L)
      .join(sizes, Seq(strataCol))
      .select(col(strataCol),
        expr("__q div __n").as("__base"), // integer division — no double rounding
        pmod(col("__q"), col("__n")).as("__rem"))

    val maxRem = quotas.agg(coalesce(max(col("__rem")), lit(0L))).head().getLong(0)
    require(maxRem <= Int.MaxValue.toLong, s"largest partial epoch $maxRem exceeds Int range")
    val joined = df.join(broadcast(quotas), Seq(strataCol))

    // The k mod n best-by-hash rows of each partial-epoch stratum get
    // the extra copy — same bounded top-k trick as mixture: one pass at
    // the largest remainder, then each stratum trims to its own.
    val extras =
      if (maxRem == 0L)
        joined.select(col(strataCol), col(idCol)).limit(0)
          .withColumn("__extra", lit(1L))
      else
        joined.filter(col("__rem") > 0L)
          .groupBy(col(strataCol), col("__rem"))
          .agg(call_function("graft_topk",
            -priority(col(idCol), salt), col(idCol), lit(maxRem.toInt)).as("top"))
          .select(col(strataCol), col("__rem"),
            posexplode(col("top.payload")).as(Seq("__rank", idCol)))
          .filter(col("__rank") < col("__rem"))
          .select(col(strataCol), col(idCol), lit(1L).as("__extra"))

    joined
      .join(extras, Seq(strataCol, idCol), "left")
      .withColumn("n_copies", col("__base") + coalesce(col("__extra"), lit(0L)))
      .filter(col("n_copies") > 0L)
      .select(col(strataCol), col(idCol), col("n_copies"))
  }

  /** Group-aware k-fold assignment: every row of a group lands in the
    * SAME fold (the leakage guarantee cross-validation needs when rows
    * within a group are correlated — same source, same user, same
    * near-dup cluster), with groups spread over folds by the engine's
    * deterministic md5 key (the ShuffleShard recipe, so the oracle
    * mirrors it symbol-for-symbol). Per-stratum balance is statistical
    * (hash-uniform over groups), not enforced — enforcing it would
    * reintroduce the leakage channel the operator exists to close.
    */
  def groupKFold(df: DataFrame, groupCol: String, k: Int): DataFrame = {
    require(k > 1 && k <= 65536, s"k $k outside [2, 65536]")
    df.withColumn("fold",
      pmod(ShuffleShard.hex4(md5(col(groupCol).cast("string"))), lit(k)).cast("long"))
  }

  /** Per-stratum [[systematic]] sampling — exactly `k_s` weighted
    * selections from EACH stratum (the language-balancing step of a
    * corpus mixture, with the same integer-exact identity guarantee as
    * the global sampler; the hash-priority mixture operators above can
    * only oracle their SIZES because xxhash64 has no cross-engine twin).
    * One [[systematic]] pass per listed stratum: strata counts are
    * schema-scale (a handful of languages/domains), so the driver loop
    * is a few narrow job pairs, each internally distributed — rows of
    * unlisted strata are simply never scanned past the stratum filter.
    *
    * @return (stratum, id, weight, n_copies), Σ n_copies = Σ quotas.
    */
  def systematicPerStratum(
      rows: DataFrame,
      strataCol: String,
      idCol: String,
      weightCol: String,
      quotas: Map[String, Int],
      partitions: Int = 0
  ): DataFrame = {
    require(quotas.nonEmpty, "no strata quotas given")
    quotas.toSeq.sortBy(_._1).map { case (stratum, k) =>
      systematic(rows.filter(col(strataCol) === stratum),
        idCol, weightCol, k, partitions)
        .select(lit(stratum).as(strataCol), col("id"), col("weight"),
          col("n_copies"))
    }.reduce(_.unionByName(_))
  }

  /** Weighted SYSTEMATIC (low-variance) sampling — draw exactly `k`
    * selections with per-row inclusion count proportional to integer
    * `weightCol`, deterministically and exactly: lay the rows out on a
    * [0, W) mass line in md5(id) order (the [[ShuffleShard]] key — a
    * pure-function permutation, not engine randomness), place k
    * equispaced selection points t_i = (2i+1)·W/(2k), and give each row
    * one copy per point inside its weight interval. This is the
    * particle-filter "systematic resampling" scheme applied to corpus
    * construction: Σ n_copies = k ALWAYS, each row's count is
    * floor-or-ceil of its expectation k·w/W (minimum variance), and —
    * unlike Efraimidis-Spirakis exponential-race sampling — the whole
    * decision is integer arithmetic, so any engine replays it
    * bit-for-bit (q180's DuckDB oracle recomputes every copy count).
    *
    * Scale shape: the classic two-pass distributed prefix sum
    * ([[BudgetSelect]]'s pattern): range-partition by the md5 key, one
    * skinny per-partition totals pass (P rows to the driver), then one
    * emit pass cumulating within partitions against broadcast offsets.
    * No global window, no SinglePartition exchange; selection-point
    * indices are O(1) closed-form per row, not a per-point join.
    *
    * Copy counts multiply 2k into the running mass, so the products can
    * exceed Long near (corpus mass) × k ≈ 2^63; partitions switch to
    * BigInt arithmetic exactly when `2k·W` would overflow — same
    * values, no silent wrap (the spec pins the BigInt path against the
    * Long path).
    *
    * @return (id, weight, n_copies) for rows with n_copies ≥ 1.
    */
  def systematic(
      rows: DataFrame,
      idCol: String,
      weightCol: String,
      k: Int,
      partitions: Int = 0
  ): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val spark = rows.sparkSession
    import spark.implicits._
    val p = if (partitions > 0) partitions else spark.sparkContext.defaultParallelism
    val base = rows
      .select(col(idCol).cast("long").as("id"),
        md5(col(idCol).cast("string")).as("h"),
        col(weightCol).cast("long").as("w"))
      .repartitionByRange(p, col("h"), col("id"))
      .sortWithinPartitions(col("h"), col("id"))
      .as[(Long, String, Long)]
      .localCheckpoint()

    // Totals pass: per-partition mass + min weight. A negative weight
    // breaks interval monotonicity — fail loudly, never select wrong.
    val stats = base.rdd
      .mapPartitionsWithIndex { (pid, it) =>
        var sum = 0L
        var min = Long.MaxValue
        it.foreach { r => sum += r._3; if (r._3 < min) min = r._3 }
        Iterator.single((pid, sum, min))
      }
      .collect().sortBy(_._1)
    val minW = stats.map(_._3).foldLeft(Long.MaxValue)(math.min)
    require(minW == Long.MaxValue || minW >= 0, s"negative weight $minW in $weightCol")
    val offsets = stats.map(_._2).scanLeft(0L)(_ + _)
    val totalW = offsets.last
    require(totalW > 0, "total weight is zero — nothing to sample")

    // Emit pass: n_copies = #{i < k : 2k·cumBefore ≤ (2i+1)·W < 2k·cumAfter}
    //          = idx(2k·cumAfter) − idx(2k·cumBefore),
    // idx(a) = floor((a + W − 1) / (2W)) — the count of selection points
    // strictly below mass a/2k, naturally capped at k because cum ≤ W.
    // Long-path overflow guard covers the FULL expression, not just the
    // product: idx's numerator reaches 2k·W + W − 1 = (2k+1)·W − 1, so
    // the switch fires at W > Long.Max/(2k+1) — a plain /(2k) guard
    // leaves a band where `a + W − 1` wraps negative (review r10).
    val useBig = totalW > Long.MaxValue / (2L * k + 1)
    val selected = base.rdd.mapPartitionsWithIndex { (pid, it) =>
      var cum = offsets(pid)
      if (useBig) {
        val w2 = BigInt(totalW) * 2
        val kk = BigInt(2L * k)
        def idx(a: BigInt): Long = ((a + totalW - 1) / w2).toLong
        it.flatMap { case (id, _, w) =>
          val before = cum; cum += w
          val n = idx(kk * cum) - idx(kk * before)
          if (n > 0) Iterator.single((id, w, n)) else Iterator.empty
        }
      } else {
        val w2 = 2L * totalW
        val kk = 2L * k
        def idx(a: Long): Long = (a + totalW - 1) / w2
        it.flatMap { case (id, _, w) =>
          val before = cum; cum += w
          val n = idx(kk * cum) - idx(kk * before)
          if (n > 0) Iterator.single((id, w, n)) else Iterator.empty
        }
      }
    }
    spark.createDataFrame(selected).toDF("id", "weight", "n_copies")
  }
}
