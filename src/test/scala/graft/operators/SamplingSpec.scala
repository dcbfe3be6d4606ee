package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private val orders = (1L to 2000L).map(i => (i, s"g${i % 7}")).toDF("id", "grp")

  test("byFraction is deterministic under repartitioning and ~proportional") {
    val a = Sampling.byFraction(orders, "id", 0.3).select("id").collect().map(_.getLong(0)).toSet
    val b = Sampling.byFraction(orders.repartition(13), "id", 0.3)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a == b, "sample must not depend on partitioning")
    assert(math.abs(a.size - 600) < 120, s"got ${a.size} of expected ~600")
    // independent draw under a different salt
    val c = Sampling.byFraction(orders, "id", 0.3, salt = 1L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(c != a)
  }

  test("stratified keeps per-stratum fractions and drops unlisted strata") {
    val s = Sampling.stratified(orders, "grp",
      Map("g0" -> 1.0, "g1" -> 0.5), idCol = "id")
      .groupBy("grp").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(s.keySet == Set("g0", "g1"), "unlisted strata default to fraction 0")
    assert(s("g0") == orders.filter(col("grp") === "g0").count())
    assert(math.abs(s("g1") - 143) < 60, s"~half of g1 expected, got ${s("g1")}")
  }

  test("perGroup matches the windowed bottom-k-by-hash reference") {
    val k = 3
    val got = Sampling.perGroup(orders, Seq("grp"), "id", k)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // independent reference: same priority expression, ranked by window
    val prio = pmod(xxhash64(col("id"), lit(0L)), lit(1000000000L)).cast("double") / 1e9
    val w = Window.partitionBy(col("grp")).orderBy(prio.asc, col("id").asc)
    val ref = orders.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .collect().map(r => (r.getString(1), r.getLong(0))).toSet
    assert(got == ref)
    assert(got.groupBy(_._1).forall(_._2.size == k))
  }

  test("mixture: per-stratum quotas, caps, absent strata, determinism") {
    // strata sizes: g0..g6 have 286 ± 1 rows each
    val targets = Seq(("g1", 0.5), ("g2", 0.05), ("g5", 0.0)).toDF("grp", "weight")
    def run() = Sampling.mixture(orders, "grp", "id", targets, total = 400L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val got = run()
    val byGrp = got.groupBy(_._1).view.mapValues(_.size).toMap
    // g1: floor(0.5·400)=200 ≤ 286 → exactly 200; g2: floor(0.05·400)=20;
    // g5: zero weight → nothing; strata without targets → nothing
    assert(byGrp == Map("g1" -> 200, "g2" -> 20), s"got $byGrp")
    assert(run() == got, "mixture must be deterministic")
    // cap path: a quota above the stratum size returns the whole stratum
    val greedy = Seq(("g3", 1.0)).toDF("grp", "weight")
    val capped = Sampling.mixture(orders, "grp", "id", greedy, total = 10000L)
    val g3Size = orders.filter(col("grp") === "g3").count()
    assert(capped.count() == g3Size)
  }

  test("mixtureEpochs: exact multiplicity law on crafted strata") {
    // A: 4 rows, quota 10 → base 2, rem 2: two rows at 3 copies, two at
    // 2. B: 5 rows, quota 3 → three rows at 1. C: weight 0 → absent.
    val rows = ((1L to 4L).map(i => (i, "A")) ++ (11L to 15L).map(i => (i, "B")) ++
      (21L to 23L).map(i => (i, "C"))).toDF("id", "grp")
    val targets = Seq(("A", 0.10), ("B", 0.03), ("C", 0.0)).toDF("grp", "weight")
    val out = Sampling.mixtureEpochs(rows, "grp", "id", targets, total = 100L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val a = out.filter(_._1 == "A").map(_._3).sorted.toSeq
    val b = out.filter(_._1 == "B").map(_._3).sorted.toSeq
    assert(a == Seq(2L, 2L, 3L, 3L), s"got $a")
    assert(b == Seq(1L, 1L, 1L), s"got $b")
    assert(!out.exists(_._1 == "C"))
  }

  test("mixtureEpochs: undersampling path picks the same rows as mixture") {
    val targets = Seq(("g1", 0.5), ("g2", 0.05)).toDF("grp", "weight")
    val plain = Sampling.mixture(orders, "grp", "id", targets, total = 400L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val epochs = Sampling.mixtureEpochs(orders, "grp", "id", targets, total = 400L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(epochs.forall(_._3 == 1L), "quota below stratum size must not repeat rows")
    assert(epochs.map(t => (t._1, t._2)).toSet == plain)
  }

  test("mixtureEpochs: extra copies go to the best-priority rows, invariant to partitioning") {
    val targets = Seq(("g4", 2.0)).toDF("grp", "weight")
    def run(df: org.apache.spark.sql.DataFrame) =
      Sampling.mixtureEpochs(df, "grp", "id", targets, total = 400L)
    val got = run(orders).collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(got == run(orders.repartition(13)).collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSet)
    // g4 has 286 rows, quota 800 → base 2, rem 228: the 228 extra copies
    // must land on exactly the lowest-hash-priority ids (salt 0).
    val n = orders.filter(col("grp") === "g4").count()
    assert(got.size == n && got.toSeq.map(_._2).sum == 800L)
    val expectExtra = orders.filter(col("grp") === "g4")
      .select(col("id"), pmod(xxhash64(col("id"), lit(0L)), lit(1000000000L)).as("h"))
      .orderBy(col("h"), col("id")).limit((800 % n).toInt)
      .collect().map(_.getLong(0)).toSet
    assert(got.filter(_._2 == 3L).map(_._1) == expectExtra)
  }

  private val weighted = (1L to 500L).map(i => (i, 1L + (i * 7919L) % 97L))
    .toDF("id", "w")

  test("systematic: Σ n_copies = k exactly, counts bracket the expectation") {
    for (k <- Seq(1, 17, 100, 499, 1200)) {
      val res = Sampling.systematic(weighted, "id", "w", k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(res.map(_._3).sum == k, s"k=$k total copies")
      // Each row's count is floor-or-ceil of k·w/W (systematic sampling's
      // minimum-variance law).
      val totalW = weighted.agg(sum(col("w"))).head.getLong(0)
      res.foreach { case (id, w, n) =>
        val exp = k.toDouble * w / totalW
        assert(n >= math.floor(exp) - 1e-9 && n <= math.ceil(exp) + 1e-9,
          s"k=$k id=$id copies $n vs expectation $exp")
      }
    }
  }

  test("systematic is invariant to input partitioning and to uniform weight scaling") {
    def run(df: org.apache.spark.sql.DataFrame, parts: Int) =
      Sampling.systematic(df, "id", "w", k = 73, partitions = parts)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val a = run(weighted, 4)
    assert(run(weighted.repartition(11), 4) == a, "partitioning changed the sample")
    assert(run(weighted, 9) == a, "prefix-sum partition count changed the sample")
    val scaled = weighted.select(col("id"), (col("w") * 1000L).as("w"))
    assert(run(scaled, 4).map { case (id, n) => (id, n) } == a,
      "uniform weight scaling changed the sample")
  }

  test("systematic: BigInt branch agrees with the Long branch") {
    // Same weights blown up so 2k·W overflows Long (W ≈ 2.4e17, k = 400:
    // 2kW ≈ 2e20 > 2^63) while W itself still fits — selected multiset
    // must be identical to the small-weight run because the decision
    // depends only on w/W ratios.
    val big = weighted.select(col("id"), (col("w") * 10000000000000L).as("w"))
    def counts(df: org.apache.spark.sql.DataFrame, k: Int = 400) =
      Sampling.systematic(df, "id", "w", k)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(counts(big) == counts(weighted))

    // The overflow BAND the first guard missed: W just under
    // Long.Max/(2k) keeps the product 2k·cum in range, but idx()'s
    // `+ W − 1` addend overflows — the guard must switch to BigInt at
    // W > Long.Max/(2k+1). Scale so totalW lands inside
    // (Long.Max/201, Long.Max/200] for k=100, then the copy counts must
    // still match the small-weight run (pure w/W ratios).
    val totalSmall = weighted.agg(sum(col("w"))).head.getLong(0)
    val c = Long.MaxValue / 200 / totalSmall
    val band = weighted.select(col("id"), (col("w") * c).as("w"))
    val bandW = band.agg(sum(col("w"))).head.getLong(0)
    assert(bandW > Long.MaxValue / 201 && bandW <= Long.MaxValue / 200,
      s"fixture drifted out of the overflow band: $bandW")
    assert(counts(band, k = 100) == counts(weighted, k = 100))
  }

  test("systematicPerStratum: per-stratum totals exact, absent stratum fails loudly") {
    val rows = (1L to 300L).map(i => (s"g${i % 3}", i, 1L + i % 13)).toDF("g", "id", "w")
    val out = Sampling.systematicPerStratum(rows, "g", "id", "w",
      Map("g0" -> 11, "g1" -> 7))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    val byStratum = out.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    assert(byStratum == Map("g0" -> 11L, "g1" -> 7L))
    // selection within a stratum ignores the other strata entirely
    val solo = Sampling.systematic(rows.filter(col("g") === "g0"), "id", "w", 11)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(out.filter(_._1 == "g0").map(t => (t._2, t._3)).toSet == solo)
    assertThrows[IllegalArgumentException](
      Sampling.systematicPerStratum(rows, "g", "id", "w", Map("nope" -> 3)).collect())
  }

  test("systematic rejects negative weights and zero total mass") {
    val neg = Seq((1L, 5L), (2L, -1L)).toDF("id", "w")
    assertThrows[IllegalArgumentException](Sampling.systematic(neg, "id", "w", 3).collect())
    val zero = Seq((1L, 0L), (2L, 0L)).toDF("id", "w")
    assertThrows[IllegalArgumentException](Sampling.systematic(zero, "id", "w", 3).collect())
  }
}
