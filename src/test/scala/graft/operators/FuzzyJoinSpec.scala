package graft.operators

import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Differential tests for the segment-pigeonhole fuzzy join: the banded
  * formulation must equal the naive cartesian levenshtein join — which is
  * exactly the plan we refuse to run at scale, making it perfect ground
  * truth at test size. Randomized strings over a 3-letter alphabet keep
  * accidental near-pairs COMMON, so completeness (no false negatives) is
  * genuinely exercised, not just on planted pairs.
  */
class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def randomStrings(seed: Long, n: Int, maxLen: Int): Seq[(Long, String)] = {
    val g = for {
      len <- Gen.chooseNum(0, maxLen)
      cs <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c'))
    } yield cs.mkString
    (1 to n).map(i =>
      (i.toLong, g.apply(Gen.Parameters.default, Seed(seed * 7919 + i)).getOrElse("a")))
  }

  private def naive(l: Seq[(Long, String)], r: Seq[(Long, String)], k: Int): Set[(Long, Long, Int)] = {
    def ed(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1)(i => Array.tabulate(b.length + 1)(j => i.max(j)))
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    for {
      (lid, ls) <- l.toSet[(Long, String)]
      (rid, rs) <- r
      dist = ed(ls, rs)
      if dist <= k
    } yield (lid, rid, dist)
  }

  private def run(l: Seq[(Long, String)], r: Seq[(Long, String)], k: Int): Set[(Long, Long, Int)] =
    FuzzyJoin.join(
      l.toDF("lid", "ls"), "lid", "ls",
      r.toDF("rid", "rs"), "rid", "rs", k)
      .collect().map(row => (row.getLong(0), row.getLong(1), row.getInt(2))).toSet

  test("equals the naive cartesian levenshtein join on random short strings") {
    // short strings + tiny alphabet: dense near-pair structure, and the
    // short-string stratum (|t| <= k) occurs naturally
    for (seed <- 1L to 4L; k <- Seq(1, 2)) {
      val l = randomStrings(seed, 60, 8)
      val r = randomStrings(seed + 100, 40, 8)
      assert(run(l, r, k) == naive(l, r, k), s"seed=$seed k=$k")
    }
  }

  test("equals the naive join on longer strings where segments do the work") {
    val g = for (cs <- Gen.listOfN(24, Gen.oneOf('a', 'b', 'c', 'd'))) yield cs.mkString
    def strs(seed: Long, n: Int) = (1 to n).map(i =>
      (i.toLong, g.apply(Gen.Parameters.default, Seed(seed * 104729 + i)).get))
    // plant exact edits of left strings into the right side so matches exist
    val base = strs(5L, 50)
    val edited = base.collect {
      case (id, s) if id % 3 == 0 => (id + 1000L, s.updated((id % s.length).toInt, 'z'))
      case (id, s) if id % 3 == 1 => (id + 2000L, s.patch((id % s.length).toInt, Nil, 1))
    }
    val right = strs(900L, 30) ++ edited
    for (k <- Seq(1, 2))
      assert(run(base, right, k) == naive(base, right, k), s"k=$k")
  }

  test("k=0 degenerates to exact string equality") {
    val l = Seq((1L, "abc"), (2L, "abd"), (3L, ""))
    val r = Seq((10L, "abc"), (11L, ""), (12L, "xyz"))
    assert(run(l, r, 0) == Set((1L, 10L, 0), (3L, 11L, 0)))
  }

  test("null strings never match") {
    val l = Seq((1L, "ab"), (2L, null)).toDF("lid", "ls")
    val r = Seq((10L, null), (11L, "ab")).toDF("rid", "rs")
    val got = FuzzyJoin.join(l, "lid", "ls", r, "rid", "rs", 2)
      .collect().map(row => (row.getLong(0), row.getLong(1))).toSet
    assert(got == Set((1L, 11L)))
  }

  test("probe against a prebuilt index equals join restricted to the batch") {
    val corpus = randomStrings(11L, 80, 10)
    val batch = randomStrings(12L, 25, 10)
    val index = FuzzyJoin.buildIndex(corpus.toDF("rid", "rs"), "rid", "rs", 2)
    val probed = FuzzyJoin.probe(batch.toDF("lid", "ls"), "lid", "ls", index)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(probed == naive(batch, corpus, 2))
  }

  test("plan gate: no cartesian product at any k") {
    val l = randomStrings(1L, 30, 20).toDF("lid", "ls")
    val r = randomStrings(2L, 30, 20).toDF("rid", "rs")
    val plan = FuzzyJoin.join(l, "lid", "ls", r, "rid", "rs", 2)
      .queryExecution.executedPlan
    val cartesians = plan.collect { case c: CartesianProductExec => c }
    assert(cartesians.isEmpty, s"fuzzy join must never plan a cartesian:\n$plan")
  }
}
