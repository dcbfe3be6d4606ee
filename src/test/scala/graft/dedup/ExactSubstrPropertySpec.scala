package graft.dedup

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Randomized differential oracle for [[ExactSubstr]] (exact mode): a
  * plain-Scala naive reference — mark every position whose width-w
  * window STRING occurs >= minCount times corpus-wide, merge marked
  * positions closer than w into maximal spans, cut the spans — must
  * agree with the distributed hash-keyed pipeline FRAME-FOR-FRAME on
  * small-alphabet corpora (alphabet size 2-3 forces dense organic
  * duplication far nastier than any hand fixture: self-overlapping
  * runs, cross-doc and intra-doc repeats, spans touching both ends).
  * The only semantic gap is 64-bit window-hash collisions, negligible
  * at a few hundred windows.
  *
  * Spark-plan cases are expensive, so a handful of seeded corpora run
  * (the PropertySpec discipline), each covering many documents.
  */
class ExactSubstrPropertySpec extends SparkSpec {
  import spark.implicits._

  private val W = 6

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val corpusGen: Gen[Seq[String]] = for {
    nDocs <- Gen.choose(3, 10)
    alpha <- Gen.oneOf("ab", "abc")
    docs <- Gen.listOfN(nDocs, for {
      len <- Gen.choose(0, 60)
      cs <- Gen.listOfN(len, Gen.oneOf(alpha.toSeq))
    } yield cs.mkString)
  } yield docs

  /** The reference: per-doc maximal duplicated spans as (doc, s, e),
    * 1-based char positions, end exclusive — definitionally, by window
    * STRINGS.
    */
  private def naiveSpans(docs: Seq[String], minCount: Int): Seq[(Long, Int, Int)] = {
    val counts = scala.collection.mutable.Map.empty[String, Int]
    for (d <- docs; p <- 0 to d.length - W)
      counts.updateWith(d.substring(p, p + W))(c => Some(c.getOrElse(0) + 1))
    docs.zipWithIndex.flatMap { case (d, i) =>
      val marked = (0 to d.length - W)
        .filter(p => counts(d.substring(p, p + W)) >= minCount)
      // gap rule: merge when next pos <= prev pos + W, i.e. intervals
      // closer than a full window — replay the engine's lag-based rule
      val spans2 = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      var prevPos = Int.MinValue
      var curStart = -1
      var curEnd = -1
      for (p <- marked) {
        if (curStart < 0 || p > prevPos + W) {
          if (curStart >= 0) spans2 += ((curStart, curEnd))
          curStart = p
        }
        curEnd = p + W
        prevPos = p
      }
      if (curStart >= 0) spans2 += ((curStart, curEnd))
      // 0-based [s, e) → 1-based [s+1, e+1): both bounds shift
      spans2.map { case (s, e) => (i.toLong, s + 1, e + 1) }.toSeq
    }
  }

  private def naiveScrub(doc: String, spans: Seq[(Int, Int)]): String = {
    val keep = Array.fill(doc.length)(true)
    for ((s, e) <- spans; p <- (s - 1) until (e - 1)) keep(p) = false
    doc.zipWithIndex.collect { case (c, p) if keep(p) => c }.mkString
  }

  test("duplicateSpans and scrub equal the naive string reference on random corpora") {
    for ((docs, ci) <- samples(corpusGen, 6).zipWithIndex) {
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = ExactSubstr.duplicateSpans(df, "doc_id", "text", width = W)
        .as[(Long, Int, Int)].collect().toSeq.sorted
      val want = naiveSpans(docs, minCount = 2).sorted
      assert(got == want,
        s"corpus #$ci spans diverged\n docs=$docs\n got=$got\n want=$want")

      val gotClean = ExactSubstr.scrub(df, "doc_id", "text", width = W)
        .as[(Long, String)].collect().toMap
      val wantBySpan = want.groupBy(_._1)
      docs.zipWithIndex.foreach { case (d, i) =>
        val exp = naiveScrub(d,
          wantBySpan.getOrElse(i.toLong, Seq.empty).map(t => (t._2, t._3)))
        assert(gotClean(i.toLong) == exp,
          s"corpus #$ci doc $i scrub diverged: '${gotClean(i.toLong)}' vs '$exp'")
      }
    }
  }
}
