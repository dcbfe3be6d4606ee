package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.core.FileFormat

/** Property tests promised in SURVEY.md §5: T1 normalization idempotence,
  * T10 threshold boundary, D1 distinct containment. Pure-function
  * properties fuzz hundreds of seeded ScalaCheck samples; Spark-plan
  * properties use a handful (one Spark job per case).
  */
class PropertySpec extends SparkSpec {

  /** Deterministic ScalaCheck sampling (no scalatest bridge in deps). */
  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("T1 normalizeName is idempotent and canonical for arbitrary strings") {
    for (s <- samples(Gen.asciiPrintableStr, 300)) {
      val once = Stages.normalizeName(s)
      assert(Stages.normalizeName(once) == once, s"not idempotent for ${s.inspect}")
      assert(once.matches("[a-z0-9_]*"))
      assert(!once.startsWith("_") && !once.endsWith("_"))
      assert(!once.contains("__"))
    }
  }

  test("T1 normalizeName golden: reference test case (test_transformer.py:45-57)") {
    assert(Stages.normalizeName("Unit Price ($)") == "unit_price")
    assert(Stages.normalizeName("  Order  ID  ") == "order_id")
  }

  test("S4 format dispatch: suffix decides, case-insensitively, else None") {
    for (base <- samples(Gen.alphaNumStr, 100)) {
      assert(FileFormat.fromPath(s"$base.CSV").contains(FileFormat.Csv))
      assert(FileFormat.fromPath(s"$base.JsOnL").contains(FileFormat.Json))
      assert(FileFormat.fromPath(s"$base.Parquet").contains(FileFormat.Parquet))
      assert(FileFormat.fromPath(s"$base.txt").isEmpty)
    }
  }

  test("T10 boundary: parse rate exactly at threshold does not cast; above does") {
    import spark.implicits._
    // 4/5 = 0.8 exactly → stays string under the strict > 0.8 rule.
    val atThreshold = Seq("1", "2", "3", "4", "x").toDF("v")
    val at = Stages.castTypes(atThreshold, ColumnStats.collect(atThreshold))
    assert(at.schema("v").dataType.typeName == "string")
    // 5/6 ≈ 0.83 → casts to double, unparseable → null.
    val above = Seq("1", "2", "3", "4", "5", "x").toDF("v")
    val ab = Stages.castTypes(above, ColumnStats.collect(above))
    assert(ab.schema("v").dataType.typeName == "double")
    assert(ab.filter(col("v").isNull).count() == 1)
  }

  test("D1 distinct output is a subset of input with no duplicates") {
    import spark.implicits._
    for (xs <- samples(Gen.listOfN(30, Gen.chooseNum(0, 5)), 5) if xs.nonEmpty) {
      val out = Stages.deduplicate(xs.toDF("v")).as[Int].collect().toSeq
      assert(out.distinct.sorted == out.sorted)
      assert(out.toSet == xs.toSet)
    }
  }

  test("fused lang-scores kernel == composed tokens_in_set on fuzzed strings") {
    import spark.implicits._
    import graft.text.TextAnalysis
    // marker words, whitespace variety, casing noise, unicode neighbors
    val word = Gen.oneOf(
      TextAnalysis.langMarkers.flatMap(_._2) ++
        Seq("THE", "Der", "zzz", "), über", "the.", "él", " the", ""))
    val ws = Gen.oneOf(" ", "  ", "\t", "\n", "\r\n", "")
    val text = for {
      n <- Gen.chooseNum(0, 12)
      parts <- Gen.listOfN(n, Gen.zip(word, ws))
    } yield parts.map { case (w, sep) => w + sep }.mkString
    val rows = samples(text, 120).toDF("text")
    val fused = rows.select(TextAnalysis.langScores(col("text")).as("sc"))
      .collect().map(_.getSeq[Int](0)).toSeq
    val composed = rows.select(array(TextAnalysis.langMarkers.map { case (_, m) =>
      TextAnalysis.tokensInSet(TextAnalysis.tokens(lower(col("text"))), m)
    }: _*).as("sc")).collect().map(_.getSeq[Int](0)).toSeq
    assert(fused == composed)
  }

  private implicit class StrInspect(s: String) {
    def inspect: String = s.map(c => if (c.isControl) f"\\u${c.toInt}%04x" else c.toString).mkString
  }
}
