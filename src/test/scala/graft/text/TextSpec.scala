package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String) = Seq(text).toDF("text")

  test("native tokenizer matches split('\\s+') exactly, including edge cases") {
    val cases = Seq(
      "a b c", "  leading", "trailing  ", "a\tb\nc\r\nd", "", "   ",
      "multi   space", "héllo wörld nbsp-is-not-ws", "one",
      "mixed \t \n runs", "punct. stays! attached?")
    val rows = cases.toDF("text").select(
      TextAnalysis.tokens(col("text")).as("native"),
      split(col("text"), "\\s+").as("regex"))
      .collect()
    rows.zip(cases).foreach { case (r, c) =>
      assert(r.getSeq[String](0) == r.getSeq[String](1), s"input: [$c]")
    }
    // fuzz: random whitespace-riddled strings
    val rng = new scala.util.Random(11)
    val fuzz = (1 to 200).map { _ =>
      (0 until rng.nextInt(25)).map(_ => rng.nextInt(6) match {
        case 0 => " "
        case 1 => "\t"
        case 2 => "\n"
        case _ => "w" * (1 + rng.nextInt(3))
      }).mkString
    }
    val bad = fuzz.toDF("text").select(
      TextAnalysis.tokens(col("text")).as("native"),
      split(col("text"), "\\s+").as("regex"))
      .collect()
      .zip(fuzz)
      .filter { case (r, _) => r.getSeq[String](0) != r.getSeq[String](1) }
    assert(bad.isEmpty, bad.take(3).map(b => "[" + b._2 + "]").mkString("; "))
  }

  test("token counts: whitespace and BPE-ish") {
    val r = one("Hello, world 123 foo-bar")
      .select(
        TextAnalysis.tokenCount(col("text")).as("ws"),
        TextAnalysis.bpeishTokenCount(col("text")).as("bpe"))
      .head()
    assert(r.getInt(0) == 4)
    // Hello , world 123 foo - bar → 7 BPE-ish pieces
    assert(r.getInt(1) == 7)
  }

  test("quality score components and range") {
    val good = ("the quick brown fox jumps over the lazy dog " * 3).trim
    val bad = "!!! ??? ###"
    val rs = Seq(good, bad).toDF("text")
      .select(col("text"), TextAnalysis.qualityScore(col("text")).as("q"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rs(good) == 1.0)
    assert(rs(bad) < 0.5)
  }

  test("language ID picks the dominant marker set; und when none") {
    val rs = Seq(
      "the cat and the dog is here",
      "der hund und die katze mit das",
      "le chat et la maison les arbres",
      "zzz qqq www")
      .toDF("text")
      .select(TextAnalysis.langId(col("text")).as("lang"))
      .collect().map(_.getString(0)).toSeq
    assert(rs == Seq("en", "de", "fr", "und"))
  }

  test("fused lang-scores kernel matches the composed tokens_in_set formulation") {
    // edge shapes: mixed case, tab/newline runs, leading/trailing ws,
    // empty, multi-byte UTF-8 neighbors, marker-as-substring (no hit)
    val rows = Seq(
      "THE cat AND the DOG is WITH", "\tder\n\ndie  und\r\ndas mit ",
      "le la et les des el los las una con", "", "   ", "über the straße und",
      "theater andes ofle", "the the the the", "el los") // NBSP is NOT \s
      .toDF("text")
    val fused = rows.select(TextAnalysis.langScores(col("text")).as("sc"))
      .collect().map(_.getSeq[Int](0))
    val composed = rows.select(array(TextAnalysis.langMarkers.map { case (_, m) =>
      TextAnalysis.tokensInSet(TextAnalysis.tokens(lower(col("text"))), m)
    }: _*).as("sc")).collect().map(_.getSeq[Int](0))
    assert(fused.toSeq == composed.toSeq)
  }

  test("lang-scores kernel probes over-scratch tokens via the Unicode fallback (ADVICE r4)") {
    // 22 KELVIN SIGNs (U+212A, 3 UTF-8 bytes each = 66 bytes > the
    // 64-byte scratch) lowercase to 22 ASCII 'k's — a byte-SHRINKING
    // mapping. Pre-fix the kernel skipped over-scratch tokens without
    // probing, diverging from tokensInSet(tokens(lower(text))).
    import org.apache.spark.unsafe.types.UTF8String
    val marker = "k" * 22
    val mask = graft.functions.MarkerCounter.buildMask(Seq(Seq(marker)))
    val text = ("K" * 22) + " " + marker + " other"
    val counts = graft.functions.MarkerCounter
      .score(UTF8String.fromString(text), mask, 1)
    assert(counts.getInt(0) == 2) // shrunk Kelvin token AND the plain one
    // a >64-byte token that is NOT a marker still counts nothing
    val miss = graft.functions.MarkerCounter
      .score(UTF8String.fromString("x" * 70), mask, 1)
    assert(miss.getInt(0) == 0)
  }

  test("PII redaction replaces all occurrences of each kind") {
    val r = one("mail a@b.co and c.d+x@e-f.org, call +44 20 7946 0958, card 4111 1111 1111 1111 end")
      .select(TextAnalysis.redactPii(col("text")).as("t")).head().getString(0)
    assert(!r.contains("@"), r)
    assert(r.contains("<EMAIL> and <EMAIL>"), r)
    assert(r.contains("<PHONE>"), r)
    assert(r.contains("<CARD>"), r) // card pattern runs before phone by contract
    assert(!r.matches(".*[0-9]{4} [0-9]{4}.*"), r)
  }

  test("repetition: uniform text scores low, repeated bigram scores high") {
    val rs = Seq("a b c d e f g h", "spam spam spam spam spam")
      .toDF("text")
      .select(col("text"), TextAnalysis.maxBigramFraction(col("text")).as("r"))
      .collect().map(r => r.getString(0).take(4) -> r.getDouble(1)).toMap
    assert(rs("a b ") < 0.2)
    assert(rs("spam") == 1.0)
  }

  test("fingerprint: equal text equal hash, order-sensitive") {
    val r = Seq(("a b c", "a b c", "c b a")).toDF("x", "y", "z")
      .select(
        TextAnalysis.fingerprint(col("x")).as("fx"),
        TextAnalysis.fingerprint(col("y")).as("fy"),
        TextAnalysis.fingerprint(col("z")).as("fz"))
      .head()
    assert(r.getLong(0) == r.getLong(1))
    assert(r.getLong(0) != r.getLong(2))
  }
}
