package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CharNgramLangIdSpec extends SparkSpec {
  import spark.implicits._

  private val labeled = Seq(
    ("en", "the good people know that they have been with the world and more"),
    ("en", "they want the good world and know they have been with this and that"),
    ("de", "der und nicht sich auch wenn aber nach wird beim doch jetzt der und"),
    ("de", "wenn aber der und nicht auch sich nach jetzt doch beim wird der und"),
    ("zh", "一丁丂七丄丅一丁丂七" * 6),
    ("zh", "丅丄七丂丁一丅丄七丂" * 6)
  ).toDF("lang", "text")

  test("train: sorted langs, union vocab, bit-quantized weights, exact ilog2") {
    val m = CharNgramLangId.train(labeled, "text", "lang", profileSize = 16)
    assert(m.langs == Seq("de", "en", "zh")) // lexicographic
    assert(m.vocab.sorted == m.vocab)        // sorted union vocab
    assert(m.vocab.distinct == m.vocab)
    assert(m.weights.length == 3 && m.weights.forall(_.length == m.vocab.length))
    // a language's hottest gram outweighs its smoothing default
    m.langs.indices.foreach { li =>
      assert(m.weights(li).max > m.defaults(li), m.langs(li))
    }
    // ilog2 is the exact bit length - 1
    assert(CharNgramLangId.ilog2(1) == 0)
    assert(CharNgramLangId.ilog2(2) == 1)
    assert(CharNgramLangId.ilog2(3) == 1)
    assert(CharNgramLangId.ilog2(1L << 40) == 40)
    assert(CharNgramLangId.ilog2((1L << 40) - 1) == 39)
  }

  test("predict recovers the training language, including CJK without spaces") {
    val m = CharNgramLangId.train(labeled, "text", "lang")
    val out = labeled.select(col("lang"), m.predict(col("text")).as("pred"))
      .collect()
    assert(out.forall(r => r.getString(0) == r.getString(1)),
      out.map(r => s"${r.getString(0)}->${r.getString(1)}").mkString(", "))
  }

  test("scoring kernel: OOV grams add per-language defaults; codegen path runs") {
    val m = CharNgramLangId.train(labeled, "text", "lang")
    // a text of grams the corpus never saw: every gram takes the default,
    // so score(lang) = nGrams * default(lang) exactly
    val oov = "zzqqzz"
    val scores = Seq(oov).toDF("text")
      .select(m.scores(col("text")).as("s"))
      .head().getSeq[Long](0)
    val nGrams = oov.length - 1
    m.langs.indices.foreach { li =>
      assert(scores(li) == nGrams * m.defaults(li), m.langs(li))
    }
    // sub-bigram input scores zero everywhere and predicts the first lang
    val tiny = Seq("x").toDF("text")
      .select(m.scores(col("text")).as("s"), m.predict(col("text")).as("p"))
      .head()
    assert(tiny.getSeq[Long](0).forall(_ == 0L))
    assert(tiny.getString(1) == m.langs.head)
  }

  test("bigrams kernel equals the substr framing (ASCII, CJK, supplementary, empty, null)") {
    // the kernel exists because the transform+substr framing is O(len²)
    // (substr re-counts code points from byte 0 per gram); both must
    // produce the identical code-point frame
    val texts = Seq((1L, "hello world"), (2L, "一丁丂七丄"), (3L, "a𝕏b𝕐c"),
      (4L, "é"), (5L, ""), (6L, "xy"), (7L, null))
    val d = texts.toDF("id", "text")
    def collect(c: org.apache.spark.sql.Column) =
      d.select($"id", c.as("g")).orderBy("id")
        .as[(Long, Seq[String])].collect().toSeq
    val kernel = collect(CharNgramLangId.bigrams($"text"))
    val naive = collect(
      when(length($"text") >= 2,
        transform(sequence(lit(1), length($"text") - 1),
          i => $"text".substr(i, lit(2))))
        .otherwise(array().cast("array<string>")))
    assert(kernel == naive)
    assert(kernel.find(_._1 == 3L).get._2 == Seq("a𝕏", "𝕏b", "b𝕐", "𝕐c"))
    assert(kernel.find(_._1 == 7L).get._2 == Seq.empty)
  }

  test("train refuses a gram count that would overflow the integer-exact weights") {
    // 200k docs × 50 "ab" repeats: the "ab" bigram counts 10,000,000
    // > 2^23 - 1, where (c+1)·2^40 leaves Long — silent wrap would hand
    // the hottest gram the MINIMUM weight; the guard must refuse loudly.
    // (Short docs, many rows: the bigram kernel's substr is O(len) per
    // gram, so one huge doc would cost O(len²).)
    val doc = "ab" * 50
    val d = spark.range(200000).select(lit(doc).as("text"), lit("xx").as("lang"))
    val e = intercept[IllegalArgumentException] {
      CharNgramLangId.train(d, "text", "lang")
    }
    assert(e.getMessage.contains("overflow"), e.getMessage)
  }

  test("kernel grams by code points: CJK bigrams match SQL substr framing") {
    val m = CharNgramLangId.train(labeled, "text", "lang")
    // score a zh doc via the kernel and via an explicit substr explode +
    // weight lookup — the two framings must agree exactly
    val doc = "一丁丂七丄"
    val kernel = Seq(doc).toDF("text")
      .select(m.scores(col("text")).as("s")).head().getSeq[Long](0)
    val zhIdx = m.langs.indexOf("zh")
    val wMap = m.vocab.zip(m.weights(zhIdx)).toMap
    val expected = (1 until doc.length)
      .map(i => wMap.getOrElse(doc.substring(i - 1, i + 1), m.defaults(zhIdx)))
      .sum
    assert(kernel(zhIdx) == expected)
  }
}
