package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trainable character-n-gram language identification — the
  * fastText/Cavnar-Trenkle-style replacement for
  * [[TextAnalysis.langId]]'s four-language marker-word heuristic
  * (r11/r12 verdicts' ordered gap): per-language character-BIGRAM
  * profiles learned from a labeled corpus, scored by a codegen kernel
  * ([[graft.functions.NgramLangScores]]) in ONE code-point pass per row.
  * Character n-grams (not words) are what covers CJK — no whitespace
  * tokenization is assumed anywhere.
  *
  * The model is a quantized naive-Bayes / linear bag-of-bigrams scorer,
  * engineered for EXACT cross-engine recompute (the oracle discipline):
  *
  *  - profile: each language's top-`profileSize` bigrams by occurrence
  *    count, tie-broken (count desc, gram asc) — the Cavnar-Trenkle
  *    ranked profile; the model vocabulary is the union of profiles.
  *  - weight(g, lang) = ilog2(max((c+1) * 2^40 / (N_lang + V), 1)) —
  *    an integer-bit quantization of log2((c+1)/(N_lang+V)) + 40 (the
  *    add-one-smoothed log probability in bits). `ilog2` is the exact
  *    floor log2 of a positive integer (bit length - 1), which DuckDB
  *    recomputes as `length(bin(x)) - 1`; all arithmetic is 64-bit
  *    integer, so scores are summation-order-independent and a DuckDB
  *    mirror agrees EXACTLY — no float rounding protocol.
  *  - score(doc, lang) = Σ over the doc's bigram OCCURRENCES of
  *    weight(g, lang), out-of-vocabulary grams adding the language's
  *    smoothing default ilog2(max(2^40 / (N_lang + V), 1)).
  *  - predict = argmax score, ties to the first language in sorted
  *    (lexicographic) order.
  *
  * Scale shape: training is one explode (narrow) + one partial+final
  * count aggregation on (lang, gram) — hot grams collapse map-side —
  * plus a per-language top-K window over ≤ |langs|·|grams| counted rows
  * (partitioned by lang, never a global window); the collected model is
  * ≤ profileSize·|langs| rows on the driver. Scoring is scan-side
  * codegen, no join and no shuffle.
  */
object CharNgramLangId {

  /** 2^40 quantization scale: keeps (c+1)·Scale inside Long for corpora
    * up to ~8M bigram occurrences per language, while (N+V) up to the
    * same magnitude still quotients ≥ 1 bit of resolution.
    */
  val Scale: Long = 1L << 40

  final case class Model(
      langs: Seq[String],
      vocab: Seq[String],
      weights: Seq[Seq[Long]],
      defaults: Seq[Long],
      nGramsByLang: Seq[Long],
      vocabGlobal: Long) {

    /** Per-language integer scores, aligned with `langs` (codegen). */
    def scores(text: Column): Column =
      call_function("graft_ngram_lang_scores", text,
        typedlit(vocab), typedlit(weights), typedlit(defaults))

    /** Predicted language: argmax with first-(sorted-)language ties. */
    def predict(text: Column): Column = {
      val sc = scores(text)
      element_at(typedlit(langs),
        array_position(sc, array_max(sc)).cast("int"))
    }
  }

  /** Exact floor(log2(x)) for x ≥ 1 (DuckDB mirror: length(bin(x))-1). */
  def ilog2(x: Long): Long = {
    require(x >= 1, s"ilog2 domain is positive integers, got $x")
    63L - java.lang.Long.numberOfLeadingZeros(x)
  }

  /** The character-bigram array of a text column, by code points, with
    * multiplicity — the frame DuckDB rebuilds with `range` + `substr`,
    * computed by the LINEAR one-pass kernel
    * ([[graft.functions.CharBigramsKernel]]): the equivalent
    * `transform(sequence(…), i -> substr(text, i, 2))` framing re-scans
    * the string per gram (substr counts code points from byte 0), i.e.
    * O(len²) per document — a silent wall on long documents. NULL text
    * keeps the historical empty-array contract.
    */
  def bigrams(text: Column): Column =
    coalesce(call_function("graft_char_bigrams", text),
      array().cast("array<string>"))

  /** Train bigram profiles from a labeled corpus (`textCol`, `langCol`). */
  def train(labeled: DataFrame, textCol: String, langCol: String,
      profileSize: Int = 64): Model = {
    require(profileSize >= 1, s"profileSize must be >= 1, got $profileSize")
    val occ = labeled.select(col(langCol).as("lang"),
      explode(bigrams(col(textCol))).as("gram"))
    val counts = occ.groupBy(col("lang"), col("gram"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint() // totals, vocab size, and profiles all reuse it
    val totals = counts.groupBy(col("lang")).agg(sum(col("c")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val vocabGlobal = counts.select(col("gram")).distinct().count()
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("c").desc, col("gram").asc)
    val profile = counts.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= profileSize)
      .select(col("lang"), col("gram"), col("c"))
      .collect()
    val langs = totals.keys.toSeq.sorted
    val vocab = profile.map(_.getString(1)).distinct.sorted.toSeq
    val vIdx = vocab.zipWithIndex.toMap
    // dense (lang × vocab) counts: grams outside a language's counted set
    // smooth to c = 0. NOTE: a vocab gram a language saw but that fell
    // OUTSIDE its top-K profile also weighs as c = 0 — the profile IS
    // the model (Cavnar-Trenkle), and the oracle mirrors exactly that.
    val cDense = Array.fill(langs.length, vocab.length)(0L)
    // (c+1)·Scale must stay inside Long: c < 2^23 (~8.4M occurrences of
    // ONE gram in one language's training slice). Silent overflow would
    // wrap negative, max(…,1) it to 1, and hand the language's HOTTEST
    // gram the minimum weight — wrong models, no error. Guard loudly;
    // at larger corpora train on a bounded sample (profiles converge
    // orders of magnitude before any gram hits 8M occurrences).
    val cMax = Long.MaxValue / Scale - 1L
    profile.foreach { r =>
      require(r.getLong(2) <= cMax,
        s"gram '${r.getString(1)}' of lang '${r.getString(0)}' counted " +
          s"${r.getLong(2)} > $cMax occurrences — integer-exact weights " +
          "would overflow; train on a bounded sample instead")
      cDense(langs.indexOf(r.getString(0)))(vIdx(r.getString(1))) = r.getLong(2)
    }
    val weights = langs.indices.map { li =>
      val denom = totals(langs(li)) + vocabGlobal
      vocab.indices.map { vi =>
        ilog2(math.max((cDense(li)(vi) + 1L) * Scale / denom, 1L))
      }
    }
    val defaults = langs.map(l => ilog2(math.max(Scale / (totals(l) + vocabGlobal), 1L)))
    Model(langs, vocab, weights, defaults,
      langs.map(totals), vocabGlobal)
  }
}
