package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis columns for training-data curation: language ID, quality
  * scoring, token counting, document fingerprinting.
  *
  * Everything is a per-row Column expression (split/regexp/HOFs) — narrow,
  * codegen'd, no shuffle, no UDFs — so these compose freely with the
  * transform pipeline and scale linearly with the scan.
  */
object TextAnalysis {

  /** Whitespace tokens — native byte-scan expression with exact
    * `split(text, "\\s+")` semantics ([[graft.functions.WhitespaceTokens]],
    * differential-tested); tokenization fronts every column below, so it
    * skips the regex engine.
    */
  def tokens(text: Column): Column = call_function("graft_tokens", text)

  // ── Token counting ──────────────────────────────────────────────────────

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword proxy: runs of letters, runs of digits, or single
    * non-alphanumeric glyphs — the standard pre-tokenizer shape. A cheap,
    * deterministic stand-in for a real BPE vocab count.
    */
  val bpeTokenPattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"

  def bpeishTokenCount(text: Column): Column = regexp_count(text, lit(bpeTokenPattern))

  /** REAL merge-table BPE subword tokens (r8): the vocab-driven greedy
    * merge algorithm as a native codegen expression
    * ([[graft.functions.BpeTokens]]) over a rank-ordered merge table.
    * This is the unit real pipelines budget in — `bpeTokenCount` drives
    * BudgetSelect/SequencePacker cost columns unchanged (any long column
    * is a cost).
    */
  def bpeTokens(text: Column, merges: Seq[String]): Column =
    call_function("graft_bpe_tokens", text, typedlit(merges))

  def bpeTokenCount(text: Column, merges: Seq[String]): Column =
    size(bpeTokens(text, merges))

  // ── Quality scoring ─────────────────────────────────────────────────────

  /** English-ish stopwords present in general text; ratio of them is the
    * classic fluency proxy (Gopher/C4-style quality filters).
    */
  val stopwords: Seq[String] =
    Seq("the", "a", "an", "and", "of", "to", "in", "is", "it", "that", "for", "on", "with", "as")

  /** Count of tokens belonging to a fixed word set — native codegen
    * expression ([[graft.functions.TokensInSet]]); the HOF formulation
    * `size(filter(toks, isInCollection(set)))` is CodegenFallback and
    * re-evaluates the token split per call site.
    */
  def tokensInSet(toks: Column, words: Seq[String]): Column =
    call_function("graft_tokens_in_set", toks, typedlit(words))

  def stopwordCount(text: Column): Column =
    tokensInSet(tokens(lower(text)), stopwords)

  /** Fraction of characters that are punctuation. */
  def punctRatio(text: Column): Column =
    when(length(text) > 0,
      regexp_count(text, lit("[^a-zA-Z0-9\\s]")).cast("double") / length(text))
      .otherwise(lit(0.0))

  /** Mean token length in characters. */
  def meanTokenLength(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) > 0,
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(toks))
      .otherwise(lit(0.0))
  }

  /** Composite quality score in [0,1]: rewards mid-range length, some
    * stopword presence, low punctuation noise. Weights are engine-defined
    * (deterministic, documented) — the point is the *shape* of a
    * Gopher-style rule filter, computed scan-side.
    */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val lengthOk = when(nTok.between(10, 10000), lit(1.0)).otherwise(lit(0.0))
    val stopRatio = when(nTok > 0, stopwordCount(text).cast("double") / nTok).otherwise(lit(0.0))
    val stopOk = when(stopRatio > 0.01, lit(1.0)).otherwise(lit(0.0))
    val punctOk = when(punctRatio(text) < 0.2, lit(1.0)).otherwise(lit(0.0))
    round((lengthOk + stopOk + punctOk) / 3.0, 6)
  }

  // ── Language identification ─────────────────────────────────────────────

  /** Tiny per-language marker-word sets. A real system uses char-n-gram
    * profiles over fastText-scale training; the engine contract here is a
    * deterministic scan-side heuristic with the same plan shape.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is", "with"),
    "de" -> Seq("der", "die", "und", "das", "mit"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "es" -> Seq("el", "los", "las", "una", "con"))

  /** Marker-hit counts per language; predicted language = argmax with
    * first-listed-language tiebreak, 'und' when nothing matches.
    */
  /** All marker-set hit counts in ONE native pass over the raw text
    * (no lower() copy, no token-array materialization, one map probe per
    * token) — the q32 hot path. Equivalent per slot to
    * `tokensInSet(tokens(lower(text)), set_i)`.
    */
  def langScores(text: Column): Column =
    call_function("graft_lang_scores", text, typedlit(langMarkers.map(_._2)))

  def langId(text: Column): Column = {
    // argmax via array_position (first occurrence = first-listed-language
    // tiebreak); the counts array comes from the fused single-pass kernel
    // and codegen subexpression elimination collapses its three uses.
    val counts = langScores(text)
    val best = array_max(counts)
    val langs = typedlit(langMarkers.map(_._1))
    when(best > 0,
      element_at(langs, array_position(counts, best).cast("int")))
      .otherwise(lit("und"))
  }

  // ── PII redaction ───────────────────────────────────────────────────────

  /** Redaction patterns chosen to behave identically under Java regex and
    * RE2 (no backrefs/lookaround): emails, 16-digit card-like numbers,
    * international-ish phone numbers. Order matters and is part of the
    * contract: the card pattern MUST run before the phone pattern, whose
    * character class would otherwise swallow every card as <PHONE>.
    */
  val piiPatterns: Seq[(String, String)] = Seq(
    "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}" -> "<EMAIL>",
    "[0-9]{4}[- ]?[0-9]{4}[- ]?[0-9]{4}[- ]?[0-9]{4}" -> "<CARD>",
    "\\+?[0-9][0-9() -]{7,}[0-9]" -> "<PHONE>")

  /** Replace PII spans with typed placeholders, in [[piiPatterns]] order. */
  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (pat, repl)) =>
      regexp_replace(c, pat, repl)
    }

  // ── Repetition scoring (Gopher-style) ───────────────────────────────────

  /** Fraction of 2-gram occurrences taken by the single most frequent
    * 2-gram — the classic repetition signal (high = boilerplate/spam).
    * Per-row HOF: build the 2-gram list, count each gram's occurrences
    * via filter, take the max. O(n²) in tokens per row — fine for
    * documents, cap input length upstream for pathological rows.
    */
  def maxBigramFraction(text: Column): Column = {
    val grams = graft.dedup.Shingles.shingles(text, 2)
    val counts = transform(grams, g => size(filter(grams, x => x === g)))
    when(size(grams) > 0,
      array_max(counts).cast("double") / size(grams))
      .otherwise(lit(0.0))
  }

  // ── Fingerprinting ──────────────────────────────────────────────────────

  /** Order-sensitive 64-bit document fingerprint: xxhash64 chained over
    * token hashes (a hash chain rather than a·x+b rolling arithmetic —
    * no overflow under ANSI mode, same collision behavior). Equal texts
    * ⇒ equal fingerprints; any token edit ⇒ different fingerprint.
    */
  def fingerprint(text: Column): Column =
    aggregate(tokens(text), lit(0L), (acc, t) => xxhash64(acc, t))
}
