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

  def tokens(text: Column): Column = split(text, "\\s+")

  // ── Token counting ──────────────────────────────────────────────────────

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword proxy: runs of letters, runs of digits, or single
    * non-alphanumeric glyphs — the standard pre-tokenizer shape. A cheap,
    * deterministic stand-in for a real BPE vocab count.
    */
  val bpeTokenPattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"

  def bpeishTokenCount(text: Column): Column = regexp_count(text, lit(bpeTokenPattern))

  // ── Quality scoring ─────────────────────────────────────────────────────

  /** English-ish stopwords present in general text; ratio of them is the
    * classic fluency proxy (Gopher/C4-style quality filters).
    */
  val stopwords: Seq[String] =
    Seq("the", "a", "an", "and", "of", "to", "in", "is", "it", "that", "for", "on", "with", "as")

  def stopwordCount(text: Column): Column =
    size(filter(tokens(lower(text)), t => t.isInCollection(stopwords)))

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
  def langId(text: Column): Column = {
    val toks = tokens(lower(text))
    val counts = langMarkers.map { case (lang, markers) =>
      lang -> size(filter(toks, t => t.isInCollection(markers)))
    }
    val best = counts.map(_._2).reduce((a, b) => greatest(a, b))
    counts.foldRight(lit("und"): Column) { case ((lang, c), els) =>
      when(c > 0 && c === best, lit(lang)).otherwise(els)
    }
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
