package graft.dedup

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text shingling shared by the dedup family.
  *
  * Tokenization is a plain whitespace split (the engine's documented token
  * unit for dedup; the BPE-ish analysis tokenizer lives in
  * [[graft.text.TextAnalysis]]). A w-shingle is the space-join of w
  * consecutive tokens; shingle hashes are xxhash64 — everything stays in
  * 64-bit longs from here on, so downstream set ops shuffle fixed-width
  * values, never strings.
  *
  * All of this is per-row higher-order-function work: narrow, codegen'd,
  * zero shuffle.
  */
object Shingles {

  def tokens(text: Column): Column = split(text, " ")

  /** Array of w-token shingle strings (empty array when the doc has fewer
    * than w tokens).
    */
  def shingles(text: Column, w: Int = 3): Column = {
    val toks = tokens(text)
    val n = size(toks)
    // slice is 1-based; start positions [1 .. n-w+1]. Guarded: sequence()
    // auto-descends when start > stop, which would fabricate shingles for
    // docs shorter than w tokens.
    when(n >= w,
      transform(sequence(lit(1), n - lit(w - 1)), i => concat_ws(" ", slice(toks, i, lit(w)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Distinct xxhash64 shingle hashes — the document's shingle *set*.
    * Native single-pass expression ([[graft.functions.ShingleHashes]]);
    * semantically `array_distinct(transform(shingles(text, w), xxhash64))`,
    * but codegen-friendly and allocation-free (the HOF chain is
    * CodegenFallback and dominated the dedup-family runtime).
    */
  def shingleSet(text: Column, w: Int = 3): Column =
    call_function("graft_shingle_set", text, lit(w))

  /** Exact Jaccard similarity of two pre-computed shingle sets; null when
    * both sets are empty (|A∪B| = 0 would otherwise be a 0/0 that throws
    * under the engine's pinned ANSI mode).
    */
  def jaccard(a: Column, b: Column): Column = {
    val union = size(a) + size(b) - size(array_intersect(a, b))
    when(union > 0, size(array_intersect(a, b)).cast("double") / union)
  }
}
