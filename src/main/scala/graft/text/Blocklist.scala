package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Phrase-blocklist scanning — the content-filter stage every curation
  * pipeline runs (bad-word/URL/boilerplate phrase lists, UT1-style):
  * count occurrences of each of a dictionary of phrases in every
  * document with ONE Aho–Corasick automaton pass per document
  * ([[graft.functions.AhoCorasick]]), instead of one `instr`/regex scan
  * per phrase — at a 10⁴-phrase list the naive plan rescans the corpus
  * ten thousand times.
  *
  * The list is collected to the driver (a blocklist is dictionary-small
  * by construction) and ships inside the expression as plan literals;
  * the automaton compiles once per executor. Counts are leftmost-greedy
  * NON-overlapping per phrase — `replace(text, p, '')` arithmetic, the
  * SQL-recomputable contract (q235/q236).
  */
object Blocklist {

  /** Per-document per-phrase hit counts, zero rows omitted:
    * `(id, pid, n)`. `patterns`: (pid, phrase), driver-side.
    */
  def scan(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      patterns: Seq[(Long, String)]
  ): DataFrame = {
    require(patterns.nonEmpty, "empty blocklist")
    docs.select(col(idCol), explode(
      call_function("graft_ac_scan", col(textCol),
        typedlit(patterns.map(_._1)), typedlit(patterns.map(_._2)))).as("m"))
      .select(col(idCol), col("m.pid").as("pid"), col("m.n").as("n"))
  }

  /** Total non-overlapping hits across the whole dictionary as a NARROW
    * per-row column: an `aggregate` HOF folds the kernel's (pid, n)
    * array in-row — no explode, no shuffle (CurationSpec gates the plan).
    * NULL text counts zero. This is the scan-side filter the Curation
    * blocklist stage runs on; one definition here so the stage and any
    * other caller cannot drift.
    */
  def totalHits(text: Column, patterns: Seq[(Long, String)]): Column = {
    require(patterns.nonEmpty, "empty blocklist")
    coalesce(
      aggregate(
        call_function("graft_ac_scan", text,
          typedlit(patterns.map(_._1)), typedlit(patterns.map(_._2))),
        lit(0L), (acc, x) => acc + x.getField("n")),
      lit(0L))
  }

  /** Per-document verdict over ALL documents: total hits, distinct
    * phrases hit, and the keep flag (`n_hits` ≤ `maxHits`) — the
    * curation-filter shape.
    */
  def verdict(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      patterns: Seq[(Long, String)],
      maxHits: Long = 0L
  ): DataFrame = {
    val perDoc = scan(docs, idCol, textCol, patterns)
      .groupBy(col(idCol))
      .agg(sum(col("n")).as("n_hits"), count(lit(1)).as("n_patterns"))
    docs.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        coalesce(col("n_patterns"), lit(0L)).as("n_patterns"),
        (coalesce(col("n_hits"), lit(0L)) <= maxHits).as("keep"))
  }
}
