package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sparse lexical retrieval over a document corpus: Okapi BM25 scoring
  * for a fixed query-term set, and per-document TF-IDF keyword
  * extraction. The training-data uses: BM25 is the standard first-stage
  * retriever for decontamination sweeps and targeted corpus probes
  * (find documents about X before an expensive semantic pass); TF-IDF
  * keywords are the cheap per-document topic signature for corpus
  * cards and mixture audits.
  *
  * Scale shape:
  *   - BM25: the token explode FILTERS to the query vocabulary before
  *     any shuffle (the corpus-sized stream narrows to |hits| rows at
  *     the map side), term stats (df) are a |Q|-row frame that
  *     broadcasts back, and the doc-length/corpus stats ride a 1-row
  *     broadcast cross join. One keyed aggregation on (doc, term), one
  *     on doc.
  *   - TF-IDF: full (doc, term) term frequencies with partial+final
  *     aggregation; document frequencies aggregate the SAME frame
  *     (never a second corpus scan) and join back keyed on term; the
  *     per-doc top-k is a doc-partitioned window, never a global sort.
  *
  * Cross-engine determinism discipline (the q72/q74 rules): every
  * per-row score is ONE double expression chain with the oracle's exact
  * operand order; sums of scores ride DECIMAL (order-exact); ranking
  * ties break on the term/doc id.
  */
object Retrieval {

  /** Okapi BM25 with the standard k1/b defaults. avgdl is sum(dl)/N
    * from exact long counts (a double avg would be summation-order
    * dependent); idf is the Robertson-Sparck-Jones "+1" form, positive
    * for every df.
    */
  def bm25(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queryTerms: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75
  ): DataFrame = {
    val base = docs.select(
      col(idCol).as("doc_id"),
      TextAnalysis.tokens(col(textCol)).as("toks"))
    // Skinny (id, len) frame, materialized once: it feeds both the
    // 1-row corpus stats and the per-doc join — lazy it would tokenize
    // the corpus twice more.
    val dl = base.select(col("doc_id"), size(col("toks")).cast("long").as("dl"))
      .localCheckpoint()
    // 1-row corpus stats; exact integer sums, ONE division.
    val stats = dl.agg(
      count(lit(1)).cast("double").as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val tf = base
      .select(col("doc_id"), explode(col("toks")).as("term"))
      .filter(col("term").isin(queryTerms: _*))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))
      // ≤ |hit docs|·|Q| rows; materialized so the df leg reuses it
      // instead of re-scanning the corpus.
      .localCheckpoint()
    val df = tf.groupBy(col("term"))
      .agg(count(lit(1)).cast("double").as("df"))
    // Per-(doc, term) partial score — one double chain, oracle-ordered;
    // DECIMAL(18,9) so the per-doc sum is exact in any order.
    val idf = log((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
    val weight = (col("tf") * (lit(k1) + lit(1.0))) /
      (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl")))
    tf.join(broadcast(df), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), (idf * weight).cast("decimal(18,9)").as("s"))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("s")).cast("double"), 6).as("bm25"))
  }

  /** Top-`k` BM25 hits, deterministically ordered (score desc, doc id). */
  def bm25TopK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queryTerms: Seq[String],
      k: Int
  ): DataFrame =
    bm25(docs, idCol, textCol, queryTerms)
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(k)

  /** Per-document top-`k` TF-IDF keywords. idf = ln(N/df) over the raw
    * whitespace vocabulary; rank ties break lexicographically on the
    * term so the cut is total.
    */
  def tfidfKeywords(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int
  ): DataFrame = {
    val tf = docs
      .select(col(idCol).as("doc_id"),
        explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))
      // One durable (doc, term) frame feeds BOTH df and the rank — the
      // df leg would otherwise re-scan and re-explode the corpus.
      .localCheckpoint()
    val df = tf.groupBy(col("term"))
      .agg(count(lit(1)).cast("double").as("df"))
    val n = docs.agg(count(lit(1)).cast("double").as("n_docs"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("term"))
    tf.join(df, "term")
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("term"),
        (col("tf") * log(col("n_docs") / col("df"))).as("tfidf"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("term"),
        round(col("tfidf"), 6).as("tfidf"))
  }
}
