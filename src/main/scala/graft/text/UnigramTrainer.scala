package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SentencePiece-flavored unigram vocabulary training, as deterministic
  * integer iterations (Kudo 2018's seed-and-prune outer loop, with the
  * engine's exact integer Viterbi objective — fewest pieces, then
  * highest weight — standing in for the float EM inner loop; weights ARE
  * usage counts, so every quantity in the loop is a corpus count and the
  * result is bit-stable across partitionings and re-runs).
  *
  * Loop shape per round (all corpus-side work distributed):
  *   1. segment every distinct word with the current (pieces, weights)
  *      via `graft_viterbi` (codegen expression; vocab ships as one
  *      broadcast-referenced hash map),
  *   2. usage[piece] = Σ word-multiplicity over the segmentations — one
  *      partial+final aggregation,
  *   3. collect the ≤ `maxCandidates` (piece, usage) rows — the same
  *      bounded-model-collect contract as the k-means seed sample and
  *      the BPE merge batch (the MODEL is driver-bounded by
  *      construction; the CORPUS never is),
  *   4. prune the lowest-usage multi-char pieces (never the single
  *      chars — coverage guarantee), re-weight with the new usage.
  *
  * Word-frequency compression does the heavy lifting at scale: segmenting
  * touches each DISTINCT word once with its multiplicity — on natural
  * corpora the distinct-word table is orders of magnitude smaller than
  * the corpus, and it lives partitioned, never on the driver.
  */
object UnigramTrainer {

  final case class Config(
      maxPieceLen: Int = 6,
      minCount: Long = 2,
      maxCandidates: Int = 4096,
      target: Int = 256,
      pruneFrac: Double = 0.2,
      maxRounds: Int = 16)

  /** Distinct words with multiplicities — the corpus-side frame every
    * round segments.
    */
  private def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(split(col(textCol), "\\s+")).as("word"))
      .where(length(col("word")) > 0)
      .groupBy("word")
      .agg(count(lit(1)).as("mult"))

  /** Final vocabulary as `(piece, usage)`: usage is the exact number of
    * times the piece appears when the whole corpus is segmented with the
    * final vocabulary (weights = usages). Deterministic total order
    * (usage desc, piece asc).
    */
  def train(docs: DataFrame, textCol: String, cfg: Config = Config()): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(cfg.target >= 1 && cfg.maxPieceLen >= 1 && cfg.maxRounds >= 1)

    val words = wordCounts(docs, textCol).localCheckpoint()

    // Seed candidates: every substring of length ≤ maxPieceLen weighted
    // by occurrence count; keep single chars unconditionally plus the
    // top multi-char candidates by (freq, piece) — a bounded seed model.
    val maxL = cfg.maxPieceLen
    val subCounts = words.as[(String, Long)]
      .flatMap { case (w, mult) =>
        for {
          i <- 0 until w.length
          j <- (i + 1) to math.min(i + maxL, w.length)
        } yield (w.substring(i, j), mult)
      }
      .toDF("piece", "freq")
      .groupBy("piece").agg(sum("freq").as("freq"))

    val chars = subCounts.where(length(col("piece")) === 1)
      .as[(String, Long)].collect()
    val multi = subCounts
      .where(length(col("piece")) > 1 && col("freq") >= cfg.minCount)
      .orderBy(col("freq").desc, col("piece"))
      .limit(math.max(0, cfg.maxCandidates - chars.length))
      .as[(String, Long)].collect()

    val charSet = chars.map(_._1).toSet
    var vocab: Array[(String, Long)] = (chars ++ multi).sortBy { case (p, c) => (-c, p) }

    var round = 0
    var usage: Array[(String, Long)] = null
    while (round < cfg.maxRounds && (usage == null || vocab.length > cfg.target)) {
      // 1-2. segment distinct words, sum multiplicities per used piece
      val pieces = vocab.map(_._1).toSeq
      val weights = vocab.map(_._2).toSeq
      usage = words
        .select(col("mult"),
          explode(WordPiece.viterbiTokens(col("word"), pieces, weights)).as("piece"))
        .groupBy("piece").agg(sum(col("mult")).as("usage"))
        .as[(String, Long)].collect()
      val used = usage.toMap

      // 3-4. prune: zero-usage multi-char pieces die immediately; then
      // the lowest-usage multi-char pieces down to the per-round quota.
      val (keepChars, multis) = vocab.partition { case (p, _) => charSet(p) }
      val withUsage = multis.map { case (p, _) => (p, used.getOrElse(p, 0L)) }
      val alive = withUsage.filter(_._2 > 0L)
      val targetMulti = math.max(0, cfg.target - keepChars.length)
      val toDrop = math.min(
        alive.length - targetMulti,
        math.max(1, math.ceil(alive.length * cfg.pruneFrac).toInt))
      val kept =
        if (alive.length <= targetMulti) alive
        else alive.sortBy { case (p, u) => (u, p) }.drop(math.max(toDrop, 0))
      vocab = (keepChars.map { case (p, _) => (p, used.getOrElse(p, 1L)) } ++ kept)
        .sortBy { case (p, u) => (-u, p) }
      round += 1
    }
    require(vocab.length <= cfg.target,
      s"unigram pruning stalled at ${vocab.length} pieces after $round rounds — " +
        "target below the single-char alphabet size, or maxRounds too small")

    // Final exact usage recount under the final vocabulary.
    val pieces = vocab.map(_._1).toSeq
    val weights = vocab.map(_._2).toSeq
    words
      .select(col("mult"),
        explode(WordPiece.viterbiTokens(col("word"), pieces, weights)).as("piece"))
      .groupBy("piece").agg(sum(col("mult")).as("usage"))
      .orderBy(col("usage").desc, col("piece"))
  }
}
