package graft.text

import org.apache.spark.sql.Dataset

/** Document chunking for context-window preparation: split long documents
  * into chunks of at most `maxTokens` whitespace tokens, breaking at
  * sentence boundaries where possible — the step between raw corpus text
  * and [[SequencePacker]]'s fixed-window packing.
  *
  * Runs as a typed flatMap (narrow, per-row, no shuffle): each document
  * independently yields its chunks, so the operator scales with the scan
  * like every other per-document transform.
  */
object Chunker {

  final case class DocChunk(doc_id: Long, chunk_idx: Int, text: String, n_tokens: Int)

  /** Greedy sentence packing: sentences accumulate into the current chunk
    * until the NEXT one would exceed `maxTokens`; a single sentence longer
    * than `maxTokens` is hard-split on token boundaries. Sentence ends are
    * `.`/`!`/`?` followed by whitespace. Chunks concatenate (with single
    * spaces) to the whitespace-normalized document — nothing dropped,
    * nothing duplicated.
    */
  def chunk(docs: Dataset[(Long, String)], maxTokens: Int): Dataset[DocChunk] = {
    require(maxTokens > 0, "maxTokens must be positive")
    import docs.sparkSession.implicits._
    docs.flatMap { case (id, rawText) =>
      // Null text chunks to nothing — every other per-document operator
      // is null-safe (the expressions skip null rows); a typed flatMap
      // must do it itself.
      val text = Option(rawText).getOrElse("")
      val sentences = text.split("(?<=[.!?])\\s+").filter(_.nonEmpty)
      val chunks = scala.collection.mutable.ArrayBuffer.empty[Array[String]]
      var cur = Array.empty[String]
      def flush(): Unit = { if (cur.nonEmpty) { chunks += cur; cur = Array.empty } }
      sentences.foreach { s =>
        val toks = s.split("\\s+").filter(_.nonEmpty)
        if (toks.length > maxTokens) { // oversized sentence: hard-split
          flush()
          toks.grouped(maxTokens).foreach(g => chunks += g)
        } else if (cur.length + toks.length > maxTokens) {
          flush(); cur = toks
        } else cur = cur ++ toks
      }
      flush()
      chunks.zipWithIndex.map { case (toks, i) =>
        DocChunk(id, i, toks.mkString(" "), toks.length)
      }
    }
  }
}
