package graft.text

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Sequence packing: concatenate variable-length tokenized documents into
  * fixed-capacity training sequences (the standard LLM pre-training step
  * that turns a ragged corpus into dense `maxTokens`-sized examples).
  *
  * Strategy: next-fit within a partition (the current bin closes when a
  * doc doesn't fit and is never revisited), documents longer than
  * the capacity truncated (real pipelines chunk them; truncation keeps
  * this operator single-purpose). Packing is partition-local — no
  * shuffle beyond the optional repartition — and deterministic given the
  * input partitioning (sort by id first for full determinism).
  *
  * Output: one row per packed sequence with the member doc ids, member
  * count, and token total (≤ maxTokens). Token counts come in as a
  * column, so any tokenizer upstream works.
  */
object SequencePacker {

  final case class Doc(id: Long, nTokens: Int)
  final case class Packed(partition: Int, seq_index: Int, doc_ids: Seq[Long], n_docs: Int, n_tokens: Int)

  def pack(
      docs: DataFrame,
      idCol: String,
      tokenCountCol: String,
      maxTokens: Int,
      numPartitions: Int = 0
  ): Dataset[Packed] = {
    import docs.sparkSession.implicits._
    // NULL ids are un-packable (and crash the encoder); NULL/negative
    // token counts clamp to 0 — least() alone would turn NULL into
    // maxTokens (it skips nulls) and negatives would let a pack exceed
    // capacity.
    val base = docs
      .filter(col(idCol).isNotNull)
      .select(
        col(idCol).cast("long").as("id"),
        greatest(lit(0),
          least(coalesce(col(tokenCountCol).cast("int"), lit(0)), lit(maxTokens)))
          .as("nTokens"))
      .as[Doc]
    val sized = if (numPartitions > 0) base.repartition(numPartitions, col("id")) else base

    sized.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val packed = scala.collection.mutable.ArrayBuffer.empty[Packed]
      var ids = scala.collection.mutable.ArrayBuffer.empty[Long]
      var used = 0
      for (d <- it) {
        if (used + d.nTokens > maxTokens && ids.nonEmpty) {
          packed += Packed(pid, packed.length, ids.toSeq, ids.length, used)
          ids = scala.collection.mutable.ArrayBuffer.empty[Long]
          used = 0
        }
        ids += d.id
        used += d.nTokens
      }
      if (ids.nonEmpty) packed += Packed(pid, packed.length, ids.toSeq, ids.length, used)
      packed.iterator
    }
  }
}
