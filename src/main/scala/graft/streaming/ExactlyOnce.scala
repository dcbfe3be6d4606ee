package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exactly-once `foreachBatch` appends — the idempotence recipe a
  * blind `mode("append")` sink lacks: Structured Streaming replays a
  * micro-batch after a sink-side failure with the SAME batchId, so an
  * append-mode parquet sink double-writes the batch's rows on retry
  * (the r13 ADVICE finding against q227/q232's ledger appends).
  *
  * [[appendKeyed]] stamps every row with the batchId and writes it as a
  * `batch_id=<id>` partition under DYNAMIC partition overwrite: a
  * replayed batch OVERWRITES its own partition (foreachBatch is
  * deterministic given the batch's offsets, so the rewrite is
  * byte-equivalent) and never touches other batches' partitions —
  * append semantics across batches, overwrite semantics within one.
  * This is the standard Spark exactly-once foreachBatch pattern for
  * file sinks; transactional sinks (TxTable.mergeSink) get the same
  * guarantee from their commit log instead.
  *
  * Scale shape: one partition directory per micro-batch, written by the
  * batch's own tasks — no extra shuffle, no cross-batch reads; readers
  * scan `dir` as ordinary partitioned parquet (drop `batch_id` or use
  * it as the processing-time lineage column it is).
  */
object ExactlyOnce {

  /** Idempotently append `df` as the `batch_id=<batchId>` partition of
    * `dir`. Call from `foreachBatch { (batch, id) => ... }` with the
    * sink-provided id — NEVER a self-minted counter, which would break
    * the replay-overwrites-itself contract.
    */
  def appendKeyed(df: DataFrame, dir: String, batchId: Long): Unit =
    df.withColumn("batch_id", lit(batchId))
      .write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(dir)
}
