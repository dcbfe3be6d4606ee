package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed aggregator folding per-document MinHash signatures into the
  * signature of the GROUP's shingle-set union — the mergeability that
  * makes MinHash a sketch: min is associative/commutative, so the
  * element-wise minimum of signatures equals the signature of the union
  * of the underlying sets. Enables corpus-level similarity (compare
  * whole sources/domains/clusters) without re-shingling anything:
  *
  *   docs.groupBy($"source")
  *       .agg(MinHashUnionAgg.toColumn(...).as("source_sig"))
  *
  * Partial aggregation (map-side combine) comes free from the Aggregator
  * contract — merge() is exactly the element-wise min.
  */
object MinHashUnionAgg extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {

  /** Sentinel-filled zero: the signature of the empty set. */
  override def zero: Array[Long] = Array.empty

  private def minMerge(a: Array[Long], b: Array[Long]): Array[Long] =
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else {
      require(a.length == b.length, s"signature length mismatch: ${a.length} vs ${b.length}")
      Array.tabulate(a.length)(i => math.min(a(i), b(i)))
    }

  override def reduce(buf: Array[Long], sig: Seq[Long]): Array[Long] =
    minMerge(buf, sig.toArray)

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = minMerge(a, b)

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
