package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k buffer: keeps the k best (score, payload) pairs, "best"
  * = highest score, ties broken by smallest payload (the same order as
  * `row_number() OVER (ORDER BY score DESC, payload ASC)`).
  *
  * A binary heap with the WORST kept element at the root: insertion into
  * a full buffer is compare-with-root + sift-down, O(log k); the stream
  * of n candidates costs O(n log k) and the buffer never exceeds k
  * entries — that bound is what makes the aggregate's partial (map-side)
  * phase shrink |corpus| candidates per query down to k before anything
  * crosses the shuffle.
  */
final class TopKBuffer(val k: Int) {
  var size = 0
  val scores = new Array[Double](k)
  val payloads = new Array[Long](k)

  /** true if (s1,p1) is a WORSE result than (s2,p2). Scores compare via
    * Double.compare — a total order, so NaN (greatest, i.e. "best") and
    * ±0.0 cannot break the heap invariant or make the output sort
    * non-transitive; this matches Spark's window ORDER BY score DESC,
    * which also sorts NaN above every real value.
    */
  @inline private def worse(s1: Double, p1: Long, s2: Double, p2: Long): Boolean = {
    val c = java.lang.Double.compare(s1, s2)
    c < 0 || (c == 0 && p1 > p2)
  }

  def insert(s: Double, p: Long): Unit = {
    if (size < k) {
      var i = size
      scores(i) = s; payloads(i) = p
      size += 1
      // sift up: parent must be worse-or-equal than children
      while (i > 0) {
        val parent = (i - 1) >> 1
        if (worse(scores(i), payloads(i), scores(parent), payloads(parent))) {
          swap(i, parent); i = parent
        } else return
      }
    } else if (worse(scores(0), payloads(0), s, p)) {
      scores(0) = s; payloads(0) = p
      siftDown(0)
    }
  }

  @inline private def swap(i: Int, j: Int): Unit = {
    val ts = scores(i); scores(i) = scores(j); scores(j) = ts
    val tp = payloads(i); payloads(i) = payloads(j); payloads(j) = tp
  }

  private def siftDown(start: Int): Unit = {
    var i = start
    while (true) {
      val l = 2 * i + 1
      val r = l + 1
      var worst = i
      if (l < size && worse(scores(l), payloads(l), scores(worst), payloads(worst))) worst = l
      if (r < size && worse(scores(r), payloads(r), scores(worst), payloads(worst))) worst = r
      if (worst == i) return
      swap(i, worst)
      i = worst
    }
  }

  /** Indices 0..size-1 ordered best-first. */
  def sortedIndices: Array[Int] =
    (0 until size).toArray.sortWith { (a, b) =>
      worse(scores(b), payloads(b), scores(a), payloads(a))
    }
}

/** `graft_topk(score, payload, k)` → array<struct<score double, payload
  * bigint>> of the k best rows per group, best-first.
  *
  * The point versus `row_number() OVER (PARTITION BY g ORDER BY ...) <= k`:
  * a window must shuffle EVERY candidate row to its group's partition
  * before ranking; this aggregate ranks in the partial phase, so at most
  * k entries per (group, input partition) reach the exchange. For a
  * broadcast nested-loop kNN — all candidates of a query already in one
  * partition — the shuffle carries exactly k rows per query instead of
  * |corpus|. Rows with null score or payload are ignored.
  */
case class TopKByScore(
    score: Expression,
    payload: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] with ImplicitCastInputTypes {

  require(k > 0, s"graft_topk needs k > 0, got $k")

  override def children: Seq[Expression] = Seq(score, payload)
  override def inputTypes: Seq[DataType] = Seq(DoubleType, LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("payload", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_topk"

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val p = payload.eval(input)
    if (s != null && p != null) {
      buf.insert(s.asInstanceOf[Double], p.asInstanceOf[Long])
    }
    buf
  }

  override def merge(a: TopKBuffer, b: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < b.size) { a.insert(b.scores(i), b.payloads(i)); i += 1 }
    a
  }

  override def eval(buf: TopKBuffer): Any = {
    val idx = buf.sortedIndices
    new GenericArrayData(idx.map(i =>
      InternalRow(buf.scores(i), buf.payloads(i))): Array[Any])
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) {
      bb.putDouble(buf.scores(i)); bb.putLong(buf.payloads(i)); i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k)
    var i = 0
    while (i < n) { buf.insert(bb.getDouble, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), payload = newChildren(1))
}
