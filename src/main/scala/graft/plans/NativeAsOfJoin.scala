package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftPlanBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, AttributeReference, AttributeSet, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics

/** NATIVE backward as-of join — the engine's one custom whole-operator
  * plan node (SURVEY preference tier (c): LogicalPlan + SparkStrategy +
  * SparkPlan, registered through `SparkSessionExtensions`), used where
  * composition genuinely pays a tax: [[graft.operators.AsOfJoin]]
  * expresses the same semantics as union-and-sweep, which widens both
  * sides to a common schema, doubles the shuffled row count, and sorts
  * left rows it immediately filters back out. This operator shuffles
  * each side once AT ITS OWN WIDTH, sorts per partition, and streams a
  * two-pointer merge:
  *
  *   - distribution: `ClusteredDistribution` on the key for BOTH
  *     children — EnsureRequirements co-partitions them exactly like a
  *     sort-merge join (and AQE still applies, since the node only
  *     states requirements, never plans exchanges itself);
  *   - ordering: (key asc, time asc) per child, satisfied by local
  *     sorts, never a global one;
  *   - execute: per co-partition, one forward pass over both sorted
  *     streams — O(|L| + |R|) with ONE buffered right row and ONE
  *     remembered match, no per-key buffering, so an arbitrarily dense
  *     right side (the case that makes a `l.t >= r.t` theta join
  *     quadratic) streams in constant memory.
  *
  * Semantics match [[graft.operators.AsOfJoin.backward]] on all
  * non-null keys/times (≤ ties visible, left-outer nulls, exact
  * (key, time) right duplicates resolved to the same max-xxhash row) —
  * `NativeAsOfJoinSpec` pins native ≡ composed on randomized inputs and
  * q186 hash-gates it against DuckDB's ASOF LEFT JOIN. On SQL NULLs the
  * two differ BY DESIGN: this operator follows join semantics (a null
  * key or time matches nothing — DuckDB/kdb parity), while the composed
  * sweep inherits window-partition null grouping (null keys form a
  * partition and can fill from null-key snapshots). The spec pins both
  * behaviors explicitly.
  */
object NativeAsOfJoin {

  /** Same contract as [[graft.operators.AsOfJoin.backward]]: left
    * columns, then `asof_<rightTime>`, then the carried right values.
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTime: String,
      rightTime: String,
      rightValues: Seq[String] = Seq.empty
  ): DataFrame = {
    val lPlan = left.queryExecution.analyzed
    // Fresh-alias the right side so a self-join (both sides reading the
    // same table) cannot carry colliding expression ids into one node.
    val rAnalyzed = right.queryExecution.analyzed
    val rAliases = rAnalyzed.output.map(a => Alias(a, a.name)())
    val rPlan = Project(rAliases, rAnalyzed)
    val rOut = rAliases.map(_.toAttribute)

    def res(out: Seq[Attribute], n: String, side: String): Attribute =
      out.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column $n missing on $side side"))

    val carry =
      if (rightValues.nonEmpty) rightValues
      else right.columns.toSeq.diff(keyCols :+ rightTime)
    require(carry.intersect(left.columns.toSeq).isEmpty,
      s"right value columns ${carry.intersect(left.columns.toSeq)} collide with left columns; alias them first")
    val asOfName = s"asof_$rightTime"
    require(!left.columns.contains(asOfName) && !carry.contains(asOfName),
      s"output column $asOfName collides with an input column; alias it first")
    val lKeys = keyCols.map(res(lPlan.output, _, "left"))
    val rKeys = keyCols.map(res(rOut, _, "right"))
    val lTime = res(lPlan.output, leftTime, "left")
    val rTime = res(rOut, rightTime, "right")
    require(lKeys.map(_.dataType) == rKeys.map(_.dataType),
      "as-of key columns must have identical types on both sides")
    require(lTime.dataType == rTime.dataType,
      s"as-of time columns must share a type; got ${lTime.dataType} vs ${rTime.dataType}")
    val rCarry = carry.map(res(rOut, _, "right"))
    val outAttrs =
      AttributeReference(s"asof_$rightTime", rTime.dataType, nullable = true)() +:
        rCarry.map(a => AttributeReference(a.name, a.dataType, nullable = true)())

    GraftPlanBridge.ofRows(left.sparkSession,
      AsOfJoinPlan(lPlan, rPlan, lKeys, rKeys, lTime, rTime, rCarry, outAttrs))
  }
}

/** Resolved-by-construction logical node (built from analyzed children,
  * so every expression is already bound; the analyzer leaves it alone
  * and [[GraftStrategies]] plans it).
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    rightCarry: Seq[Attribute],
    outAttrs: Seq[Attribute]
) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ outAttrs
  override def producedAttributes: AttributeSet = AttributeSet(outAttrs)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Optimizer rule for the custom node, injected via
  * `injectOptimizerRule`: Catalyst's own PushDownPredicates cannot see
  * through an unknown plan node, so without this a `filter` applied
  * ABOVE an as-of join sticks there — the probe side shuffles in full
  * and the parquet scan reads every row even when the predicate would
  * have pruned at the source. Any conjunct that references only LEFT
  * attributes pushes below the node (safe by construction: every output
  * row is one left row plus columns the predicate does not mention, so
  * filtering before ≡ filtering after); conjuncts touching the as-of
  * columns stay above.
  */
object PushFilterThroughAsOfJoin
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
  import org.apache.spark.sql.catalyst.expressions.And
  import org.apache.spark.sql.catalyst.plans.logical.Filter

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, asOf: AsOfJoinPlan) =>
      val (pushable, kept) = splitConjunctivePredicates(cond)
        .partition(p => p.deterministic && p.references.subsetOf(asOf.left.outputSet))
      if (pushable.isEmpty) f
      else {
        val pushed = asOf.copy(left = Filter(pushable.reduce(And), asOf.left))
        kept.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

/** Planner strategy for the engine's custom nodes, injected via
  * `SparkSessionExtensions.injectPlannerStrategy` (see
  * [[graft.functions.GraftExtensions]]).
  *
  * Like Spark's own JoinSelection, the as-of node has two physical
  * strategies chosen by the optimizer's size estimate: a dim-sized
  * right side broadcasts ([[BroadcastAsOfJoinExec]] — the probe side is
  * NEVER shuffled), anything else co-partitions and merges
  * ([[AsOfJoinExec]]). The same `autoBroadcastJoinThreshold` knob (and
  * its -1 off-switch) governs the choice.
  */
object GraftStrategies extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, carry, out) =>
      val threshold = org.apache.spark.sql.internal.SQLConf.get.autoBroadcastJoinThreshold
      val exec =
        if (threshold > 0 && r.stats.sizeInBytes <= threshold)
          BroadcastAsOfJoinExec(lk, rk, lt, rt, carry, out, planLater(l), planLater(r))
        else
          AsOfJoinExec(lk, rk, lt, rt, carry, out, planLater(l), planLater(r))
      exec :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightCarry: Seq[Expression],
    outAttrs: Seq[Attribute],
    left: SparkPlan,
    right: SparkPlan
) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ outAttrs
  override def producedAttributes: AttributeSet = AttributeSet(outAttrs)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    // The trailing xxhash64 term makes the pick among EXACT (key, time)
    // right duplicates deterministic — and, because the merge keeps the
    // LAST row of a tie run, identical to the composed operator's
    // `last(...) over (order by t, side, xxhash64(struct))`: both
    // resolve the tie to the max-hash row. Same seed (42), same hashed
    // values (time + carried columns, in order) as functions.xxhash64
    // over the carry struct.
    ((rightKeys :+ rightTime).map(SortOrder(_, Ascending)) :+
      SortOrder(new org.apache.spark.sql.catalyst.expressions.XxHash64(
        rightTime +: rightCarry), Ascending)))

  // The probe side's partitioning and ordering survive the merge.
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext, "number of matched rows"))

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    val leftOut = left.output
    val rightOut = right.output
    val fullOut = output
    val nEmit = outAttrs.length
    val lKeysB = leftKeys
    val rKeysB = rightKeys
    val lTimeB = leftTime
    val rTimeB = rightTime
    val emitExprs = rightTime +: rightCarry

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeysB, leftOut)
      val rKeyProj = UnsafeProjection.create(rKeysB, rightOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTimeB), leftOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTimeB), rightOut)
      val emitProj = UnsafeProjection.create(emitExprs, rightOut)
      val resultProj = UnsafeProjection.create(fullOut, leftOut ++ outAttrs)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(timeType))
      val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow
      val nullEmit: InternalRow = new GenericInternalRow(nEmit)

      // One buffered right row, UNCOPIED: the iterator's backing buffer
      // is only overwritten by the next rIter.next() call, which happens
      // exclusively inside advanceRight() — i.e. only once this row has
      // been consumed or discarded. Values that must outlive an advance
      // (lastEmit/lastKey) are copied at the point of capture below, so
      // the merge allocates per MATCH, not per right row (review r10).
      var rCurr: InternalRow = null
      def advanceRight(): Unit =
        rCurr = if (rIter.hasNext) rIter.next() else null
      advanceRight()

      // The remembered best match: emit image + its key, both copies.
      var lastEmit: UnsafeRow = null
      var lastKey: UnsafeRow = null

      lIter.map { lRow =>
        val lKey = lKeyProj(lRow)
        val lTimeRow = lTimeProj(lRow)
        val lUsable = !lKey.anyNull && !lTimeRow.isNullAt(0)
        if (lUsable) {
          var advancing = true
          while (advancing && rCurr != null) {
            val rKey = rKeyProj(rCurr)
            if (rKey.anyNull) advanceRight() // null keys join nothing
            else {
              val c = keyOrd.compare(rKey, lKey)
              if (c < 0) advanceRight() // keys gone forever (both sorted)
              else if (c == 0) {
                val rTimeRow = rTimeProj(rCurr)
                if (rTimeRow.isNullAt(0)) advanceRight() // null time never matches
                else if (timeOrd.compare(rTimeRow, lTimeRow) <= 0) {
                  lastEmit = emitProj(rCurr).copy()
                  lastKey = rKey.copy()
                  advanceRight()
                } else advancing = false
              } else advancing = false
            }
          }
        }
        val matched = lUsable && lastKey != null && !lKey.anyNull &&
          keyOrd.compare(lastKey, lKey) == 0
        if (matched) numMatched += 1
        numOutputRows += 1
        resultProj(joined(lRow, if (matched) lastEmit else nullEmit))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** The probe index: per join key, parallel arrays of time rows and emit
  * rows sorted by (time, xxhash64 tie-hash). The clean home for the
  * build would be a custom `BroadcastMode.transform` (the
  * HashedRelation discipline), but `BroadcastExchangeExec` hard-rejects
  * any payload type it does not know — so the rows broadcast as-is
  * (IdentityBroadcastMode) and the index builds executor-side ONCE per
  * broadcast via [[AsOfIndex.cached]], not once per task (review r10):
  * the first task to arrive builds, the rest reuse, and the
  * SoftReference lets the executor drop it under memory pressure.
  */
final class AsOfIndex(
    val map: java.util.HashMap[UnsafeRow, (Array[UnsafeRow], Array[UnsafeRow])]
) extends Serializable

object AsOfIndex {

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[Long, java.lang.ref.SoftReference[AsOfIndex]]()

  /** The executor-local index for broadcast `id`, building it from
    * `rows` on first use. Null keys and null times are dropped at build
    * time (they can never match).
    */
  def cached(
      id: Long,
      rows: Array[InternalRow],
      rightKeys: Seq[Expression],
      rightTime: Expression,
      rightCarry: Seq[Expression],
      rightOutput: Seq[Attribute]): AsOfIndex = {
    val entry = cache.compute(id, (_, prev) => {
      if (prev != null && prev.get() != null) prev
      else new java.lang.ref.SoftReference(
        build(rows, rightKeys, rightTime, rightCarry, rightOutput))
    })
    // compute() holds the map bin lock while building, so the reference
    // we just ensured cannot have been cleared between compute and get
    // unless the JVM is actively OOM-collecting — rebuild uncached then.
    val got = entry.get()
    if (got != null) got
    else build(rows, rightKeys, rightTime, rightCarry, rightOutput)
  }

  private def build(
      rows: Array[InternalRow],
      rightKeys: Seq[Expression],
      rightTime: Expression,
      rightCarry: Seq[Expression],
      rightOutput: Seq[Attribute]): AsOfIndex = {
    val keyProj = UnsafeProjection.create(rightKeys, rightOutput)
    val timeProj = UnsafeProjection.create(Seq(rightTime), rightOutput)
    val emitProj = UnsafeProjection.create(rightTime +: rightCarry, rightOutput)
    val hashProj = UnsafeProjection.create(
      Seq(new org.apache.spark.sql.catalyst.expressions.XxHash64(
        rightTime +: rightCarry)), rightOutput)
    val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(rightTime.dataType))
    val tmp = new java.util.HashMap[UnsafeRow,
      scala.collection.mutable.ArrayBuffer[(UnsafeRow, Long, UnsafeRow)]]()
    rows.foreach { r =>
      val key = keyProj(r)
      val timeRow = timeProj(r)
      if (!key.anyNull && !timeRow.isNullAt(0)) {
        var buf = tmp.get(key)
        if (buf == null) {
          buf = scala.collection.mutable.ArrayBuffer.empty[(UnsafeRow, Long, UnsafeRow)]
          tmp.put(key.copy(), buf)
        }
        buf += ((timeRow.copy(), hashProj(r).getLong(0), emitProj(r).copy()))
      }
    }
    val map = new java.util.HashMap[UnsafeRow, (Array[UnsafeRow], Array[UnsafeRow])](
      tmp.size() * 2)
    tmp.forEach { (k, buf) =>
      val sorted = buf.sortWith { (a, b) =>
        val c = timeOrd.compare(a._1, b._1)
        c < 0 || (c == 0 && a._2 < b._2)
      }
      map.put(k, (sorted.map(_._1).toArray, sorted.map(_._3).toArray))
    }
    new AsOfIndex(map)
  }
}

/** Broadcast as-of join — the zero-shuffle strategy for a dim-sized
  * snapshot side (the 100 TB enrichment case: a trillion-row probe
  * stream annotated with the latest of a few thousand reference
  * snapshots). The right side collects to the driver, builds the
  * [[AsOfIndex]] once ([[AsOfIndexBroadcastMode]]), and ships ready to
  * probe; every left row is then a hash lookup + binary search — the
  * probe side keeps its partitioning untouched (NO exchange at all on
  * the big side, which the plan gate in NativeAsOfJoinSpec pins).
  *
  * Tie and null semantics are identical to [[AsOfJoinExec]] by
  * construction: per-key entries sort by (time, xxhash64(time+carry)),
  * and the search returns the LAST entry with time ≤ t — the max-hash
  * row among exact ties; null keys/times on either side join nothing.
  */
case class BroadcastAsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightCarry: Seq[Expression],
    outAttrs: Seq[Attribute],
    left: SparkPlan,
    right: SparkPlan
) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ outAttrs
  override def producedAttributes: AttributeSet = AttributeSet(outAttrs)

  override def requiredChildDistribution: Seq[Distribution] =
    org.apache.spark.sql.catalyst.plans.physical.UnspecifiedDistribution ::
      org.apache.spark.sql.catalyst.plans.physical.BroadcastDistribution(
        org.apache.spark.sql.catalyst.plans.physical.IdentityBroadcastMode) :: Nil

  // The probe side flows through untouched.
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext, "number of matched rows"))

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    val broadcastRows = right.executeBroadcast[Array[InternalRow]]()
    val timeType = leftTime.dataType
    val leftOut = left.output
    val rightOut = right.output
    val fullOut = output
    val nEmit = outAttrs.length
    val lKeysB = leftKeys
    val rKeysB = rightKeys
    val lTimeB = leftTime
    val rTimeB = rightTime
    val rCarryB = rightCarry

    left.execute().mapPartitions ({ lIter =>
      // Executor-cached build: the first task for this broadcast builds
      // the index, every later task on the executor reuses it.
      val index = AsOfIndex.cached(broadcastRows.id, broadcastRows.value,
        rKeysB, rTimeB, rCarryB, rightOut).map
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(timeType))
      val lKeyProj = UnsafeProjection.create(lKeysB, leftOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTimeB), leftOut)
      val resultProj = UnsafeProjection.create(fullOut, leftOut ++ outAttrs)
      val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow
      val nullEmit: InternalRow = new GenericInternalRow(nEmit)

      lIter.map { lRow =>
        val lKey = lKeyProj(lRow)
        val lTimeRow = lTimeProj(lRow)
        var emit: InternalRow = nullEmit
        if (!lKey.anyNull && !lTimeRow.isNullAt(0)) {
          val entries = index.get(lKey)
          if (entries != null) {
            // rightmost entry with time <= lTime (ties already sorted
            // hash-ascending, so "rightmost" is the max-hash row)
            val times = entries._1
            var lo = 0
            var hi = times.length - 1
            var found = -1
            while (lo <= hi) {
              val mid = (lo + hi) >>> 1
              if (timeOrd.compare(times(mid), lTimeRow) <= 0) {
                found = mid; lo = mid + 1
              } else hi = mid - 1
            }
            if (found >= 0) { emit = entries._2(found); numMatched += 1 }
          }
        }
        numOutputRows += 1
        resultProj(joined(lRow, emit))
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastAsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
