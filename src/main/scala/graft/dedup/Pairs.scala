package graft.dedup

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared pair-generation kernel for the bucket-collect formulation the
  * dedup family uses instead of self-joins: group by bucket key, collect
  * a sorted member array, emit intra-array ordered pairs. One shuffle and
  * ONE evaluation of the upstream plan, where a self-join would execute
  * it twice (Spark self-joins do not share the common subtree).
  */
private[dedup] object Pairs {

  /** All ordered pairs (ds(i), ds(j)), i < j, of a sorted array column,
    * as struct(a, b) of the element type.
    */
  def ordered(ds: Column): Column =
    flatten(transform(ds, (x, i) =>
      transform(slice(ds, i + lit(2), size(ds)),
        y => struct(x.as("a"), y.as("b")))))
}
