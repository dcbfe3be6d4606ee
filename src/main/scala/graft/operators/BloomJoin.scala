package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-filter semi-join reduction — the standard lever for a fact ⋈ dim
  * join whose dim side is too big to broadcast but whose KEY SET sketches
  * into a few hundred KB: build a Bloom filter over the dim join keys
  * (one pass, per-partition sketches merged — the same mergeability
  * argument as the HLL/CMS paths), broadcast the serialized filter inside
  * a codegen'd probe expression (`graft_bloom_contains`), and drop
  * non-joining fact rows AT THE SCAN, before they are shuffled. At 100 TB
  * the shuffle is the cost: a 5%-selective dim key set turns into ~95%
  * fewer fact bytes crossing the wire (BloomJoinSpec measures exactly
  * this from task metrics), while Spark's own AQE runtime filters cover
  * only the plan shapes its heuristics recognize.
  *
  * False positives pass ~fpp extra rows through the filter; the real join
  * behind it keeps the result EXACT — correctness never depends on the
  * sketch. Keys of any type are normalized through `xxhash64` on both
  * sides, so the filter always sketches longs (collisions there, like
  * false positives, only cost extra candidates — the join still compares
  * the real key columns).
  *
  * The filter builds with a driver-side action at plan-construction time
  * (`DataFrameStatFunctions.bloomFilter`): deliberate and bounded — the
  * driver holds the merged ~`1.44·n·log2(1/fpp)`-bit sketch, never the
  * keys themselves. `expectedDimKeys` sizes it; overshooting wastes
  * memory linearly, undershooting inflates the false-positive rate (and
  * with it shuffle traffic) but never correctness.
  */
object BloomJoin {

  /** Inner-join `fact` to `dim` on `factKey == dimKey`, pruning the fact
    * side through a Bloom filter of the dim keys first. Column names of
    * the two frames must not collide (same contract as the other join
    * operators here).
    */
  def reduceThenJoin(
      fact: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      expectedDimKeys: Long,
      fpp: Double = 0.01
  ): DataFrame = {
    require(expectedDimKeys > 0, s"expectedDimKeys must be > 0, got $expectedDimKeys")
    val bloom = dim.select(xxhash64(col(dimKey)).as("__k"))
      .stat.bloomFilter("__k", expectedDimKeys, fpp)
    val out = new java.io.ByteArrayOutputStream()
    bloom.writeTo(out)
    val pruned = fact.filter(
      call_function("graft_bloom_contains", xxhash64(col(factKey)), lit(out.toByteArray)))
    pruned.join(dim, pruned(factKey) === dim(dimKey))
  }
}
