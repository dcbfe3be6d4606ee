package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Recursive hierarchy resolution — root and depth for every node of a
  * parent-pointer forest — the `WITH RECURSIVE` surface Spark SQL lacks
  * (org charts, BOM explosions, category trees, reply threads; the
  * reference's relational layer has no recursion either, so this is the
  * corpus-scale generalization of its lookup joins).
  *
  * A naive iterative join walks one parent level per round: O(depth)
  * rounds, fatal when a reply chain or a category path is thousands
  * deep. This implementation does POINTER DOUBLING (pointer jumping):
  * the state frame carries, per node, its current known ancestor and
  * the walked distance; each round every node jumps to its ancestor's
  * ancestor, doubling the resolved horizon — O(log depth) rounds, each
  * one keyed self-join on the ancestor id (an equi-shuffle Catalyst
  * plans like any join; nothing is ever collected). Roots are modelled
  * as self-parents, which makes the jump UNIFORM: a finished node joins
  * the root's own fixpoint row `(root, root, 0)` and is unchanged — no
  * special-casing, no filter asymmetry for AQE to fight.
  *
  * Round boundaries materialize in the two KCore modes: ephemeral
  * `localCheckpoint` by default, durable parquet under `checkpointDir`
  * for the 100-TB run where an executor loss must not restart the whole
  * walk. Convergence (every node anchored at a root) is ASSERTED after
  * the cap, so an under-provisioned `maxRounds` fails loudly instead of
  * returning partial ancestors; forest damage (a parent id with no node
  * row — the inner jump join would silently drop the child) is likewise
  * asserted via the per-round row-count invariant.
  */
object Hierarchy {

  /** `(node, root, depth)` for every node of the forest `nodes`
    * (columns `node`, `parent`; a root is its own parent). `maxRounds`
    * bounds pointer-doubling rounds, so depths up to `2^maxRounds`
    * resolve; convergence within the cap is asserted.
    */
  def rootAndDepth(nodes: DataFrame, maxRounds: Int,
      checkpointDir: Option[String] = None): DataFrame = {
    require(maxRounds >= 1, s"maxRounds must be >= 1, got $maxRounds")
    val spark = nodes.sparkSession

    def materialize(df: DataFrame, tag: String): DataFrame = checkpointDir match {
      case None => df.localCheckpoint()
      case Some(d) =>
        val path = s"$d/$tag"
        df.write.mode("overwrite").parquet(path)
        spark.read.parquet(path)
    }

    // State: (node, anc, dist, at_root). anc is a walked-to ancestor,
    // dist the exact edge count to it; at_root marks anc being a root
    // (for roots themselves: anc = node, dist = 0, done immediately).
    var state = materialize(
      nodes.select(
        col("node").cast("long").as("node"),
        col("parent").cast("long").as("parent"))
        .select(
          col("node"),
          when(col("node") === col("parent"), col("node"))
            .otherwise(col("parent")).as("anc"),
          when(col("node") === col("parent"), lit(0L)).otherwise(lit(1L)).as("dist"),
          (col("node") === col("parent")).as("at_root")),
      "round0")
    val n0 = state.count()

    var round = 0
    var pending = 1L
    while (round < maxRounds && pending > 0) {
      round += 1
      // Jump: every node adopts its ancestor's ancestor and inherits its
      // ancestor's at_root verdict. A root's row is its own fixpoint, so
      // the inner join is total on an intact forest.
      val anc = state.select(
        col("node").as("j_node"), col("anc").as("j_anc"),
        col("dist").as("j_dist"), col("at_root").as("j_at_root"))
      state = materialize(
        state.join(anc, state("anc") === anc("j_node"))
          .select(col("node"), col("j_anc").as("anc"),
            (col("dist") + col("j_dist")).as("dist"),
            col("j_at_root").as("at_root")),
        s"round$round")
      val agg = state.agg(
        count(lit(1)).as("n"),
        sum(when(col("at_root"), 0L).otherwise(1L)).as("pending"))
        .head()
      require(agg.getLong(0) == n0,
        s"hierarchy jump dropped rows (${agg.getLong(0)} of $n0 after round $round) — " +
          "a parent id has no node row; the input is not a forest")
      pending = agg.getLong(1)
    }
    require(pending == 0L,
      s"hierarchy did not resolve within $maxRounds doubling rounds " +
        s"($pending nodes still unanchored) — raise maxRounds (covers depth 2^rounds)")
    state.select(col("node"), col("anc").as("root"), col("dist").as("depth"))
  }
}
