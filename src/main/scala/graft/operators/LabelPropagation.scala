package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Synchronous label-propagation community detection (Raghavan et al.
  * 2007) with two determinism pins so another engine can replay it
  * round-for-round:
  *
  *  - every node votes its OWN current label alongside its neighbors'
  *    (the standard self-vote variant — also damps the 2-cycle
  *    oscillation plain synchronous LPA exhibits on bipartite graphs);
  *  - argmax is total-ordered: highest vote count, then SMALLEST label
  *    (ties on count are common in early rounds, so the tie-break is
  *    part of the algorithm's contract here, not a detail).
  *
  * Each round is one keyed join (edges ⋈ labels on src), a partial+final
  * count aggregation on (node, label), and a per-node top-1 window — the
  * q141 PageRank dataflow shape, so the same 100 TB properties hold:
  * everything shuffles on node id, nothing is ever driver-resident, and
  * per-round `localCheckpoint` keeps the plan flat across iterations.
  * Integer-only state: no floating point anywhere, results hash-exact.
  */
object LabelPropagation {

  /** @param edges directed (src, dst) pairs — pass both directions for
    *              an undirected graph (the caller owns orientation)
    * @param checkpointDir durable round boundaries ([[graft.core.Durable]]):
    *   `None` = ephemeral `localCheckpoint`; `Some(dir)` = parquet
    *   rounds, surviving executor loss on a long 100 TB run.
    *   LabelPropagationSpec pins durable ≡ ephemeral.
    * @return (id, label) with label = the community exemplar (an id)
    */
  def run(edges: DataFrame, iterations: Int,
          checkpointDir: Option[String] = None): DataFrame = {
    def mat(df: DataFrame, tag: String): DataFrame =
      graft.core.Durable.materialize(df, checkpointDir, tag)
    // Materialize the edge list once: it re-enters the join EVERY round,
    // and an expensive upstream derivation (the q141/q165 graphs are a
    // fact-table join + distinct) would otherwise recompute per round.
    val e = mat(edges.select(col("src"), col("dst")), "edges")
    var labels = mat(
      e.select(col("src").as("id"))
        .union(e.select(col("dst").as("id")))
        .distinct()
        .withColumn("label", col("id")),
      "labels0")
    val byVotes = Window.partitionBy("id").orderBy(col("n").desc, col("label").asc)
    for (round <- 1 to iterations) {
      val neighborVotes = e.join(labels, e("src") === labels("id"))
        .select(e("dst").as("id"), col("label"))
      val votes = neighborVotes.unionByName(labels.select(col("id"), col("label")))
      labels = mat(
        votes.groupBy(col("id"), col("label"))
          .agg(count(lit(1)).as("n"))
          .withColumn("rn", row_number().over(byVotes))
          .filter(col("rn") === 1)
          .select(col("id"), col("label")),
        s"labels$round")
    }
    labels
  }
}
