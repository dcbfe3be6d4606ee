package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting via degree-ordered wedge joins — the
  * classic graph-analytics kernel (and the building block of clustering
  * coefficients and community features) in its shuffle-safe form.
  *
  * The naive 3-way self-join of the undirected edge list explodes on hub
  * nodes: a degree-d node contributes d² wedge candidates, and real
  * graphs have d ≫ √m hubs. The standard fix (public literature:
  * Schank/Wagner 2005, Suri/Vassilvitskii 2011) orients every edge from
  * its lower-ranked endpoint under the total order (degree, id): every
  * node's OUT-degree is then O(√m) regardless of its raw degree —
  * a hub's edges all point AT it, so the hub generates no wedges.
  * Wedges (two out-edges of one node, ordered) equi-join the oriented
  * edge list once to close triangles; every triangle is counted exactly
  * once because its three vertices have exactly one (deg, id)-ordering.
  *
  * Node ids must fit in 31 bits (the orientation key packs degree and
  * id into one long); callers with wider ids hash them first.
  */
object Triangles {

  /** One-row global census of the undirected simple graph induced by
    * `edges` (self-loops dropped, directions and duplicates collapsed):
    * `n_edges`, `n_wedges` (open two-paths, Σ C(deg, 2)),
    * `n_triangles`, and the global clustering coefficient
    * `3·triangles / wedges` (6 dp).
    */
  def globalCount(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    // Canonical undirected edge set; materialized once — the degree
    // aggregate and two join sides below all read these blocks.
    val canon = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b") && col("a").isNotNull && col("b").isNotNull)
      .distinct()
      .localCheckpoint()

    val deg = canon.select(explode(array(col("a"), col("b"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))

    // Orient by the packed (degree, id) total order. Materialized: the
    // wedge self-join and the closing join read it three times.
    val oriented = canon
      .join(deg.select(col("node").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("db")), "b")
      .withColumn("orda", expr("shiftleft(da, 32) + a"))
      .withColumn("ordb", expr("shiftleft(db, 32) + b"))
      .select(
        when(col("orda") < col("ordb"), col("a")).otherwise(col("b")).as("src"),
        when(col("orda") < col("ordb"), col("b")).otherwise(col("a")).as("dst"),
        greatest(col("orda"), col("ordb")).as("dstOrd"))
      .localCheckpoint()

    val e1 = oriented.select(col("src"), col("dst").as("x"), col("dstOrd").as("xOrd"))
    val e2 = oriented.select(col("src"), col("dst").as("y"), col("dstOrd").as("yOrd"))
    val wedges = e1.join(e2, Seq("src")).filter(col("xOrd") < col("yOrd"))
    // The closing edge between x and y, if present, is oriented x→y
    // exactly because ord(x) < ord(y) — one equi-join, no disjunction.
    val triangles = wedges
      .join(oriented.select(col("src").as("x"), col("dst").as("y")), Seq("x", "y"))
      .agg(count(lit(1)).as("n_triangles"))

    canon.agg(count(lit(1)).as("n_edges"))
      .crossJoin(deg.agg(
        sum(expr("(deg * (deg - 1)) div 2")).as("n_wedges")))
      .crossJoin(triangles)
      .withColumn("clustering",
        round(lit(3.0) * col("n_triangles") / col("n_wedges").cast("double"), 6))
  }
}
