package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-checked driver queries for the transactional table.
  *
  * q76 runs a REAL MERGE round trip — init a TxTable from a deterministic
  * base slice of `orders`, upsert a deterministic update slice (updated
  * rows double their price; new keys insert), read the committed result
  * back — and DuckDB recomputes the same upsert relationally. This is the
  * write path the curation pipeline's incremental mode rides, so it gets a
  * hash-checked CORRECTNESS row like every read operator, not just specs.
  *
  * The table lives in a fresh temp dir per invocation (MERGE is a mutation;
  * reusing a dir across verify/bench repeats would compound). Invocations
  * reap all but the few most-recent dirs (the returned frame reads its
  * table lazily, so the newest dirs must outlive their consumers) and a
  * shutdown hook reaps the rest — disk use stays bounded at a handful of
  * tables however many times the battery repeats.
  */
object TxQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // MERGE upsert: base = every 3rd order key, updates = every 2nd
    // (overlap → matched/replace, rest → insert). Doubling the price is an
    // exact double op, so no rounding is needed on either side.
    "q76_txtable_merge" -> { (s, dir) =>
      val orders = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      // Leased for the whole init→merge→read body (the ScratchDirs
      // contract): however many invocations overlap, this dir cannot be
      // reaped mid-MERGE; released once the frame is decoupled.
      val tableDir = graft.core.ScratchDirs.lease("graft-txtable-q")
      try {
        TxTable.init(s, tableDir, orders.filter(col("o_orderkey") % 3 === 0))
        val updates = orders.filter(col("o_orderkey") % 2 === 0)
          .withColumn("o_totalprice", col("o_totalprice") * 2)
        val stats = TxTable.merge(s, tableDir, updates, Seq("o_orderkey"))
        require(stats.version == 2L, s"expected merge to commit version 2, got $stats")
        // Eager localCheckpoint decouples the returned frame from tableDir's
        // files — after release, later invocations may reap the dir without
        // breaking unconsumed frames (the table is ~10k skinny rows here;
        // the real TxTable read path stays lazy).
        TxTable.read(s, tableDir).localCheckpoint(true).orderBy("o_orderkey")
      } finally graft.core.ScratchDirs.release(tableDir)
    }
  )

  val oracles: Map[String, String] = Map(
    "q76_txtable_merge" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice
        |  FROM orders WHERE o_orderkey % 3 = 0),
        |upd AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice * 2 AS o_totalprice
        |  FROM orders WHERE o_orderkey % 2 = 0)
        |SELECT * FROM upd
        |UNION ALL
        |SELECT * FROM base
        |WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd)
        |ORDER BY o_orderkey""".stripMargin
  )
}
