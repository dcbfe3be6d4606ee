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
    },

    // Change data feed across a real commit history: init (v1) → MERGE
    // (v2, every 2nd key upserted at doubled price) → DELETE (v3, every
    // 5th key dropped), then `TxTable.changes(v1 → v3)` classifies every
    // key via time travel — inserts (new %2 keys that survived the
    // delete), updates (%6 keys whose price doubled), deletes (%15
    // keys), unchanged (%3 keys the merge never touched). The oracle
    // replays the same three commits relationally and classifies by
    // VALUE comparison, exactly like the engine (so a key whose doubled
    // price equals its old one — price 0 — would agree as `unchanged`
    // on both sides rather than ride an arithmetic shortcut).
    "q146_txtable_changes" -> { (s, dir) =>
      val orders = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val tableDir = graft.core.ScratchDirs.lease("graft-txcdf-q")
      try {
        TxTable.init(s, tableDir, orders.filter(col("o_orderkey") % 3 === 0))
        val updates = orders.filter(col("o_orderkey") % 2 === 0)
          .withColumn("o_totalprice", col("o_totalprice") * 2)
        TxTable.merge(s, tableDir, updates, Seq("o_orderkey"))
        TxTable.delete(s, tableDir, "o_orderkey % 5 = 0")
        val v = TxTable.currentVersion(s, tableDir)
        require(v == 3L, s"expected init+merge+delete to land at version 3, got $v")
        TxTable.changes(s, tableDir, fromVersion = 1L, toVersion = 3L,
          keyCols = Seq("o_orderkey"))
          .localCheckpoint(true)
          .orderBy("o_orderkey")
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
        |ORDER BY o_orderkey""".stripMargin,

    "q146_txtable_changes" ->
      """WITH v1 AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice
        |  FROM orders WHERE o_orderkey % 3 = 0),
        |upd AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice * 2 AS o_totalprice
        |  FROM orders WHERE o_orderkey % 2 = 0),
        |v2 AS (
        |  SELECT * FROM upd
        |  UNION ALL
        |  SELECT * FROM v1
        |  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd)),
        |v3 AS (SELECT * FROM v2 WHERE o_orderkey % 5 <> 0)
        |SELECT coalesce(v3.o_orderkey, v1.o_orderkey) AS o_orderkey,
        |  CASE WHEN v1.o_orderkey IS NULL THEN 'insert'
        |       WHEN v3.o_orderkey IS NULL THEN 'delete'
        |       WHEN v1.o_custkey = v3.o_custkey
        |         AND v1.o_totalprice = v3.o_totalprice THEN 'unchanged'
        |       ELSE 'update' END AS change_type,
        |  coalesce(v3.o_custkey, v1.o_custkey) AS o_custkey,
        |  coalesce(v3.o_totalprice, v1.o_totalprice) AS o_totalprice
        |FROM v1 FULL JOIN v3 ON v1.o_orderkey = v3.o_orderkey
        |ORDER BY o_orderkey""".stripMargin
  )
}
