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
    // GDPR/right-to-be-forgotten propagation — the governance composite:
    // ingest events into a TxTable, transactionally DELETE an erasure
    // cohort (user_id % 7 = 0), then VACUUM so the pre-delete version is
    // physically expunged, not merely superseded (time travel to it must
    // FAIL afterwards — that is the compliance property). The booleans
    // ride as columns under the hash gate: history shape
    // (init → delete), pre-vacuum time travel still seeing the full
    // table, post-vacuum expungement. DuckDB recomputes the surviving
    // per-type profile relationally.
    "q202_gdpr_delete" -> { (s, dir) =>
      val ev = t(s, dir, "events").select("event_id", "user_id", "event_type")
      val tableDir = graft.core.ScratchDirs.lease("graft-gdpr-q")
      try {
        TxTable.init(s, tableDir, ev)
        TxTable.delete(s, tableDir, "user_id % 7 = 0")
        val historyOk =
          TxTable.history(s, tableDir).map(_.operation) == Seq("init", "delete")
        val timeTravelOk =
          TxTable.readVersion(s, tableDir, 1L).count() == ev.count()
        TxTable.vacuum(s, tableDir, keep = 1, graceMs = 0L)
        // Catch ONLY the typed expungement signal: a blanket Throwable
        // would let an unrelated failure (FS error, OOM, interrupt) pass
        // the compliance boolean vacuously.
        val expungedOk =
          try { TxTable.readVersion(s, tableDir, 1L).count(); false }
          catch { case _: TxTable.VacuumedVersionException => true }
        TxTable.read(s, tableDir)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_events"),
            countDistinct(col("user_id")).as("n_users"))
          .withColumn("history_ok", lit(historyOk))
          .withColumn("time_travel_ok", lit(timeTravelOk))
          .withColumn("expunged_ok", lit(expungedOk))
          .localCheckpoint(true)
          .orderBy("event_type")
      } finally graft.core.ScratchDirs.release(tableDir)
    },

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
        // v4 EVOLVES the schema mid-history: every 7th key upserted with
        // a new o_band column (reinserting some deleted keys). The feed
        // then crosses the evolution boundary and must read at the POST
        // schema (Delta-CDF contract): pre rows null-fill o_band, so a
        // key whose only change is the new column populating classifies
        // as 'update', and deletes carry a null o_band pre image.
        val evolved = orders.filter(col("o_orderkey") % 7 === 0)
          .withColumn("o_band", (col("o_orderkey") % 4).cast("long"))
        TxTable.merge(s, tableDir, evolved, Seq("o_orderkey"),
          allowSchemaEvolution = true)
        val v = TxTable.currentVersion(s, tableDir)
        require(v == 4L, s"expected init+merge+delete+merge to land at version 4, got $v")
        TxTable.changes(s, tableDir, fromVersion = 1L, toVersion = 4L,
          keyCols = Seq("o_orderkey"), allowSchemaEvolution = true)
          .localCheckpoint(true)
          .orderBy("o_orderkey")
      } finally graft.core.ScratchDirs.release(tableDir)
    },

    // SCD Type 2 dimension history across three REAL transactional
    // batches: init = even customer keys with their natural segment
    // (batch 1); batch 2 = full snapshot where %4 keys move to PROMO
    // (odd keys are brand-new → first version opens at 2); batch 3 =
    // full snapshot where %6 keys move to WHOLESALE. Unchanged keys must
    // keep their ORIGINAL valid_from (no churn), changed keys close at
    // the batch id and reopen, and exactly one row per key is current.
    // The oracle replays the three snapshots relationally and collapses
    // consecutive equal segments into the same validity intervals.
    "q164_scd2_merge" -> { (s, dir) =>
      def seg2 = when(col("c_custkey") % 4 === 0, lit("PROMO"))
        .otherwise(col("c_mktsegment"))
      def seg3 = when(col("c_custkey") % 6 === 0, lit("WHOLESALE"))
        .otherwise(seg2)
      val cust = t(s, dir, "customer").select(col("c_custkey"), col("c_mktsegment"))
      val tableDir = graft.core.ScratchDirs.lease("graft-scd2-q")
      try {
        Scd2.init(s, tableDir,
          cust.filter(col("c_custkey") % 2 === 0)
            .withColumnRenamed("c_mktsegment", "segment"),
          batchId = 1L)
        val s2 = Scd2.merge(s, tableDir,
          cust.select(col("c_custkey"), seg2.as("segment")),
          Seq("c_custkey"), batchId = 2L)
        require(s2.version == 2L, s"batch 2 should commit version 2, got $s2")
        val s3 = Scd2.merge(s, tableDir,
          cust.select(col("c_custkey"), seg3.as("segment")),
          Seq("c_custkey"), batchId = 3L)
        require(s3.version == 3L, s"batch 3 should commit version 3, got $s3")
        TxTable.read(s, tableDir).localCheckpoint(true)
          .orderBy("c_custkey", "valid_from")
      } finally graft.core.ScratchDirs.release(tableDir)
    },

    // Point-in-time join against the q164 history: each order is stamped
    // with a deterministic as-of batch (1 + o_orderkey % 3) and picks
    // the segment valid THEN — orders dated before their customer's
    // first version (odd keys at batch 1) resolve to '(none)'. Revenue
    // by then-current segment is the classic temporal-BI rollup.
    "q166_scd2_pointintime" -> { (s, dir) =>
      def seg2 = when(col("c_custkey") % 4 === 0, lit("PROMO"))
        .otherwise(col("c_mktsegment"))
      def seg3 = when(col("c_custkey") % 6 === 0, lit("WHOLESALE"))
        .otherwise(seg2)
      val cust = t(s, dir, "customer").select(col("c_custkey"), col("c_mktsegment"))
      val tableDir = graft.core.ScratchDirs.lease("graft-scd2-pit-q")
      try {
        Scd2.init(s, tableDir,
          cust.filter(col("c_custkey") % 2 === 0)
            .withColumnRenamed("c_mktsegment", "segment"),
          batchId = 1L)
        Scd2.merge(s, tableDir,
          cust.select(col("c_custkey"), seg2.as("segment")),
          Seq("c_custkey"), batchId = 2L)
        Scd2.merge(s, tableDir,
          cust.select(col("c_custkey"), seg3.as("segment")),
          Seq("c_custkey"), batchId = 3L)
        val facts = t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey").as("c_custkey"),
            col("o_totalprice"), (lit(1L) + col("o_orderkey") % 3).as("as_of"))
        Scd2.asOf(facts, TxTable.read(s, tableDir), Seq("c_custkey"), "as_of")
          .groupBy(coalesce(col("segment"), lit("(none)")).as("segment"))
          .agg(count(lit(1)).as("n_orders"),
            round(sum(col("o_totalprice")), 2).as("revenue"))
          .orderBy("segment")
          .localCheckpoint(true)
      } finally graft.core.ScratchDirs.release(tableDir)
    },

    // Zone-map pruning diagnostic: would Z-ordering this table by
    // (l_partkey, l_suppkey) beat the linear (partkey, suppkey) sort for
    // a mixed predicate workload? 32 exact-quantile "files" per layout,
    // 16 equal-width range predicates per column; the answer is the
    // fraction of files a min/max-stats scan reads. Expected shape:
    // linear prunes partkey predicates almost perfectly and suppkey
    // predicates not at all; z-order prunes BOTH at an intermediate
    // rate — the quantified version of the OPTIMIZE ZORDER BY pitch.
    "q167_zonemap_prune" -> { (s, dir) =>
      ZoneMaps.diagnostic(t(s, dir, "lineitem"), "l_partkey", "l_suppkey",
        files = 32, preds = 16)
    },

    // Incremental materialized view: per-customer order stats built from
    // three insert-only delta batches (orderkey mod 3) folded into the
    // stored partials — each increment aggregates ONLY its batch and
    // merges only its groups. The oracle recomputes the view from the
    // full base in one pass: integer (cents) partials make incremental ≡
    // full-recompute exact, which is precisely the claim under test.
    "q168_incremental_mview" -> { (s, dir) =>
      val viewDir = graft.core.ScratchDirs.lease("graft-mview-q")
      try {
        def batch(i: Int) = t(s, dir, "orders")
          .filter(col("o_orderkey") % 3 === i)
          .select(col("o_custkey"),
            round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
        Mview.init(s, viewDir, batch(0), Seq("o_custkey"), Seq("cents"))
        Mview.increment(s, viewDir, batch(1), Seq("o_custkey"), Seq("cents"))
        Mview.increment(s, viewDir, batch(2), Seq("o_custkey"), Seq("cents"))
        Mview.read(s, viewDir).localCheckpoint(true).orderBy("o_custkey")
      } finally graft.core.ScratchDirs.release(viewDir)
    }
  )

  val oracles: Map[String, String] = Map(
    "q202_gdpr_delete" ->
      """SELECT event_type,
        |  count(*)::BIGINT AS n_events,
        |  count(DISTINCT user_id)::BIGINT AS n_users,
        |  true AS history_ok, true AS time_travel_ok, true AS expunged_ok
        |FROM events WHERE user_id % 7 != 0
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

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
        |v3 AS (SELECT * FROM v2 WHERE o_orderkey % 5 <> 0),
        |upd4 AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice,
        |    CAST(o_orderkey % 4 AS BIGINT) AS o_band
        |  FROM orders WHERE o_orderkey % 7 = 0),
        |v4 AS (
        |  SELECT * FROM upd4
        |  UNION ALL
        |  SELECT o_orderkey, o_custkey, o_totalprice, CAST(NULL AS BIGINT) AS o_band
        |  FROM v3 WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd4))
        |SELECT coalesce(v4.o_orderkey, v1.o_orderkey) AS o_orderkey,
        |  CASE WHEN v1.o_orderkey IS NULL THEN 'insert'
        |       WHEN v4.o_orderkey IS NULL THEN 'delete'
        |       WHEN v1.o_custkey IS NOT DISTINCT FROM v4.o_custkey
        |         AND v1.o_totalprice IS NOT DISTINCT FROM v4.o_totalprice
        |         AND v4.o_band IS NULL THEN 'unchanged'
        |       ELSE 'update' END AS change_type,
        |  coalesce(v4.o_custkey, v1.o_custkey) AS o_custkey,
        |  coalesce(v4.o_totalprice, v1.o_totalprice) AS o_totalprice,
        |  v4.o_band AS o_band
        |FROM v1 FULL JOIN v4 ON v1.o_orderkey = v4.o_orderkey
        |ORDER BY o_orderkey""".stripMargin,

    // Replays the three snapshots and collapses consecutive equal
    // segments per key: a version opens at the first batch that carries
    // its value (keys absent from batch 1 simply have no batch-1 row, so
    // their first version opens at 2 — same "no delete semantics" rule
    // as the engine). valid_to is the next version's valid_from.
    "q164_scd2_merge" ->
      """WITH b1 AS (
        |  SELECT c_custkey, c_mktsegment AS segment, 1 AS b
        |  FROM customer WHERE c_custkey % 2 = 0),
        |b2 AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_custkey % 4 = 0 THEN 'PROMO' ELSE c_mktsegment END AS segment,
        |    2 AS b
        |  FROM customer),
        |b3 AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_custkey % 6 = 0 THEN 'WHOLESALE'
        |         WHEN c_custkey % 4 = 0 THEN 'PROMO'
        |         ELSE c_mktsegment END AS segment,
        |    3 AS b
        |  FROM customer),
        |timeline AS (
        |  SELECT * FROM b1 UNION ALL SELECT * FROM b2 UNION ALL SELECT * FROM b3),
        |chg AS (
        |  SELECT c_custkey, segment, b,
        |    lag(segment) OVER (PARTITION BY c_custkey ORDER BY b) AS prev
        |  FROM timeline),
        |vers AS (
        |  SELECT c_custkey, segment, b::BIGINT AS valid_from FROM chg
        |  WHERE prev IS NULL OR prev <> segment)
        |SELECT c_custkey, segment, valid_from,
        |  lead(valid_from) OVER (PARTITION BY c_custkey ORDER BY valid_from)
        |    AS valid_to,
        |  lead(valid_from) OVER (PARTITION BY c_custkey ORDER BY valid_from)
        |    IS NULL AS is_current
        |FROM vers
        |ORDER BY c_custkey, valid_from""".stripMargin,

    // Same snapshot replay as q164, then the interval join: the version
    // whose [valid_from, valid_to) contains the order's as-of batch.
    "q166_scd2_pointintime" ->
      """WITH b1 AS (
        |  SELECT c_custkey, c_mktsegment AS segment, 1 AS b
        |  FROM customer WHERE c_custkey % 2 = 0),
        |b2 AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_custkey % 4 = 0 THEN 'PROMO' ELSE c_mktsegment END AS segment,
        |    2 AS b
        |  FROM customer),
        |b3 AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_custkey % 6 = 0 THEN 'WHOLESALE'
        |         WHEN c_custkey % 4 = 0 THEN 'PROMO'
        |         ELSE c_mktsegment END AS segment,
        |    3 AS b
        |  FROM customer),
        |timeline AS (
        |  SELECT * FROM b1 UNION ALL SELECT * FROM b2 UNION ALL SELECT * FROM b3),
        |chg AS (
        |  SELECT c_custkey, segment, b,
        |    lag(segment) OVER (PARTITION BY c_custkey ORDER BY b) AS prev
        |  FROM timeline),
        |vers AS (
        |  SELECT c_custkey, segment, b::BIGINT AS valid_from,
        |    lead(b::BIGINT) OVER (PARTITION BY c_custkey ORDER BY b) AS valid_to
        |  FROM chg WHERE prev IS NULL OR prev <> segment),
        |facts AS (
        |  SELECT o_orderkey, o_custkey AS c_custkey, o_totalprice,
        |    1 + o_orderkey % 3 AS as_of
        |  FROM orders)
        |SELECT coalesce(v.segment, '(none)') AS segment,
        |  count(*)::BIGINT AS n_orders,
        |  round(sum(f.o_totalprice), 2) AS revenue
        |FROM facts f
        |LEFT JOIN vers v ON v.c_custkey = f.c_custkey
        |  AND v.valid_from <= f.as_of
        |  AND (v.valid_to IS NULL OR f.as_of < v.valid_to)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q167_zonemap_prune" -> ZoneMaps.diagnosticOracle(files = 32, preds = 16),

    // One-pass full recompute — equality against the three-batch
    // incremental path is the maintenance-correctness gate.
    "q168_incremental_mview" ->
      """SELECT o_custkey, count(*)::BIGINT AS n_rows,
        |  sum(round(o_totalprice * 100)::BIGINT)::BIGINT AS sum_cents
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
