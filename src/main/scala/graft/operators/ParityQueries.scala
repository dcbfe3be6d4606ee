package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.gold.Gold
import graft.sources.Tables

/** Oracle-checked queries exercising every relational operator from
  * SURVEY.md §2 (T1-T10, D1, A1-A7, S7) over the standard test tables, plus
  * the gold-layer surface (window aggregation, broadcast dim joins, top-k)
  * a consumer of the silver output runs downstream.
  *
  * Conventions (driver compare contract): aggregate/computed columns carry
  * identical aliases on the Spark and SQL sides; float aggregates are
  * rounded in-query on both sides; every query has a deterministic ORDER BY
  * (insurance — the driver also sorts).
  */
object ParityQueries {

  /** Relational contract of `StatefulOps.matchPattern` for the
    * view→click→purchase / 24h instance — the greedy chain as three
    * chained min-joins. Shared verbatim by q198 (batch) and q199 (the
    * streaming run, StreamingQueries): one oracle, two execution modes.
    */
  private[graft] val patternMatchOracle: String =
    """WITH e AS (SELECT user_id, ts::TIMESTAMP ts, event_type FROM events),
      |s1 AS (SELECT user_id, min(ts) t1 FROM e WHERE event_type = 'view' GROUP BY 1),
      |s2 AS (SELECT e.user_id, min(ts) t2 FROM e JOIN s1 USING (user_id)
      |       WHERE event_type = 'click' AND ts > t1 GROUP BY 1),
      |s3 AS (SELECT e.user_id, min(ts) t3 FROM e JOIN s2 USING (user_id)
      |       WHERE event_type = 'purchase' AND ts > t2 GROUP BY 1)
      |SELECT s1.user_id, t1 AS t_start, t3 AS t_end,
      |  CAST(floor(epoch(t3 - t1)) AS BIGINT) AS span_seconds
      |FROM s1 JOIN s2 USING (user_id) JOIN s3 USING (user_id)
      |WHERE t3 <= t1 + INTERVAL 24 HOUR
      |ORDER BY user_id""".stripMargin

  /** Relational contract of `StatefulOps.patternOutcomes`: stage mins
    * are WINDOW-scoped (each ≤ anchor + 24h), one outcome per anchored
    * user. Shared by q203 (batch) and q204 (streaming with event-time
    * timeouts) — every anchor's deadline precedes max(ts) by ≥14 days at
    * both SFs, so the streaming emission set is complete and identical.
    */
  private[graft] val patternOutcomeOracle: String =
    """WITH e AS (SELECT user_id, ts::TIMESTAMP ts, event_type FROM events),
      |s1 AS (SELECT user_id, min(ts) t1 FROM e WHERE event_type = 'view' GROUP BY 1),
      |s2 AS (SELECT e.user_id, min(ts) t2 FROM e JOIN s1 USING (user_id)
      |       WHERE event_type = 'click' AND ts > t1
      |         AND ts <= t1 + INTERVAL 24 HOUR GROUP BY 1),
      |s3 AS (SELECT e.user_id, min(e.ts) t3 FROM e
      |       JOIN s2 USING (user_id) JOIN s1 USING (user_id)
      |       WHERE event_type = 'purchase' AND e.ts > t2
      |         AND e.ts <= t1 + INTERVAL 24 HOUR GROUP BY 1)
      |SELECT s1.user_id, t1 AS t_start,
      |  1 + (t2 IS NOT NULL)::INT + (t3 IS NOT NULL)::INT AS stage_reached,
      |  t3 IS NOT NULL AS matched
      |FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
      |ORDER BY user_id""".stripMargin

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** events with nulls planted deterministically (the test tables ship
    * null-free): value→null where value<5, props→null on error events.
    * Shared base for the null-handling and profiling queries.
    */
  private def nullifiedEvents(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("value",
        when(col("value") < 5, lit(null).cast("double")).otherwise(col("value")))
      .withColumn("props",
        when(col("event_type") === "error", lit(null).cast("string")).otherwise(col("props")))

  private val nullifiedEventsSql =
    """SELECT event_id, ts::TIMESTAMP AS ts, user_id, event_type,
      |  CASE WHEN value < 5 THEN NULL ELSE value END AS value,
      |  CASE WHEN event_type = 'error' THEN NULL ELSE props END AS props
      |FROM events""".stripMargin

  /** Shared clean-names frame for the fuzzy family (q143/q149/q155):
    * every customer key as a 32-hex md5 string.
    */
  private def fuzzyBase(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .select(col("c_custkey").cast("long").as("k"),
        expr("md5(cast(c_custkey as string))").as("b"))

  /** q143/q155's planted dirty batch over [[fuzzyBase]] — ONE definition
    * (plus the [[fuzzyPlantSql]] twin below) so a change to the splice
    * arithmetic can never desynchronize a query from its oracle:
    * substitution (k%3=0, dist 1), deletion (k%3=1, dist 1 and length
    * 31 — the cross-length probe), double substitution (k%3=2, dist 2),
    * no-match decoy (k%10=0, an unrelated md5).
    */
  private def plantedVariants(c: DataFrame): DataFrame = {
    val subst = c.filter(col("k") % 3 === 0).selectExpr(
      "k + 1000000 AS variant_id",
      "concat(substring(b, 1, cast(k % 32 as int)), 'z', " +
        "substring(b, cast(k % 32 as int) + 2, 64)) AS vstr")
    val deletion = c.filter(col("k") % 3 === 1).selectExpr(
      "k + 2000000 AS variant_id",
      "concat(substring(b, 1, cast(k % 32 as int)), " +
        "substring(b, cast(k % 32 as int) + 2, 64)) AS vstr")
    val double = c.filter(col("k") % 3 === 2)
      .selectExpr("k",
        "concat(substring(b, 1, cast(k % 16 as int)), 'z', " +
          "substring(b, cast(k % 16 as int) + 2, 64)) AS s1")
      .selectExpr(
        "k + 3000000 AS variant_id",
        "concat(substring(s1, 1, cast(16 + k % 16 as int)), 'y', " +
          "substring(s1, cast(16 + k % 16 as int) + 2, 64)) AS vstr")
    val decoy = c.filter(col("k") % 10 === 0).selectExpr(
      "k + 4000000 AS variant_id",
      "md5(cast(k + 7000000 as string)) AS vstr")
    subst.unionByName(deletion).unionByName(double).unionByName(decoy)
  }

  /** SQL twin of [[fuzzyBase]] + [[plantedVariants]]: CTEs `c` (k, b)
    * and `var` (variant_id, vstr). Deliberately NOT pre-stripped: the
    * consumers interpolate it into their own stripMargin strings, and a
    * double strip would eat the leading `|` of the `||` concat
    * operators on continuation lines.
    */
  private val fuzzyPlantSql =
    """c AS (
      |  SELECT c_custkey AS k, md5(c_custkey::VARCHAR) AS b FROM customer),
      |sub1 AS (
      |  SELECT k, substr(b, 1, (k % 16)::INT) || 'z'
      |    || substr(b, (k % 16)::INT + 2) AS s1
      |  FROM c WHERE k % 3 = 2),
      |var AS (
      |  SELECT k + 1000000 AS variant_id,
      |    substr(b, 1, (k % 32)::INT) || 'z'
      |      || substr(b, (k % 32)::INT + 2) AS vstr
      |  FROM c WHERE k % 3 = 0
      |  UNION ALL
      |  SELECT k + 2000000,
      |    substr(b, 1, (k % 32)::INT) || substr(b, (k % 32)::INT + 2)
      |  FROM c WHERE k % 3 = 1
      |  UNION ALL
      |  SELECT k + 3000000,
      |    substr(s1, 1, (16 + k % 16)::INT) || 'y'
      |      || substr(s1, (16 + k % 16)::INT + 2)
      |  FROM sub1
      |  UNION ALL
      |  SELECT k + 4000000, md5((k + 7000000)::VARCHAR)
      |  FROM c WHERE k % 10 = 0)"""

  /** SQL twin of [[ShuffleShard.hexLong]]: Σ (strpos−1)·16^k over the
    * first `digits` hex chars of expression `e` — one definition
    * generates every width so engine and oracle cannot drift.
    */
  private def hexSql(e: String, digits: Int): String =
    (0 until digits).map(i =>
      s"(strpos('0123456789abcdef', substr($e, ${i + 1}, 1)) - 1)::BIGINT" +
        s" * ${1L << (4 * (digits - 1 - i))}"
    ).mkString("(", " + ", ")")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // T1: column-name normalization (transformer.py:95-112) as a projection
    // rename — "Order Key"→order_key, " Quantity (units) "→quantity_units,
    // "Return-Flag"→returnflag.
    "q2_clean_names" -> { (s, dir) =>
      val dirty = t(s, dir, "lineitem")
        .filter(col("l_orderkey") < 100)
        .select(
          col("l_orderkey").as("Order Key"),
          col("l_quantity").as(" Quantity (units) "),
          col("l_returnflag").as("Return-Flag"))
      Stages.cleanColumnNames(dirty)
        .orderBy("order_key", "quantity_units", "returnflag")
    },

    // T2: drop rows containing any null.
    "q3_null_drop" -> { (s, dir) =>
      val base = nullifiedEvents(s, dir)
      Stages.handleNulls(base, Stages.NullStrategy.Drop, ColumnStats.collect(base))
        .orderBy("event_id")
    },

    // T3: numeric nulls→0, string nulls→"".
    "q4_null_fill" -> { (s, dir) =>
      val base = nullifiedEvents(s, dir)
      Stages.handleNulls(base, Stages.NullStrategy.Fill, ColumnStats.collect(base))
        .orderBy("event_id")
    },

    // T4: append {col}_is_null flags for exactly the columns that contain
    // nulls (data-dependent via the fused ColumnStats aggregate).
    "q5_null_flag" -> { (s, dir) =>
      val base = nullifiedEvents(s, dir)
      Stages.handleNulls(base, Stages.NullStrategy.Flag, ColumnStats.collect(base))
        .orderBy("event_id")
    },

    // D1: full-row distinct over a projection.
    "q6_dedup_distinct" -> { (s, dir) =>
      Stages.deduplicate(
        t(s, dir, "lineitem")
          .select(col("l_returnflag"), col("l_linestatus"),
            year(col("l_shipdate")).as("ship_year")))
        .orderBy("l_returnflag", "l_linestatus", "ship_year")
    },

    // T9: date-keyword string columns → timestamp via try_to_timestamp
    // (null on parse failure ≡ pandas errors="coerce").
    "q7_cast_dates" -> { (s, dir) =>
      val base = t(s, dir, "events")
        .select(col("event_id"), col("ts").cast("string").as("event_time"))
      Stages.castTypes(base, ColumnStats.collect(base)).orderBy("event_id")
    },

    // T10: string column → double iff >80% of values parse (qty_str does,
    // flag_str stays string at parse-rate 0).
    "q8_cast_numeric" -> { (s, dir) =>
      val base = t(s, dir, "lineitem")
        .filter(col("l_orderkey") < 1000)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast("string").as("qty_str"),
          col("l_returnflag").as("flag_str"))
      Stages.castTypes(base, ColumnStats.collect(base))
        .orderBy("l_orderkey", "l_linenumber", "qty_str")
    },

    // T8: _year/_month/_day derived from the first temporal column.
    "q9_derive_partitions" -> { (s, dir) =>
      Stages.deriveFields(t(s, dir, "events").select("event_id", "ts", "value"))
        .select("event_id", "_year", "_month", "_day")
        .orderBy("event_id")
    },

    // T7: xxhash64 row hash — engine-defined hash VALUES, but the hash's
    // contract is oracle-checkable: doubling the input must leave the
    // distinct-hash count at the distinct-ROW count (equal rows hash
    // equally — determinism across scan branches — and unequal rows kept
    // distinct hashes on this data, i.e. no collision). DuckDB computes
    // both counts from row content alone.
    "q10_row_hash" -> { (s, dir) =>
      val base = t(s, dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
      Stages.deriveFields(base.unionAll(base))
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("_row_hash")).as("n_distinct_hashes"))
    },

    // S7: batch-union semantics — outer column alignment by name, missing
    // columns null-filled (pd.concat ≡ unionByName allowMissingColumns).
    "q11_union_by_name" -> { (s, dir) =>
      val o = t(s, dir, "orders").filter(col("o_orderkey") < 500)
      o.select(col("o_orderkey"), col("o_totalprice"))
        .unionByName(
          o.select(col("o_orderkey"), col("o_orderpriority")),
          allowMissingColumns = true)
        .orderBy("o_orderkey", "o_totalprice", "o_orderpriority")
    },

    // A5-A7: profiling counters — row count, per-column null counts, exact
    // distinct count — fused into one aggregate (one scan).
    "q12_profile_stats" -> { (s, dir) =>
      nullifiedEvents(s, dir).agg(
        count(lit(1)).as("n_rows"),
        sum(col("value").isNull.cast("long")).as("value_nulls"),
        sum(col("props").isNull.cast("long")).as("props_nulls"),
        countDistinct(col("event_type")).as("event_type_distinct"),
        countDistinct(col("user_id")).as("user_id_distinct"))
    },

    // A1-A4 via the Gold API over a derived silver frame: daily revenue
    // report grouped on the derived _year/_month/_day partitions.
    "q13_gold_daily" -> { (s, dir) =>
      val silver = Stages.deriveFields(
        t(s, dir, "lineitem").select("l_orderkey", "l_shipdate", "l_quantity", "l_extendedprice"))
      Gold.dailyRevenue(silver, "l_quantity", "l_extendedprice")
        .withColumn("total_revenue", round(col("total_revenue"), 2))
    },

    // Gold: tumbling-window aggregation (1h) over the event stream table.
    "q14_window_hourly" -> { (s, dir) =>
      t(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 2).as("sum_value"))
        .select(col("window.start").as("hour_start"), col("n_events"), col("sum_value"))
        .orderBy("hour_start")
    },

    // Gold: star-schema enrichment — two broadcast dim joins + aggregate.
    "q15_join_enrich" -> { (s, dir) =>
      t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_customers"),
          round(sum(col("c_acctbal")), 2).as("sum_acctbal"))
        .orderBy("r_name", "n_name")
    },

    // Stateful-op semantics, batch-checked: gap-based sessionization via
    // session_window (same operator StreamingIngest.sessionize runs on
    // streams with a watermark).
    "q17_session_window" -> { (s, dir) =>
      graft.streaming.StreamingIngest.sessionize(t(s, dir, "events"), gap = "6 hours")
        .orderBy("user_id", "session_start")
    },

    // Semi-structured data: parse the JSON props column, extract + type
    // a field, aggregate on it (schema-on-read for the nested payload).
    "q53_json_extract" -> { (s, dir) =>
      t(s, dir, "events")
        .withColumn("k",
          get_json_object(col("props"), "$.k").cast("int"))
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("k")).as("sum_k"),
          countDistinct(col("k")).as("distinct_k"))
        .orderBy("event_type")
    },

    // Set operations: INTERSECT / EXCEPT on key projections.
    "q54_set_ops" -> { (s, dir) =>
      val orderCust = t(s, dir, "orders").select(col("o_custkey").as("custkey"))
      val allCust = t(s, dir, "customer").select(col("c_custkey").as("custkey"))
      val withOrders = allCust.intersect(orderCust)
      val withoutOrders = allCust.except(orderCust)
      withOrders.withColumn("has_orders", lit(true))
        .unionByName(withoutOrders.withColumn("has_orders", lit(false)))
        .orderBy("custkey")
    },

    // Semi/anti joins: orders that do/don't contain a returned item.
    "q55_semi_anti" -> { (s, dir) =>
      val returned = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      val orders = t(s, dir, "orders")
      val withReturns = orders
        .join(returned, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .withColumn("has_return", lit(true))
      val withoutReturns = orders
        .join(returned, col("o_orderkey") === col("l_orderkey"), "left_anti")
        .withColumn("has_return", lit(false))
      withReturns.unionByName(withoutReturns)
        .groupBy(col("has_return"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("sum_price"))
        .orderBy("has_return")
    },

    // T11: expression-string rules (the reference's stubbed extension
    // point, powered by Catalyst expr()) — filter + derive + conditional
    // update, declared as data.
    "q44_rules" -> { (s, dir) =>
      Rules.applyAll(t(s, dir, "events"), Seq(
        Rules.FilterRule("recent", "value >= 1.0"),
        Rules.ColumnRule("bucket", "value_bucket",
          "CASE WHEN value < 5 THEN 'low' WHEN value < 20 THEN 'mid' ELSE 'high' END"),
        Rules.WhenRule("cap-errors", "value", "event_type = 'error'", "0.0")))
        .groupBy(col("value_bucket"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
        .orderBy("value_bucket")
    },

    // Point-in-interval range join (bucketized equi-join formulation):
    // every event matched to the 2-hour windows (anchored at every 20th
    // event) containing it, per user. Oracle is the plain inequality
    // join DuckDB can afford at this scale.
    // Salted skew join — the planned fix for a known-hot probe key. The
    // oracle is the PLAIN join: salting must be answer-preserving (salt
    // column dropped, each probe row matched exactly once because every
    // (key, salt) pair exists exactly once on the replicated build side).
    "q67_salted_join" -> { (s, dir) =>
      val li = t(s, dir, "lineitem")
        .select(col("l_suppkey").as("s_suppkey"), col("l_extendedprice"), col("l_discount"))
      val sup = t(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))
      SaltedJoin.inner(li, sup, Seq("s_suppkey"), saltFactor = 8)
        .groupBy(col("s_nationkey"))
        .agg(
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("s_nationkey")
    },

    "q45_range_join" -> { (s, dir) =>
      val events = t(s, dir, "events")
      val points = events.select("event_id", "user_id", "ts")
      val intervals = events
        .filter(col("event_id") % 20 === 0)
        .select(col("user_id"), col("event_id").as("interval_id"),
          col("ts").as("start_ts"),
          (col("ts") + expr("INTERVAL 2 HOURS")).as("end_ts"))
      RangeJoin.pointInInterval(points, intervals,
        keyCols = Seq("user_id"), timeCol = "ts",
        startCol = "start_ts", endCol = "end_ts")
        .orderBy("interval_id", "event_id")
    },

    // As-of join (union-and-sweep formulation — Spark has no native op):
    // every event picks up the latest at-or-before snapshot for its user;
    // snapshots = every 10th event. Checked against DuckDB's native
    // ASOF LEFT JOIN.
    "q18_asof_join" -> { (s, dir) =>
      val events = t(s, dir, "events").select("event_id", "user_id", "ts", "value")
      val snapshots = t(s, dir, "events")
        .filter(col("event_id") % 10 === 0)
        .select(col("user_id"), col("ts"), col("value").as("snap_value"))
      AsOfJoin.backward(events, snapshots,
        keyCols = Seq("user_id"), leftTime = "ts", rightTime = "ts",
        rightValues = Seq("snap_value"))
        .orderBy("event_id")
    },

    // Gold: top-k per group via window function (deterministic tiebreak).
    "q16_topk_per_group" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rnk")
        .orderBy("o_custkey", "rnk")
    },

    // Custom-state sessionization (flatMapGroupsWithState, the operator
    // behind StatefulOps.sessionize's event-time-timeout streaming path)
    // run in batch mode — differentially checked against the SQL
    // lag/cumulative-sum session formulation. Distinct semantics from
    // q17's session_window: a gap EXACTLY equal to the threshold extends
    // the session here (<=), where session_window starts a new one.
    "q57_stateful_sessionize" -> { (s, dir) =>
      import s.implicits._
      val ds = t(s, dir, "events")
        .select(col("user_id"), col("ts"), col("value"))
        .as[graft.streaming.StatefulOps.TimedEvent]
      graft.streaming.StatefulOps.sessionize(ds, gapMs = 6 * 3600 * 1000L)
        .select(col("user_id"), col("session_start"), col("session_end"),
          col("n_events"), round(col("total"), 2).as("sum_value"))
        .orderBy("user_id", "session_start")
    },

    // Sequence/CEP detection (StatefulOps.matchPattern) in batch mode:
    // first-touch view→click→purchase chains completing within 24h,
    // O(1) state per user. Differentially checked against the chained
    // min-join relational formulation; q199 runs the SAME operator as a
    // real StreamingQuery against the SAME oracle. Distinct from q157:
    // that reports per-stage funnel counts with per-stage windows; this
    // emits the matched span per user under one overall deadline — the
    // CEP shape (Flink-CEP/MATCH_RECOGNIZE class).
    "q198_pattern_match" -> { (s, dir) =>
      import s.implicits._
      val ds = t(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_type"))
        .as[graft.streaming.StatefulOps.TypedEvent]
      graft.streaming.StatefulOps
        .matchPattern(ds, Seq("view", "click", "purchase"),
          withinMs = 24L * 3600 * 1000)
        .orderBy("user_id")
        .toDF()
    },

    // CEP outcomes with abandonment (q198's other half): one row per
    // ANCHORED user — matched chains plus funnel-drops with the furthest
    // within-window stage. Batch mode finalizes at end of group; q204
    // runs the same operator as a stream where abandonment fires via
    // event-time timeout, against this same oracle.
    "q203_pattern_outcomes" -> { (s, dir) =>
      import s.implicits._
      val ds = t(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_type"))
        .as[graft.streaming.StatefulOps.TypedEvent]
      graft.streaming.StatefulOps
        .patternOutcomes(ds, Seq("view", "click", "purchase"),
          withinMs = 24L * 3600 * 1000)
        .orderBy("user_id")
        .toDF()
    },

    // Deterministic k-per-group sampling (bottom-k-by-hash via the
    // graft_topk partial aggregate). WHICH rows are sampled is
    // engine-defined (hash priorities), but the per-group sample SIZE is
    // exactly least(k, group size) — that contract is what the oracle
    // checks; SamplingSpec pins determinism and the member-level
    // reference.
    "q60_sample_sizes" -> { (s, dir) =>
      Sampling.perGroup(t(s, dir, "orders"), Seq("o_custkey"), "o_orderkey", k = 3)
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_sampled"))
        .orderBy("o_custkey")
    },

    // Mixture resampling (domain reweighting): label ℓ targets weight
    // (ℓ+1)/55 of a 400-row budget. WHICH rows win is engine-defined
    // (hash priorities); the per-stratum sample SIZE is exactly
    // least(floor(weight·total), stratum size) — quotas for labels 7-9
    // exceed their stratum sizes at sf0.01, so the cap path is live in
    // the oracle comparison, not just in specs.
    "q90_mixture_sizes" -> { (s, dir) =>
      import s.implicits._
      val targets = (0 to 9).map(l => (l, (l + 1).toDouble / 55.0)).toDF("label", "weight")
      Sampling.mixture(t(s, dir, "embeddings"), "label", "vec_id", targets, total = 400L)
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_sampled"))
        .orderBy("label")
    },

    // Deterministic corpus shuffle + sharding for a training export —
    // the full (id → shard, position) permutation is md5-keyed and
    // therefore a pure row fact the oracle recomputes exactly,
    // symbol-for-symbol (no engine-defined randomness anywhere).
    "q100_shuffle_shard" -> { (s, dir) =>
      ShuffleShard.assign(t(s, dir, "documents"), "doc_id", nShards = 10)
        .withColumnRenamed("id", "doc_id")
        .orderBy("shard", "pos")
    },

    // Exact quality-decile calibration: every document's exact global
    // rank (by length score) and exact decile — computed by the two-pass
    // distributed rank, hash-gated against DuckDB's global window.
    "q101_decile_rank" -> { (s, dir) =>
      QuantileBucket.bucketed(t(s, dir, "documents"), "doc_id", "n_chars", k = 10)
        .withColumnRenamed("id", "doc_id")
        .orderBy("rank")
    },

    // Epoch-aware mixture oversampling: total = 1200 over the (ℓ+1)/55
    // weights makes labels 0-2 undersample (quota < stratum) and labels
    // 3+ oversample (multi-epoch repetition with a partial-epoch
    // remainder) at sf0.01 — both paths live under the hash gate. WHICH
    // rows get the extra copy is engine-defined (hash priorities); the
    // per-stratum multiplicity arithmetic is a pure (n, k) fact the
    // oracle recomputes: Σ copies = k exactly, distinct = least(n, k),
    // and copies within a stratum differ by at most one.
    "q102_epoch_mixture" -> { (s, dir) =>
      import s.implicits._
      val targets = (0 to 9).map(l => (l, (l + 1).toDouble / 55.0)).toDF("label", "weight")
      Sampling.mixtureEpochs(t(s, dir, "embeddings"), "label", "vec_id", targets, total = 1200L)
        .groupBy(col("label"))
        .agg(
          sum(col("n_copies")).as("n_rows"),
          count(lit(1)).as("n_distinct"),
          min(col("n_copies")).as("min_copies"),
          max(col("n_copies")).as("max_copies"))
        .orderBy("label")
    },

    // Corpus snapshot diff: the new snapshot drops every 13th doc,
    // appends a marker to every 11th survivor, and adds shifted novel
    // docs — every status class live. The engine classifies on 128-bit
    // signature pairs (24-byte shuffle rows, never text); the oracle
    // compares the texts themselves, so a pair-collision misread would
    // hash-fail (none possible at this size; polarity documented in
    // CorpusDiff).
    "q105_corpus_diff" -> { (s, dir) =>
      val d = t(s, dir, "documents")
      val maxId = Option(d.agg(max(col("doc_id"))).head.get(0))
        .fold(0L)(_.asInstanceOf[Number].longValue)
      require(maxId < 1000000L,
        s"q105 added-id shift assumes max(doc_id) < 1000000; got $maxId")
      val newSnap = d.filter(col("doc_id") % 13 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 11 === 0, concat(col("text"), lit(" zzchanged")))
            .otherwise(col("text")).as("text"))
        .unionByName(d.filter(col("doc_id") % 17 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"),
            concat(lit("zzadded "), col("doc_id").cast("string")).as("text")))
      CorpusDiff.diff(d, newSnap, "doc_id", Seq("text"))
        .orderBy("doc_id")
    },

    // Sharded training export, hash-gated end to end: shard + order with
    // the deterministic md5 permutation (q100), physically WRITE the
    // shards (partitionBy parquet — the real sharded-write layout), read
    // them back, and manifest per shard. n_docs == max_pos pins that
    // every position survived the round trip; the oracle recomputes the
    // whole manifest from the permutation arithmetic, so a write/read
    // bug (lost rows, shard misassignment) is a hash fail.
    "q108_shard_export" -> { (s, dir) =>
      val d = t(s, dir, "documents")
      val scratch = graft.core.ScratchDirs.lease("graft-export-q")
      try {
        val out = s"$scratch/shards"
        ShuffleShard.assign(d, "doc_id", nShards = 10)
          .withColumnRenamed("id", "doc_id")
          .join(d.select(col("doc_id"), col("n_chars")), "doc_id")
          .write.mode("overwrite").partitionBy("shard").parquet(out)
        s.read.parquet(out)
          // partition-dir values re-infer as int; restore the contract type
          .groupBy(col("shard").cast("long").as("shard"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("sum_chars"),
            max(col("pos")).as("max_pos"))
          .localCheckpoint(true)
          .orderBy("shard")
      } finally graft.core.ScratchDirs.release(scratch)
    },

    // Fuzzy (edit-distance) join — the entity-resolution primitive, via
    // the segment-pigeonhole equi-join (FuzzyJoin; never a cartesian).
    // Planting: every customer key becomes a 32-hex md5 "clean" name;
    // variants plant a substitution (k%3=0, dist 1), a deletion (k%3=1,
    // dist 1 — and length 31, exercising the cross-length probe), a
    // double substitution (k%3=2, dist 2), and a no-match decoy (k%10=0,
    // an unrelated md5). The oracle is the NAIVE cartesian levenshtein
    // join over the same planted frame — the pigeonhole filter is
    // exact-complete, so the two must agree pair for pair and distance
    // for distance, with no probabilistic argument: random 32-hex
    // strings sit ~20+ edits apart, and even an accidental near-pair
    // would be found by BOTH sides.
    "q143_fuzzy_join" -> { (s, dir) =>
      val c = fuzzyBase(s, dir)
      FuzzyJoin.join(
        plantedVariants(c), "variant_id", "vstr",
        c.select(col("k").as("base_id"), col("b").as("bstr")), "base_id", "bstr",
        maxDistance = 2)
        .orderBy("variant_id", "base_id")
    },

    // Bloom semi-join reduction (BloomJoin): lineitem joined to the 5%
    // of orders with o_orderkey % 20 = 0, the fact side pruned at the
    // scan through a Bloom filter of the dim keys before any shuffle.
    // False positives are candidates, never results — the join keeps the
    // output exact, so the oracle is simply the plain join (BloomJoinSpec
    // carries the measured >=5x shuffle-reduction gate; this row pins
    // end-to-end correctness of the sketch+probe+join composition).
    "q147_bloom_join" -> { (s, dir) =>
      val dim = t(s, dir, "orders")
        .filter(col("o_orderkey") % 20 === 0)
        .select(col("o_orderkey"), col("o_orderpriority"))
      val fact = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      BloomJoin.reduceThenJoin(fact, dim, "l_orderkey", "o_orderkey",
        expectedDimKeys = 65536, fpp = 0.01)
        .groupBy(col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n_items"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
            .as("revenue"))
        .orderBy("o_orderpriority")
    },

    // Shuffle-skew diagnostic (SkewReport): a hot key is planted (every
    // 3rd event re-attributed to user 999999 — roughly a third of the
    // table on one key) and the report must surface it with its share
    // and the salt fan-out that would level a 32-way shuffle. The whole
    // computation is relational (count per key, integer ceil-div salt),
    // so DuckDB recomputes every cell.
    "q148_skew_report" -> { (s, dir) =>
      val e = t(s, dir, "events").select(col("user_id"), col("event_id"))
      val planted = e.unionByName(
        e.filter(col("event_id") % 3 === 0).withColumn("user_id", lit(999999L)))
      SkewReport.topKeys(planted, Seq("user_id"), topK = 5, partitions = 32)
        .orderBy(col("n").desc, col("user_id"))
    },

    // Incremental fuzzy probe — q143's index/probe split, the same
    // incremental-cycle shape as q62/q87/q96/q104: the segment index
    // builds over the full clean-name corpus ONCE, and a small dirty
    // batch (every 5th key with one substituted char, every 15th an
    // unrelated decoy) probes it; probe cost is ∝ the batch. The oracle
    // is again the naive cartesian levenshtein join, batch × corpus —
    // exact-complete filter, so agreement is deterministic.
    "q149_fuzzy_probe" -> { (s, dir) =>
      val c = fuzzyBase(s, dir)
      val index = FuzzyJoin.buildIndex(
        c.select(col("k").as("base_id"), col("b").as("bstr")),
        "base_id", "bstr", maxDistance = 2)
      val batch = c.filter(col("k") % 5 === 0).selectExpr(
        "k + 1000000 AS variant_id",
        "concat(substring(b, 1, cast(k % 32 as int)), 'z', " +
          "substring(b, cast(k % 32 as int) + 2, 64)) AS vstr")
        .unionByName(c.filter(col("k") % 15 === 0).selectExpr(
          "k + 4000000 AS variant_id",
          "md5(cast(k + 7000000 as string)) AS vstr"))
      FuzzyJoin.probe(batch, "variant_id", "vstr", index, rightIdOut = "base_id")
        .orderBy("variant_id", "base_id")
    },

    // Entity resolution END TO END — three operators composed: fuzzy
    // match (q143's exact planted frame), connected components over the
    // match graph, canonical entity = min member id. Every base gains
    // exactly one variant (the k%3 classes partition the keys), decoys
    // resolve to singletons. The oracle recomputes matches via the
    // naive levenshtein join and closes components with FOUR unrolled
    // min-label-propagation rounds — sufficient for any graph this data
    // can produce (diameter ≤ 2) — and its `unconverged` column counts
    // labels a fifth round would still change: the engine pins 0, so if
    // the match graph were ever pathological the gate fails LOUDLY
    // instead of silently blessing a truncated propagation.
    "q155_entity_resolution" -> { (s, dir) =>
      val c = fuzzyBase(s, dir)
      val variants = plantedVariants(c)
      val pairs = FuzzyJoin.join(
        variants, "variant_id", "vstr",
        c.select(col("k").as("base_id"), col("b").as("bstr")), "base_id", "bstr",
        maxDistance = 2)
        .select(col("variant_id").as("id_a"), col("base_id").as("id_b"))
      val vertices = variants.select(col("variant_id").as("id"))
        .unionByName(c.select(col("k").as("id")))
      graft.dedup.ConnectedComponents.assign(vertices, pairs)
        .groupBy(col("component").as("entity_id"))
        .agg(count(lit(1)).as("n_members"))
        .withColumn("unconverged", lit(0L))
        .orderBy("entity_id")
    },

    // The PlanSpec review as a runtime operator: PlanAdvisor audits
    // four canonical plans — a clean broadcast-join aggregate (positive
    // no_findings sentinel), a forced cartesian, a broadcast
    // nested-loop cross join, and a global (unpartitioned) window —
    // and the oracle pins the exact finding set. Deterministic because
    // the planner is: same Spark version, same tiny inputs, same hints.
    "q174_plan_advisor" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val clean = t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name")).agg(count(lit(1)).as("n"))
      val cart = t(s, dir, "region").hint("shuffle_replicate_nl")
        .crossJoin(t(s, dir, "nation"))
      val bnlj = t(s, dir, "region").crossJoin(broadcast(t(s, dir, "nation")))
      val gwin = t(s, dir, "events")
        .withColumn("rn", row_number().over(Window.orderBy(col("ts"))))
      PlanAdvisor.audit(s, Seq("clean" -> clean, "cartesian" -> cart,
        "cross_broadcast" -> bnlj, "global_window" -> gwin))
        .orderBy("case_name", "check_name")
    },

    // Group-aware k-fold: all of a source's documents share a fold (the
    // leakage guarantee), folds assigned by the deterministic md5 key.
    // Audit = per-(fold, lang) doc/source counts, plus the
    // source-in-one-fold invariant computed FOR REAL on both sides.
    "q175_group_kfold" -> { (s, dir) =>
      val folded = Sampling.groupKFold(t(s, dir, "documents"), "source", k = 5)
      val audit = folded.groupBy(col("fold"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("source")).as("n_sources"))
      val leak = folded.groupBy(col("source"))
        .agg(countDistinct(col("fold")).as("nf"))
        .agg((max(col("nf")) === 1L).as("no_leakage"))
      audit.crossJoin(broadcast(leak)).orderBy("fold", "lang")
    },

    // Purged time-series CV (embargo = 6h): per (fold, role) row counts
    // over events — the adjacency-leakage-safe sibling of q175's
    // identity-safe folds. All integer-µs arithmetic; DuckDB recomputes
    // the same bounds/roles from epoch_us.
    "q205_purged_cv" -> { (s, dir) =>
      TimeSplit.purgedFolds(t(s, dir, "events"), "ts", k = 5,
        embargoUs = 6L * 3600 * 1000000)
        .groupBy(col("fold"), col("role"))
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy("fold", "role")
    },

    // Forward as-of join ("next order at or after the event" — the
    // next-touch direction; q18/q186 cover backward): time-reversal
    // delegation to the same union-and-sweep, one shuffle. The oracle is
    // the min-join recompute; ties inclusive (≥).
    "q210_asof_forward" -> { (s, dir) =>
      val ev = t(s, dir, "events").select(col("event_id"), col("user_id"), col("ts"))
      val ord = t(s, dir, "orders")
        .select(col("o_custkey").as("user_id"), col("o_orderdate"))
      AsOfJoin.forward(ev, ord, Seq("user_id"), "ts", "o_orderdate")
        .select(col("event_id"), col("user_id"),
          col("asof_o_orderdate").as("next_order_ts"))
        .orderBy("event_id")
    },

    // Weighted systematic resampling: exactly 100 selections over the
    // documents table with inclusion counts ∝ length(text), decided by
    // pure integer arithmetic on the md5-ordered mass line — the oracle
    // recomputes every copy count (identity-exact, not just sizes,
    // unlike the hash-priority samplers q60/q90 whose oracles check
    // counts because xxhash64 has no DuckDB twin).
    "q180_systematic_sample" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), length(col("text")).cast("long").as("weight"))
      Sampling.systematic(docs, "doc_id", "weight", k = 100)
        .select(col("id").as("doc_id"), col("weight"), col("n_copies"))
        .orderBy("doc_id")
    },

    // Physical storage audit: per-column value/null counts read from
    // the parquet FOOTERS (no data pages touched — StorageAudit), cross
    // -checked for real against the data they describe. The audited
    // numbers and the consistency verdict go through the hash gate; the
    // oracle recomputes the data side, so a footer misparse (or a
    // footer↔data divergence — the integrity property pushdown and
    // data-skipping silently trust) fails the gate on either column.
    "q181_parquet_audit" -> { (s, dir) =>
      val footer = graft.sources.StorageAudit
        .footerStats(s, s"$dir/documents.parquet")
        .groupBy(col("column"))
        .agg(sum(col("n_values")).as("fv"), sum(col("n_nulls")).as("fn"))
      val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
      val aggs = count(lit(1)).as("n") +:
        cols.map(c => count(col(c)).as(s"c_$c"))
      val stackExpr = cols.map(c => s"'$c', n - c_$c").mkString(
        s"stack(${cols.size}, ", ", ", ") as (col_name, data_nulls)")
      val dataSide = t(s, dir, "documents")
        .agg(aggs.head, aggs.tail: _*)
        .select(col("n"), expr(stackExpr))
      footer.withColumnRenamed("column", "col_name")
        .join(broadcast(dataSide), "col_name")
        .select(col("col_name"),
          col("fv").as("n_rows"),
          col("fn").as("n_nulls"),
          (col("fv") === col("n") && col("fn") === col("data_nulls"))
            .as("footer_consistent"))
        .orderBy("col_name")
    },

    // Export-integrity manifest: per training shard, the row count, the
    // character mass, and an ORDER-INSENSITIVE content fingerprint (sum
    // of the first 8 md5 hex digits of "doc_id:text" per row — every
    // term < 2^32, so a shard sums exactly in a long out to ~2^31 rows).
    // This is the receipt a 100 TB export run ships with its shards: a
    // re-run, a backfill, or a second engine must land byte-identical
    // manifests, and any lost/duplicated/mutated row moves at least one
    // (shard, count, fingerprint) triple. One shard-keyed exchange — the
    // fingerprint is embarrassingly aggregable, no ordering needed.
    "q182_export_manifest" -> { (s, dir) =>
      // Shard key recomputed inline (same md5/hex arithmetic as
      // ShuffleShard.assign, which q100 gates) — the manifest then needs
      // NO join and no within-shard ordering: one scan, one shard-keyed
      // partial+final aggregation.
      t(s, dir, "documents").select(col("doc_id"), col("text"))
        .withColumn("shard", pmod(ShuffleShard.hexLong(
          md5(col("doc_id").cast("string")), 4), lit(10L)))
        .withColumn("fp", ShuffleShard.hexLong(
          md5(concat(col("doc_id").cast("string"), lit(":"), col("text"))), 8))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(length(col("text"))).as("n_chars"),
          sum(col("fp")).as("content_fingerprint"))
        .orderBy("shard")
    },

    // Curriculum ordering — the final training-sequence layout: every
    // document gets an exact global POSITION that walks the quality
    // deciles best-first (q101's exact bucketing), deterministically
    // shuffled within each decile by the md5 key. The composite
    // curriculum key (9 − decile)·2^32 + hex8(md5(id)) stays < 2^37, so
    // its double image is EXACT and the position is just a second
    // two-pass rank — the no-SinglePartition machinery twice, never a
    // global window, and the decile is recovered arithmetically from
    // the key (no corpus re-join).
    "q184_curriculum" -> { (s, dir) =>
      val dec = QuantileBucket.bucketed(
        t(s, dir, "documents"), "doc_id", "n_chars", k = 10)
      val keyed = dec.select(col("id"),
        ((lit(9L) - col("bucket")) * lit(4294967296L) +
          ShuffleShard.hexLong(md5(col("id").cast("string")), 8))
          .cast("double").as("ckey"))
      QuantileBucket.bucketed(keyed, "id", "ckey", k = 1)
        .select(col("id").as("doc_id"),
          (lit(9L) - floor(col("score") / lit(4294967296.0)).cast("long"))
            .as("quality_decile"),
          col("rank").as("position"))
        .orderBy("position")
    },

    // Language-balanced systematic sampling: exactly (40, 25, 15)
    // weighted selections from en/de/fr — identity-exact per stratum
    // (WHICH documents, not just how many — the q90/q112 mixture
    // oracles can only check sizes because their hash priorities have
    // no DuckDB twin; the md5 mass line does).
    "q191_lang_systematic" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
        .select(col("lang"), col("doc_id"),
          length(col("text")).cast("long").as("weight"))
      Sampling.systematicPerStratum(docs, "lang", "doc_id", "weight",
        quotas = Map("en" -> 40, "de" -> 25, "fr" -> 15))
        .select(col("lang"), col("id").as("doc_id"), col("weight"),
          col("n_copies"))
        .orderBy("lang", "doc_id")
    },

    // The NATIVE as-of join (q18's semantics through the engine's custom
    // LogicalPlan → SparkStrategy → SparkPlan operator instead of the
    // composed union-and-sweep): one shuffle per side at its own width,
    // streaming two-pointer merge, constant memory per partition.
    // Same DuckDB ASOF LEFT JOIN oracle as q18.
    "q186_asof_native" -> { (s, dir) =>
      val events = t(s, dir, "events").select("event_id", "user_id", "ts", "value")
      val snapshots = t(s, dir, "events")
        .filter(col("event_id") % 10 === 0)
        .select(col("user_id"), col("ts"), col("value").as("snap_value"))
      graft.plans.NativeAsOfJoin.backward(events, snapshots,
        keyCols = Seq("user_id"), leftTime = "ts", rightTime = "ts",
        rightValues = Seq("snap_value"))
        .orderBy("event_id")
    }
  )

  val oracles: Map[String, String] = Map(
    // q100: the md5-keyed permutation is recomputed symbol-for-symbol —
    // same hex string, same first-4-digit arithmetic, same (h, id) sort.
    "q100_shuffle_shard" ->
      """WITH k AS (SELECT doc_id, md5(doc_id::VARCHAR) h FROM documents),
        |v AS (SELECT doc_id, h,
        |  ((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 4096
        | + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1) * 256
        | + (strpos('0123456789abcdef', substr(h, 3, 1)) - 1) * 16
        | + (strpos('0123456789abcdef', substr(h, 4, 1)) - 1)) % 10 shard
        |  FROM k)
        |SELECT doc_id, shard::BIGINT AS shard,
        |  row_number() OVER (PARTITION BY shard ORDER BY h, doc_id)::BIGINT AS pos
        |FROM v ORDER BY shard, pos""".stripMargin,

    // q101: DuckDB runs the global-window formulation the engine
    // deliberately avoids; ranks and integer-division buckets must agree
    // exactly.
    "q101_decile_rank" ->
      """WITH r AS (SELECT doc_id, n_chars::DOUBLE score,
        |    row_number() OVER (ORDER BY n_chars::DOUBLE, doc_id) rk
        |  FROM documents),
        |n AS (SELECT count(*) c FROM documents)
        |SELECT doc_id, score, rk::BIGINT AS rank,
        |  (((rk - 1) * 10) // c)::BIGINT AS bucket
        |FROM r, n ORDER BY rank""".stripMargin,

    // q102: the per-stratum multiplicity contract is pure (n, k)
    // arithmetic — DuckDB rebuilds quota, epoch base, and remainder from
    // the stratum sizes and the same double-precision weight formula.
    "q102_epoch_mixture" ->
      """WITH sizes AS (SELECT label, count(*) n FROM embeddings GROUP BY 1),
        |q AS (SELECT label, n,
        |    CAST(floor(((label + 1) / 55.0) * 1200) AS BIGINT) k
        |  FROM sizes)
        |SELECT label,
        |  k AS n_rows,
        |  least(n, k) AS n_distinct,
        |  CASE WHEN k < n THEN 1 ELSE k // n END AS min_copies,
        |  CASE WHEN k <= n THEN 1
        |       WHEN k % n = 0 THEN k // n
        |       ELSE k // n + 1 END AS max_copies
        |FROM q ORDER BY label""".stripMargin,

    // q105: DuckDB rebuilds the same synthetic new snapshot and compares
    // TEXTS where the engine compares signature pairs.
    "q105_corpus_diff" ->
      """WITH oldsnap AS (SELECT doc_id, text FROM documents),
        |newsnap AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 11 = 0 THEN text || ' zzchanged' ELSE text END AS text
        |  FROM documents WHERE doc_id % 13 != 0
        |  UNION ALL
        |  SELECT doc_id + 1000000, 'zzadded ' || CAST(doc_id AS VARCHAR)
        |  FROM documents WHERE doc_id % 17 = 0)
        |SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
        |  CASE WHEN o.doc_id IS NULL THEN 'added'
        |       WHEN n.doc_id IS NULL THEN 'removed'
        |       WHEN o.text != n.text THEN 'changed'
        |       ELSE 'unchanged' END AS status
        |FROM oldsnap o FULL OUTER JOIN newsnap n ON o.doc_id = n.doc_id
        |ORDER BY doc_id""".stripMargin,

    // q108: the manifest is pure permutation arithmetic — same md5
    // shard/order recompute as q100, aggregated per shard.
    "q108_shard_export" ->
      """WITH k AS (SELECT doc_id, n_chars, md5(doc_id::VARCHAR) h FROM documents),
        |v AS (SELECT doc_id, n_chars, h,
        |  ((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 4096
        | + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1) * 256
        | + (strpos('0123456789abcdef', substr(h, 3, 1)) - 1) * 16
        | + (strpos('0123456789abcdef', substr(h, 4, 1)) - 1)) % 10 shard
        |  FROM k),
        |p AS (SELECT doc_id, n_chars, shard,
        |    row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) pos
        |  FROM v)
        |SELECT shard::BIGINT AS shard, count(*)::BIGINT AS n_docs,
        |  sum(n_chars)::BIGINT AS sum_chars, max(pos)::BIGINT AS max_pos
        |FROM p GROUP BY shard ORDER BY shard""".stripMargin,

    // q10: the hash values are engine-defined, but the counts are pure
    // row-content facts — the doubled input has 2N rows and exactly
    // count(DISTINCT row) distinct hashes iff xxhash64 is deterministic
    // and collision-free on this data.
    "q10_row_hash" ->
      """SELECT (2 * count(*))::BIGINT AS n_rows,
        |  count(DISTINCT (o_orderkey, o_custkey, o_totalprice))::BIGINT AS n_distinct_hashes
        |FROM orders""".stripMargin,

    // q67: DuckDB runs the UNSALTED join — the salted plan must produce
    // the identical aggregate.
    "q67_salted_join" ->
      """SELECT s_nationkey,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,

    "q2_clean_names" ->
      """SELECT l_orderkey AS order_key, l_quantity AS quantity_units,
        |  l_returnflag AS returnflag
        |FROM lineitem WHERE l_orderkey < 100
        |ORDER BY 1, 2, 3""".stripMargin,

    "q3_null_drop" ->
      s"""WITH base AS ($nullifiedEventsSql)
         |SELECT * FROM base
         |WHERE value IS NOT NULL AND props IS NOT NULL
         |ORDER BY event_id""".stripMargin,

    "q4_null_fill" ->
      s"""WITH base AS ($nullifiedEventsSql)
         |SELECT event_id, ts, user_id, event_type,
         |  COALESCE(value, 0) AS value, COALESCE(props, '') AS props
         |FROM base ORDER BY event_id""".stripMargin,

    "q5_null_flag" ->
      s"""WITH base AS ($nullifiedEventsSql)
         |SELECT event_id, ts, user_id, event_type, value, props,
         |  value IS NULL AS value_is_null, props IS NULL AS props_is_null
         |FROM base ORDER BY event_id""".stripMargin,

    "q6_dedup_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus,
        |  EXTRACT(year FROM l_shipdate) AS ship_year
        |FROM lineitem ORDER BY 1, 2, 3""".stripMargin,

    "q7_cast_dates" ->
      """SELECT event_id,
        |  TRY_CAST((ts::TIMESTAMP)::VARCHAR AS TIMESTAMP) AS event_time
        |FROM events ORDER BY event_id""".stripMargin,

    "q8_cast_numeric" ->
      """SELECT l_orderkey, l_linenumber, l_quantity AS qty_str,
        |  l_returnflag AS flag_str
        |FROM lineitem WHERE l_orderkey < 1000
        |ORDER BY 1, 2, 3""".stripMargin,

    "q9_derive_partitions" ->
      """SELECT event_id,
        |  EXTRACT(year FROM ts) AS _year,
        |  EXTRACT(month FROM ts) AS _month,
        |  EXTRACT(day FROM ts) AS _day
        |FROM events ORDER BY event_id""".stripMargin,

    "q11_union_by_name" ->
      """SELECT o_orderkey, o_totalprice, NULL AS o_orderpriority
        |FROM orders WHERE o_orderkey < 500
        |UNION ALL
        |SELECT o_orderkey, NULL AS o_totalprice, o_orderpriority
        |FROM orders WHERE o_orderkey < 500
        |ORDER BY 1, 2, 3""".stripMargin,

    "q12_profile_stats" ->
      s"""WITH base AS ($nullifiedEventsSql)
         |SELECT count(*) AS n_rows,
         |  sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END)::BIGINT AS value_nulls,
         |  sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END)::BIGINT AS props_nulls,
         |  count(DISTINCT event_type) AS event_type_distinct,
         |  count(DISTINCT user_id) AS user_id_distinct
         |FROM base""".stripMargin,

    "q13_gold_daily" ->
      """SELECT EXTRACT(year FROM l_shipdate) AS _year,
        |  EXTRACT(month FROM l_shipdate) AS _month,
        |  EXTRACT(day FROM l_shipdate) AS _day,
        |  count(*) AS order_count,
        |  round(sum(l_quantity * l_extendedprice), 2) AS total_revenue
        |FROM lineitem GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "q14_window_hourly" ->
      """SELECT date_trunc('hour', ts::TIMESTAMP) AS hour_start,
        |  count(*) AS n_events, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q15_join_enrich" ->
      """SELECT r_name, n_name, count(*) AS n_customers,
        |  round(sum(c_acctbal), 2) AS sum_acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // Session semantics: a gap of exactly the threshold starts a new
    // session (Spark merges only while next_ts < last_ts + gap).
    "q17_session_window" ->
      """WITH e AS (SELECT user_id, ts::TIMESTAMP ts, value FROM events),
        |lagged AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |      >= INTERVAL 6 HOUR THEN 1 ELSE 0 END brk
        |  FROM e),
        |sess AS (
        |  SELECT user_id, ts, value,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS UNBOUNDED PRECEDING) sid
        |  FROM lagged)
        |SELECT user_id, min(ts) AS session_start,
        |  count(*) AS n_events, round(sum(value), 2) AS sum_value
        |FROM sess GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,

    "q53_json_extract" ->
      """WITH e AS (
        |  SELECT event_type,
        |    TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        |  FROM events)
        |SELECT event_type, count(*) AS n, sum(k)::BIGINT AS sum_k,
        |  count(DISTINCT k) AS distinct_k
        |FROM e GROUP BY 1 ORDER BY 1""".stripMargin,

    "q54_set_ops" ->
      """SELECT custkey, TRUE AS has_orders FROM (
        |  SELECT c_custkey AS custkey FROM customer
        |  INTERSECT SELECT o_custkey FROM orders)
        |UNION ALL
        |SELECT custkey, FALSE AS has_orders FROM (
        |  SELECT c_custkey AS custkey FROM customer
        |  EXCEPT SELECT o_custkey FROM orders)
        |ORDER BY custkey""".stripMargin,

    "q55_semi_anti" ->
      """WITH flags AS (
        |  SELECT o_totalprice,
        |    EXISTS (SELECT 1 FROM lineitem
        |            WHERE l_orderkey = o_orderkey AND l_returnflag = 'R') AS has_return
        |  FROM orders)
        |SELECT has_return, count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS sum_price
        |FROM flags GROUP BY 1 ORDER BY 1""".stripMargin,

    "q44_rules" ->
      """WITH filtered AS (
        |  SELECT *,
        |    CASE WHEN value < 5 THEN 'low' WHEN value < 20 THEN 'mid'
        |      ELSE 'high' END AS value_bucket
        |  FROM events WHERE value >= 1.0),
        |updated AS (
        |  SELECT value_bucket,
        |    CASE WHEN event_type = 'error' THEN 0.0 ELSE value END AS value
        |  FROM filtered)
        |SELECT value_bucket, count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM updated GROUP BY 1 ORDER BY 1""".stripMargin,

    "q45_range_join" ->
      """WITH p AS (SELECT event_id, user_id, ts::TIMESTAMP ts FROM events),
        |i AS (SELECT user_id, event_id AS interval_id,
        |        ts::TIMESTAMP AS start_ts,
        |        ts::TIMESTAMP + INTERVAL 2 HOUR AS end_ts
        |      FROM events WHERE event_id % 20 = 0)
        |SELECT p.event_id, p.user_id, p.ts,
        |  i.interval_id, i.start_ts, i.end_ts
        |FROM p JOIN i ON p.user_id = i.user_id
        |  AND p.ts >= i.start_ts AND p.ts <= i.end_ts
        |ORDER BY i.interval_id, p.event_id""".stripMargin,

    // ASOF JOIN is native in DuckDB; l.ts >= r.ts ≡ our backward (≤)
    // semantics including the exact-tie case.
    "q18_asof_join" ->
      """WITH l AS (SELECT event_id, user_id, ts::TIMESTAMP ts, value FROM events),
        |r AS (SELECT user_id, ts::TIMESTAMP ts, value AS snap_value
        |      FROM events WHERE event_id % 10 = 0)
        |SELECT l.event_id, l.user_id, l.ts, l.value,
        |  r.ts AS asof_ts, r.snap_value
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
        |ORDER BY l.event_id""".stripMargin,

    "q16_topk_per_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |  FROM orders) WHERE rnk <= 3
        |ORDER BY o_custkey, rnk""".stripMargin,

    // Session break on gap STRICTLY GREATER than the threshold (the
    // stateful operator's <=-extends contract).
    "q57_stateful_sessionize" ->
      """WITH e AS (SELECT user_id, ts::TIMESTAMP ts, value FROM events),
        |lagged AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |      > INTERVAL 6 HOUR THEN 1 ELSE 0 END brk
        |  FROM e),
        |sess AS (
        |  SELECT user_id, ts, value,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS UNBOUNDED PRECEDING) sid
        |  FROM lagged)
        |SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
        |  count(*) AS n_events, round(sum(value), 2) AS sum_value
        |FROM sess GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,

    "q198_pattern_match" -> patternMatchOracle,

    "q203_pattern_outcomes" -> patternOutcomeOracle,

    "q210_asof_forward" ->
      """WITH e AS (SELECT event_id, user_id, ts::TIMESTAMP ts FROM events),
        |o AS (SELECT o_custkey AS user_id, o_orderdate::TIMESTAMP ot FROM orders)
        |SELECT e.event_id, e.user_id, min(o.ot) AS next_order_ts
        |FROM e LEFT JOIN o ON e.user_id = o.user_id AND o.ot >= e.ts
        |GROUP BY 1, 2 ORDER BY event_id""".stripMargin,

    // Integer-µs bound/role arithmetic replayed exactly; embargo 6h.
    "q205_purged_cv" ->
      """WITH b AS (SELECT min(epoch_us(ts::TIMESTAMP)) t0,
        |                  max(epoch_us(ts::TIMESTAMP)) t1 FROM events),
        |f AS (SELECT unnest(generate_series(0, 4)) AS fold),
        |r AS (
        |  SELECT f.fold, e.user_id,
        |    CASE
        |      WHEN us >= lo AND us < hi THEN 'test'
        |      WHEN (us >= lo - 21600000000 AND us < lo)
        |        OR (us >= hi AND us < hi + 21600000000) THEN 'embargo'
        |      ELSE 'train' END AS role
        |  FROM (SELECT user_id, epoch_us(ts::TIMESTAMP) us FROM events) e, f, b,
        |    LATERAL (SELECT
        |      t0 + ((t1 - t0) * f.fold) // 5 AS lo,
        |      CASE WHEN f.fold = 4 THEN t1 + 1
        |           ELSE t0 + ((t1 - t0) * (f.fold + 1)) // 5 END AS hi))
        |SELECT fold, role, count(*)::BIGINT AS n_rows,
        |  count(DISTINCT user_id)::BIGINT AS n_users
        |FROM r GROUP BY fold, role ORDER BY fold, role""".stripMargin,

    "q60_sample_sizes" ->
      """SELECT o_custkey, least(3, count(*)) AS n_sampled
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    // floor(((label+1)/55.0) * 400) replicates the engine's fp order of
    // operations (weight first, then × total); no quota lands near an
    // integer boundary, so the floor is unambiguous.
    "q90_mixture_sizes" ->
      """SELECT label,
        |  least(floor(((label + 1) / 55.0) * 400)::BIGINT, count(*)) AS n_sampled
        |FROM embeddings GROUP BY 1 ORDER BY 1""".stripMargin,

    // The NAIVE cartesian levenshtein join over the identical planted
    // frame: the engine's segment-pigeonhole filter is exact-complete,
    // so banded result == cartesian ground truth deterministically.
    "q143_fuzzy_join" ->
      s"""WITH $fuzzyPlantSql
         |SELECT v.variant_id, c.k AS base_id,
         |  levenshtein(v.vstr, c.b)::INT AS dist
         |FROM var v CROSS JOIN c
         |WHERE levenshtein(v.vstr, c.b) <= 2
         |ORDER BY variant_id, base_id""".stripMargin,

    // q147: the bloom filter only prunes; the result is the plain join.
    "q147_bloom_join" ->
      """SELECT o_orderpriority, count(*)::BIGINT AS n_items,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderkey % 20 = 0
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    // q149: the naive cartesian levenshtein join, batch × corpus.
    "q149_fuzzy_probe" ->
      """WITH c AS (
        |  SELECT c_custkey AS k, md5(c_custkey::VARCHAR) AS b FROM customer),
        |batch AS (
        |  SELECT k + 1000000 AS variant_id,
        |    substr(b, 1, (k % 32)::INT) || 'z'
        |      || substr(b, (k % 32)::INT + 2) AS vstr
        |  FROM c WHERE k % 5 = 0
        |  UNION ALL
        |  SELECT k + 4000000, md5((k + 7000000)::VARCHAR)
        |  FROM c WHERE k % 15 = 0)
        |SELECT v.variant_id, c.k AS base_id,
        |  levenshtein(v.vstr, c.b)::INT AS dist
        |FROM batch v CROSS JOIN c
        |WHERE levenshtein(v.vstr, c.b) <= 2
        |ORDER BY variant_id, base_id""".stripMargin,

    // q155: matches via the naive levenshtein join; components via four
    // unrolled min-label rounds; `unconverged` counts round-5 changes
    // (pinned 0 by the engine — a pathological graph fails loudly).
    "q155_entity_resolution" ->
      s"""WITH $fuzzyPlantSql,
         |m AS (
         |  SELECT v.variant_id AS a, c.k AS b FROM var v CROSS JOIN c
         |  WHERE levenshtein(v.vstr, c.b) <= 2),
         |nodes AS (SELECT variant_id AS id FROM var UNION SELECT k FROM c),
        |e AS (SELECT a, b FROM m UNION SELECT b, a FROM m),
        |l0 AS (SELECT id, id AS lab FROM nodes),
        |l1 AS (
        |  SELECT n.id, least(n.lab, coalesce(min(p.lab), n.lab)) AS lab
        |  FROM l0 n LEFT JOIN e ON e.a = n.id LEFT JOIN l0 p ON p.id = e.b
        |  GROUP BY n.id, n.lab),
        |l2 AS (
        |  SELECT n.id, least(n.lab, coalesce(min(p.lab), n.lab)) AS lab
        |  FROM l1 n LEFT JOIN e ON e.a = n.id LEFT JOIN l1 p ON p.id = e.b
        |  GROUP BY n.id, n.lab),
        |l3 AS (
        |  SELECT n.id, least(n.lab, coalesce(min(p.lab), n.lab)) AS lab
        |  FROM l2 n LEFT JOIN e ON e.a = n.id LEFT JOIN l2 p ON p.id = e.b
        |  GROUP BY n.id, n.lab),
        |l4 AS (
        |  SELECT n.id, least(n.lab, coalesce(min(p.lab), n.lab)) AS lab
        |  FROM l3 n LEFT JOIN e ON e.a = n.id LEFT JOIN l3 p ON p.id = e.b
        |  GROUP BY n.id, n.lab),
        |l5 AS (
        |  SELECT n.id, least(n.lab, coalesce(min(p.lab), n.lab)) AS lab
        |  FROM l4 n LEFT JOIN e ON e.a = n.id LEFT JOIN l4 p ON p.id = e.b
        |  GROUP BY n.id, n.lab),
        |chg AS (
        |  SELECT count(*)::BIGINT AS n FROM l5 x JOIN l4 y
        |  ON x.id = y.id AND x.lab <> y.lab)
        |SELECT lab AS entity_id, count(*)::BIGINT AS n_members,
        |  (SELECT n FROM chg) AS unconverged
        |FROM l4 GROUP BY 1 ORDER BY 1""".stripMargin,

    "q148_skew_report" ->
      """WITH pl AS (
        |  SELECT user_id FROM events
        |  UNION ALL
        |  SELECT 999999 AS user_id FROM events WHERE event_id % 3 = 0),
        |c AS (SELECT user_id, count(*)::BIGINT AS n FROM pl GROUP BY 1),
        |t AS (SELECT sum(n)::BIGINT AS total, count(*)::BIGINT AS n_keys FROM c)
        |SELECT user_id, n, round(n / total::DOUBLE, 6) AS share, n_keys,
        |  ((n * 32 + total - 1) // total)::BIGINT AS salt
        |FROM c, t
        |ORDER BY n DESC, user_id
        |LIMIT 5""".stripMargin,

    // q174: the advisor's verdicts are plan facts pinned literally —
    // the global window flags BOTH as a window hazard and as the
    // single-partition exchange it plans into.
    "q175_group_kfold" ->
      """WITH f AS (
        |  SELECT doc_id, lang, source,
        |    (((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 4096
        |    + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1) * 256
        |    + (strpos('0123456789abcdef', substr(h, 3, 1)) - 1) * 16
        |    + (strpos('0123456789abcdef', substr(h, 4, 1)) - 1)) % 5)::BIGINT AS fold
        |  FROM (SELECT doc_id, lang, source, md5(source) AS h FROM documents)),
        |audit AS (
        |  SELECT fold, lang, count(*)::BIGINT AS n_docs,
        |    count(DISTINCT source)::BIGINT AS n_sources
        |  FROM f GROUP BY 1, 2),
        |leak AS (
        |  SELECT max(nf) = 1 AS no_leakage FROM (
        |    SELECT source, count(DISTINCT fold) AS nf FROM f GROUP BY 1))
        |SELECT fold, lang, n_docs, n_sources, no_leakage
        |FROM audit, leak ORDER BY fold, lang""".stripMargin,

    "q174_plan_advisor" ->
      """SELECT * FROM (VALUES
        |  ('cartesian', 'cartesian-product', 'critical'),
        |  ('clean', 'no_findings', 'ok'),
        |  ('cross_broadcast', 'nested-loop-join', 'warn'),
        |  ('global_window', 'global-window', 'warn'),
        |  ('global_window', 'single-partition-exchange', 'warn'))
        |  AS t(case_name, check_name, severity)
        |ORDER BY case_name, check_name""".stripMargin,

    // q180: the full mass-line replay — same md5 order, same integer
    // point-count formula cnt(a) = (a + W − 1) // (2W); HUGEINT keeps
    // the 2k·cum products exact (the engine's BigInt branch).
    "q180_systematic_sample" ->
      """WITH w AS (
        |  SELECT doc_id AS id, length(text)::BIGINT AS w,
        |         md5(doc_id::VARCHAR) AS h
        |  FROM documents),
        |c AS (
        |  SELECT id, w,
        |    sum(w) OVER (ORDER BY h, id ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM w),
        |t AS (SELECT sum(w)::HUGEINT AS tw FROM w),
        |sel AS (
        |  SELECT id, w,
        |    ((200 * cum::HUGEINT + tw - 1) // (2 * tw)
        |     - (200 * (cum - w)::HUGEINT + tw - 1) // (2 * tw))::BIGINT AS n_copies
        |  FROM c CROSS JOIN t)
        |SELECT id AS doc_id, w AS weight, n_copies
        |FROM sel WHERE n_copies > 0
        |ORDER BY doc_id""".stripMargin,

    // q181: the oracle recomputes the DATA side of the footer↔data
    // contract; `footer_consistent` is literal true here precisely
    // because the engine computes it for real — a footer misparse
    // flips it to false and the hash gate catches the divergence.
    "q181_parquet_audit" ->
      """WITH d AS (
        |  SELECT count(*) AS n, count(doc_id) AS c1, count(text) AS c2,
        |         count(lang) AS c3, count(source) AS c4, count(n_chars) AS c5
        |  FROM documents)
        |SELECT col_name, n_rows, n_nulls, footer_consistent FROM (
        |  SELECT 'doc_id' AS col_name, n::BIGINT AS n_rows,
        |         (n - c1)::BIGINT AS n_nulls, true AS footer_consistent FROM d
        |  UNION ALL SELECT 'text', n, n - c2, true FROM d
        |  UNION ALL SELECT 'lang', n, n - c3, true FROM d
        |  UNION ALL SELECT 'source', n, n - c4, true FROM d
        |  UNION ALL SELECT 'n_chars', n, n - c5, true FROM d)
        |ORDER BY col_name""".stripMargin,

    // q182: the whole manifest is md5 + integer arithmetic — shard keys
    // and fingerprints replay symbol-for-symbol ([[hexSql]] twins
    // ShuffleShard.hexLong/hex4).
    "q182_export_manifest" ->
      s"""WITH d AS (
         |  SELECT doc_id, text, md5(doc_id::VARCHAR) AS h,
         |         md5(doc_id::VARCHAR || ':' || text) AS fh
         |  FROM documents)
         |SELECT (${hexSql("h", 4)} % 10)::BIGINT AS shard,
         |  count(*)::BIGINT AS n_docs,
         |  sum(length(text))::BIGINT AS n_chars,
         |  sum(${hexSql("fh", 8)})::BIGINT AS content_fingerprint
         |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,

    // q184: q101's decile replay feeding the same composite-key rank —
    // the < 2^37 key is exact in DOUBLE on both engines.
    "q184_curriculum" ->
      s"""WITH r AS (SELECT doc_id,
         |    row_number() OVER (ORDER BY n_chars::DOUBLE, doc_id) rk
         |  FROM documents),
         |n AS (SELECT count(*) c FROM documents),
         |d AS (SELECT doc_id, (((rk - 1) * 10) // c)::BIGINT AS decile
         |  FROM r, n),
         |k AS (SELECT doc_id, decile,
         |    ((9 - decile) * 4294967296 +
         |      ${hexSql("md5(doc_id::VARCHAR)", 8)})::DOUBLE AS ckey
         |  FROM d)
         |SELECT doc_id, decile AS quality_decile,
         |  row_number() OVER (ORDER BY ckey, doc_id)::BIGINT AS position
         |FROM k ORDER BY position""".stripMargin,

    // q191: the q180 replay PER LANGUAGE — each stratum lays its own
    // md5 mass line with its own quota.
    "q191_lang_systematic" ->
      """WITH q(lang, k) AS (VALUES ('en', 40), ('de', 25), ('fr', 15)),
        |w AS (
        |  SELECT lang, doc_id AS id, length(text)::BIGINT AS w,
        |         md5(doc_id::VARCHAR) AS h
        |  FROM documents WHERE lang IN ('en', 'de', 'fr')),
        |c AS (
        |  SELECT lang, id, w,
        |    sum(w) OVER (PARTITION BY lang ORDER BY h, id
        |                 ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM w),
        |t AS (SELECT lang, sum(w)::HUGEINT AS tw FROM w GROUP BY 1),
        |sel AS (
        |  SELECT c.lang, c.id, c.w,
        |    ((2 * q.k * c.cum::HUGEINT + t.tw - 1) // (2 * t.tw)
        |     - (2 * q.k * (c.cum - c.w)::HUGEINT + t.tw - 1) // (2 * t.tw)
        |    )::BIGINT AS n_copies
        |  FROM c JOIN t USING (lang) JOIN q USING (lang))
        |SELECT lang, id AS doc_id, w AS weight, n_copies
        |FROM sel WHERE n_copies > 0
        |ORDER BY lang, doc_id""".stripMargin,

    // q186: DuckDB's own ASOF LEFT JOIN is the oracle for the native
    // operator — identical to q18's, which gates the composed twin.
    "q186_asof_native" ->
      """WITH l AS (SELECT event_id, user_id, ts::TIMESTAMP ts, value FROM events),
        |r AS (SELECT user_id, ts::TIMESTAMP ts, value AS snap_value
        |      FROM events WHERE event_id % 10 = 0)
        |SELECT l.event_id, l.user_id, l.ts, l.value,
        |  r.ts AS asof_ts, r.snap_value
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
        |ORDER BY l.event_id""".stripMargin
  )
}
