package graft.gold

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Behavioral / lifecycle analytics over the event stream and the order
  * fact table — the gold-layer surface the reference's Athena queries
  * sketch (etl/README.md report queries) generalized to the four shapes
  * every product-analytics user asks for: ordered conversion funnels,
  * cohort retention matrices, gap-filled time series with interpolation,
  * and SCD Type 2 attribute historization — plus a Deequ-style
  * data-quality expectation suite computed in one fused pass.
  *
  * Scale notes (100 TB discipline):
  *  - The funnel chain keys every aggregation and join on `user_id`, so
  *    the whole query is ONE hash-partitioning reused across stages —
  *    Catalyst collapses the groupBy→join→groupBy chain onto a single
  *    exchange family; no step ever re-shuffles on a different key.
  *  - Cohort/retention shuffles on (custkey) then (cohort_month): the
  *    second key is ~80 distinct months, so the final agg is a tiny
  *    exchange after a distinct that already collapsed the fact table.
  *  - Gap-fill explodes a per-user date range bounded by each user's own
  *    activity span (never a global calendar cross-join), and both
  *    window frames share one (user_id, day) sort — a single exchange.
  *  - SCD2 uses two window passes over the SAME (user_id, ts) ordering
  *    plus one aggregation — again a single exchange family.
  *  - Expectations is one full-scan aggregate (plus the one Expand pass
  *    the distinct-count constraint forces) producing a 1-row frame that
  *    unpivots driver-free via `stack`.
  */
object BehaviorQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Ordered conversion funnel with per-step time bounds: first view,
    // first click within 2h of that view, first purchase within 24h of
    // that click. Strictly-after semantics at each step; conversion is
    // reported against the previous step. The 3-row driver-side frame is
    // the ONLY place a single-partition window runs.
    "q157_funnel" -> { (s, dir) =>
      val e = t(s, dir, "events").select(col("user_id"), col("event_type"), col("ts"))
      val v = e.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
      val c = e.filter(col("event_type") === "click")
        .join(v, "user_id")
        .filter(col("ts") > col("t1") &&
          col("ts") <= col("t1") + expr("INTERVAL 2 HOURS"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
      val p = e.filter(col("event_type") === "purchase")
        .join(c, "user_id")
        .filter(col("ts") > col("t2") &&
          col("ts") <= col("t2") + expr("INTERVAL 24 HOURS"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
      val steps = v.agg(count(lit(1)).as("n_users"))
        .select(lit(1).as("step"), lit("view").as("stage"), col("n_users"))
        .unionByName(c.agg(count(lit(1)).as("n_users"))
          .select(lit(2).as("step"), lit("click").as("stage"), col("n_users")))
        .unionByName(p.agg(count(lit(1)).as("n_users"))
          .select(lit(3).as("step"), lit("purchase").as("stage"), col("n_users")))
      val w = Window.orderBy("step") // 3 rows: single-partition by design
      val prev = lag(col("n_users"), 1).over(w)
      steps
        .withColumn("pct_of_prev",
          when(prev > 0, round(col("n_users") / prev, 4)))
        .orderBy("step")
    },

    // Cohort retention matrix: cohort = month of a customer's first
    // order; a cohort is "active" in month-offset k when any member
    // placed an order k calendar months after their cohort month.
    "q158_cohort_retention" -> { (s, dir) =>
      val o = t(s, dir, "orders")
        .select(col("o_custkey"), to_date(col("o_orderdate")).as("od"))
      val first = o.groupBy(col("o_custkey"))
        .agg(trunc(min(col("od")), "month").as("cohort_month"))
      val sizes = first.groupBy(col("cohort_month"))
        .agg(count(lit(1)).as("cohort_size"))
      val act = o.join(first, "o_custkey")
        .select(col("cohort_month"), col("o_custkey"),
          ((year(col("od")) * 12 + month(col("od"))) -
            (year(col("cohort_month")) * 12 + month(col("cohort_month"))))
            .as("month_offset"))
        .distinct()
      act.groupBy(col("cohort_month"), col("month_offset"))
        .agg(count(lit(1)).as("n_active"))
        .join(sizes, "cohort_month")
        .withColumn("retention_pct",
          round(col("n_active") / col("cohort_size"), 4))
        .orderBy("cohort_month", "month_offset")
    },

    // Gap-filled daily purchase series per user: every day inside the
    // user's own [first, last] purchase-day span appears exactly once;
    // missing days carry n_purchases = 0, a LOCF value, and a linear
    // interpolation between the flanking observed days. Interior gaps
    // always have both flanks (the span endpoints are observed days), so
    // the lerp denominator is never 0 on a gap row. Values ride as exact
    // integer CENTS (the q154 discipline) because midpoint interpolation
    // of 2-decimal money lands on X.XX5 halfway points constantly, where
    // Spark (binary-value HALF_UP) and DuckDB (shortest-decimal-repr
    // rounding) legitimately disagree at round(·, 2); integer lerp is
    // engine-portable with no FP in the path at all.
    "q159_gap_fill" -> { (s, dir) =>
      val daily = t(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n_purchases"),
          round(sum(col("value")) * 100, 0).cast("long").as("v_cents"))
      val grid = daily.groupBy(col("user_id"))
        .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        .select(col("user_id"), explode(sequence(col("d0"), col("d1"))).as("day"))
      val w = Window.partitionBy("user_id").orderBy("day")
      val back = w.rowsBetween(Window.unboundedPreceding, 0)
      val fwd = w.rowsBetween(0, Window.unboundedFollowing)
      grid.join(daily, Seq("user_id", "day"), "left")
        .withColumn("prev_c", last(col("v_cents"), ignoreNulls = true).over(back))
        .withColumn("prev_d",
          last(when(col("v_cents").isNotNull, col("day")), ignoreNulls = true).over(back))
        .withColumn("next_c", first(col("v_cents"), ignoreNulls = true).over(fwd))
        .withColumn("next_d",
          first(when(col("v_cents").isNotNull, col("day")), ignoreNulls = true).over(fwd))
        .withColumn("k", datediff(col("day"), col("prev_d")))
        .withColumn("m", datediff(col("next_d"), col("prev_d")))
        .withColumn("lerp_cents",
          when(col("v_cents").isNotNull, col("v_cents"))
            .otherwise(expr("(prev_c * (m - k) + next_c * k) div m")))
        .select(col("user_id"), col("day"),
          coalesce(col("n_purchases"), lit(0L)).as("n_purchases"),
          col("prev_c").as("locf_cents"), col("lerp_cents"))
        .orderBy("user_id", "day")
    },

    // SCD Type 2 historization of a change stream: consecutive events
    // with the same attribute value collapse into one validity interval
    // [valid_from, valid_to); the open interval per key is is_current.
    // Restricted to user_id % 5 = 0 to keep the oracle frame bounded at
    // every sf (the operator itself is sf-independent).
    "q160_scd2_history" -> { (s, dir) =>
      val e = t(s, dir, "events")
        .filter(col("user_id") % 5 === 0)
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      val wOrd = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val versioned = e
        .withColumn("prev_type", lag(col("event_type"), 1).over(wOrd))
        .withColumn("is_chg",
          when(col("prev_type").isNull || col("prev_type") =!= col("event_type"), 1)
            .otherwise(0))
        .withColumn("version",
          sum(col("is_chg")).over(wOrd.rowsBetween(Window.unboundedPreceding, 0)))
      val intervals = versioned
        .groupBy(col("user_id"), col("version"), col("event_type"))
        .agg(min(col("ts")).as("valid_from"), count(lit(1)).as("n_events"))
      val wv = Window.partitionBy("user_id").orderBy("version")
      intervals
        .withColumn("valid_to", lead(col("valid_from"), 1).over(wv))
        .withColumn("is_current", col("valid_to").isNull)
        .orderBy("user_id", "version")
    },

    // Market-basket pair mining over order line items: support,
    // confidence, and lift for the top co-occurring part-BRAND pairs
    // (brands, not parts — raw part ids are near-unique per order at
    // every sf, so pair support would be ~1 everywhere; brand is the
    // natural catalog rollup). Fan-out is bounded per order (distinct
    // brands per order ≤ lines per order), so the pair explosion is
    // in-row scale-safe — never a corpus-level self-join.
    "q171_market_basket" -> { (s, dir) =>
      val baskets = t(s, dir, "lineitem")
        .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey").as("okey"), col("p_brand").as("brand"))
        .distinct()
      val nOrders = baskets.select(col("okey")).distinct().count()
      val brandCounts = baskets.groupBy(col("brand"))
        .agg(count(lit(1)).as("n_brand"))
      val pairs = baskets.as("a")
        .join(baskets.as("b"),
          col("a.okey") === col("b.okey") && col("a.brand") < col("b.brand"))
        .groupBy(col("a.brand").as("brand_a"), col("b.brand").as("brand_b"))
        .agg(count(lit(1)).as("n_pair"))
      pairs
        .join(brandCounts.select(col("brand").as("brand_a"), col("n_brand").as("n_a")), "brand_a")
        .join(brandCounts.select(col("brand").as("brand_b"), col("n_brand").as("n_b")), "brand_b")
        .withColumn("support", round(col("n_pair") / lit(nOrders.toDouble), 6))
        .withColumn("confidence", round(col("n_pair") / col("n_a"), 6))
        .withColumn("lift", round(
          (col("n_pair") * lit(nOrders.toDouble)) / (col("n_a") * col("n_b")), 6))
        .select(col("brand_a"), col("brand_b"), col("n_pair"),
          col("support"), col("confidence"), col("lift"))
        .orderBy(col("n_pair").desc, col("brand_a"), col("brand_b"))
        .limit(25)
    },

    // Session path analysis: the event-type transition matrix over
    // consecutive events per user (ordered by ts with the event_id
    // tiebreak) — counts and per-source transition probabilities. One
    // user_id exchange; the matrix itself is |types|² tiny.
    "q172_event_transitions" -> { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val trans = t(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
      val fromTotals = trans.groupBy(col("from_type"))
        .agg(sum(col("n")).as("n_from"))
      trans.join(fromTotals, "from_type")
        .withColumn("p", round(col("n") / col("n_from"), 6))
        .select(col("from_type"), col("to_type"), col("n"), col("p"))
        .orderBy("from_type", "to_type")
    },

    // Rolling 7-day distinct users from MERGEABLE daily HLL sketches —
    // the 100 TB pattern: sketch each day once (one pass over raw),
    // answer every rolling window by UNIONING seven kilobyte-sized
    // registers instead of rescanning a week of raw events. The window
    // union runs over the ~30-row daily frame (rangeBetween on the day
    // number, so calendar gaps would not silently shrink the window);
    // the estimate is checked against the EXACT rolling distinct (grid
    // join — the tiny day frame broadcasts against one more pass, used
    // here only as the gate's ground truth). Oracle pins the exact
    // counts and the q66-style envelope boolean.
    "q173_rolling_distinct" -> { (s, dir) =>
      val e = t(s, dir, "events")
        .select(to_date(col("ts")).as("day"), col("user_id"))
      val withNum = e.withColumn("daynum",
        datediff(col("day"), lit("1970-01-01").cast("date")))
      val daily = withNum.groupBy(col("day"), col("daynum"))
        .agg(hll_sketch_agg(col("user_id")).as("sk"))
      val w = Window.orderBy("daynum").rangeBetween(-6, 0)
      val est = daily.withColumn("est",
        hll_sketch_estimate(hll_union_agg(col("sk")).over(w)))
        .select(col("day"), col("daynum"), col("est"))
      val days = daily.select(col("daynum").as("d_end"), col("day").as("d_day"))
      val exact = broadcast(days)
        .join(withNum,
          col("daynum") >= col("d_end") - 6 && col("daynum") <= col("d_end"))
        .groupBy(col("d_day").as("day"))
        .agg(countDistinct(col("user_id")).as("n_users_7d"))
      exact.join(est, "day")
        .select(col("day"), col("n_users_7d"),
          (abs(col("est") - col("n_users_7d")) <= col("n_users_7d") * lit(0.05))
            .as("sketch_ok"))
        .orderBy("day")
    },

    // Discrete-time conversion/survival curve with right-censoring: for
    // each day offset d, among users whose observation window (signup →
    // corpus horizon) covers d, the fraction whose first purchase after
    // signup happened within d days. Each day is an independent
    // integer-ratio (no product-limit float chains); day arithmetic is
    // exact integer µs division on both sides.
    "q177_survival_curve" -> { (s, dir) =>
      val e = t(s, dir, "events")
        .select(col("user_id"), col("event_type"), col("ts"))
      val signup = e.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t0"))
      val conv = e.filter(col("event_type") === "purchase")
        .join(signup, "user_id")
        .filter(col("ts") > col("t0"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
      val horizon = e.agg(max(col("ts")).as("tmax"))
      val users = signup.join(conv, Seq("user_id"), "left")
        .crossJoin(broadcast(horizon))
        .select(col("user_id"),
          expr("(unix_micros(t1) - unix_micros(t0)) div 86400000000").as("conv_day"),
          expr("(unix_micros(tmax) - unix_micros(t0)) div 86400000000").as("censor_day"))
      val days = t(s, dir, "events").sparkSession.range(0, 15).toDF("d")
      users.crossJoin(broadcast(days))
        .filter(col("censor_day") >= col("d"))
        .groupBy(col("d"))
        .agg(count(lit(1)).as("n_observable"),
          sum(when(col("conv_day").isNotNull && col("conv_day") <= col("d"), 1L)
            .otherwise(0L)).as("n_converted"))
        .withColumn("conversion_rate",
          round(col("n_converted") / col("n_observable"), 6))
        .orderBy("d")
    },

    // Deequ-style expectation suite over lineitem: eight constraints
    // (row count, composite-key uniqueness, completeness, ranges, value
    // set, freshness) evaluated from ONE fused aggregation pass, then
    // unpivoted distributed-side via stack — no driver loop, no second
    // scan.
    "q161_expectations" -> { (s, dir) =>
      t(s, dir, "lineitem").agg(
        count(lit(1)).as("n"),
        countDistinct(col("l_orderkey"), col("l_linenumber")).as("n_pk"),
        count(col("l_quantity")).as("n_qty"),
        count(col("l_returnflag")).as("n_rf"),
        min(col("l_quantity")).as("min_qty"),
        min(col("l_discount")).as("min_disc"),
        max(col("l_discount")).as("max_disc"),
        sum(when(col("l_returnflag").isin("A", "N", "R"), 0).otherwise(1)).as("n_bad_rf"),
        max(col("l_shipdate")).as("max_sd")
      ).select(expr(
        """stack(8,
          |  'row_count', cast(n as double), n > 0,
          |  'pk_unique', round(n_pk / n, 6), n_pk = n,
          |  'complete_l_quantity', round(n_qty / n, 6), n_qty = n,
          |  'complete_l_returnflag', round(n_rf / n, 6), n_rf = n,
          |  'range_l_discount', round(max_disc, 6), min_disc >= 0.0 AND max_disc <= 1.0,
          |  'positive_l_quantity', round(min_qty, 6), min_qty > 0.0,
          |  'set_l_returnflag', cast(n_bad_rf as double), n_bad_rf = 0,
          |  'freshness_l_shipdate', cast(year(max_sd) as double),
          |    max_sd >= timestamp'2001-01-01 00:00:00'
          |) as (check_name, metric, passed)""".stripMargin))
        .orderBy("check_name")
    },

    // Interval algebra over the event stream: each event opens a session
    // interval [ts, ts + (event_id % 120 + 1) s); per user, report the
    // UNION length of the intervals (overlap-free covered time) and the
    // PEAK CONCURRENCY (max simultaneously-open intervals) — the
    // utilization/occupancy shape (ad delivery, device sessions, billing
    // meters) that naive sum-of-durations double-counts. Sweep-line as
    // pure windows: coverage adds max(0, end - max(start, prev_max_end))
    // under a (user, start) sort; concurrency is a running sum over
    // +1/-1 boundary events where ends sort BEFORE starts at the same
    // instant (half-open intervals). Everything is integer microseconds;
    // both window families and both aggregations share the user_id
    // partitioning — one exchange family, never a global sort.
    "q212_interval_coverage" -> { (s, dir) =>
      val iv = t(s, dir, "events").select(
        col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("s_us"),
        (unix_micros(col("ts")) +
          (col("event_id") % 120 + 1) * lit(1000000L)).as("e_us"))
      val wPrev = Window.partitionBy("user_id")
        .orderBy("s_us", "e_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val cov = iv
        .withColumn("prev_max", max(col("e_us")).over(wPrev))
        .withColumn("add", greatest(
          col("e_us") - greatest(col("s_us"), coalesce(col("prev_max"), col("s_us"))),
          lit(0L)))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_intervals"), sum("add").as("covered_us"))
      val bounds = iv.select(col("user_id"), col("s_us").as("tick"), lit(1L).as("d"))
        .unionAll(iv.select(col("user_id"), col("e_us").as("tick"), lit(-1L).as("d")))
      // Default RANGE frame: peers at the same (tick, d) aggregate
      // together, so the running sum is tie-order-independent.
      val wRun = Window.partitionBy("user_id").orderBy("tick", "d")
      val peak = bounds
        .withColumn("run", sum(col("d")).over(wRun))
        .groupBy("user_id")
        .agg(max("run").as("peak_concurrency"))
      cov.join(peak, Seq("user_id")).orderBy("user_id")
    },

    // CUSUM change-point detection on the daily event-type series — the
    // drift monitor PSI (q209) cannot give: WHERE in time a rate shifted,
    // not just that two cohorts differ. The sequential recurrence
    // S_t = max(0, S_{t-1} + dev_t) is closed-formed as
    // S_t = P_t - min(0, running_min(P)) over the prefix sums P of the
    // integer deviations dev_t = x_t * D - T (count scaled by day count
    // minus total: exactly "x_t - mean" with no division) — so the whole
    // CUSUM is two window passes per event_type, all BIGINT, replayed
    // exactly by DuckDB. Alarm when 4*S exceeds T*D (cumulative excess
    // above a quarter of the mean total).
    "q213_cusum_drift" -> { (s, dir) =>
      val daily = t(s, dir, "events")
        .groupBy(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("day"))
        .agg(count(lit(1)).as("x"))
      val tot = daily.groupBy("event_type")
        .agg(count(lit(1)).as("dd"), sum("x").as("tt"))
      val wp = Window.partitionBy("event_type").orderBy("day")
      daily.join(tot, Seq("event_type"))
        .withColumn("dev", col("x") * col("dd") - col("tt"))
        .withColumn("p", sum(col("dev")).over(wp))
        .withColumn("cusum", col("p") - least(lit(0L), min(col("p")).over(wp)))
        .select(col("event_type"), col("day"), col("x"), col("cusum"),
          (col("cusum") * 4 > col("tt") * col("dd")).as("alarm"))
        .orderBy("event_type", "day")
    }
  )

  val oracles: Map[String, String] = Map(
    "q157_funnel" ->
      """WITH e AS (SELECT user_id, event_type, ts::TIMESTAMP ts FROM events),
        |v AS (SELECT user_id, min(ts) t1 FROM e WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(ts) t2 FROM e JOIN v USING (user_id)
        |      WHERE event_type = 'click' AND ts > t1
        |        AND ts <= t1 + INTERVAL 2 HOUR GROUP BY 1),
        |p AS (SELECT e.user_id, min(ts) t3 FROM e JOIN c USING (user_id)
        |      WHERE event_type = 'purchase' AND ts > t2
        |        AND ts <= t2 + INTERVAL 24 HOUR GROUP BY 1),
        |steps AS (
        |  SELECT 1 AS step, 'view' AS stage, count(*)::BIGINT AS n_users FROM v
        |  UNION ALL
        |  SELECT 2, 'click', count(*)::BIGINT FROM c
        |  UNION ALL
        |  SELECT 3, 'purchase', count(*)::BIGINT FROM p)
        |SELECT step, stage, n_users,
        |  CASE WHEN lag(n_users) OVER (ORDER BY step) > 0
        |    THEN round(n_users / lag(n_users) OVER (ORDER BY step), 4) END
        |    AS pct_of_prev
        |FROM steps ORDER BY step""".stripMargin,

    "q158_cohort_retention" ->
      """WITH o AS (SELECT o_custkey, o_orderdate::DATE od FROM orders),
        |first AS (SELECT o_custkey, date_trunc('month', min(od))::DATE AS cohort_month
        |          FROM o GROUP BY 1),
        |sizes AS (SELECT cohort_month, count(*)::BIGINT AS cohort_size
        |          FROM first GROUP BY 1),
        |act AS (SELECT DISTINCT cohort_month, o.o_custkey,
        |    (year(od) * 12 + month(od)) -
        |      (year(cohort_month) * 12 + month(cohort_month)) AS month_offset
        |  FROM o JOIN first USING (o_custkey))
        |SELECT cohort_month, month_offset, count(*)::BIGINT AS n_active,
        |  cohort_size, round(count(*) / cohort_size, 4) AS retention_pct
        |FROM act JOIN sizes USING (cohort_month)
        |GROUP BY cohort_month, month_offset, cohort_size
        |ORDER BY cohort_month, month_offset""".stripMargin,

    "q159_gap_fill" ->
      """WITH daily AS (
        |  SELECT user_id, ts::DATE AS day, count(*)::BIGINT AS n_purchases,
        |    round(sum(value) * 100)::BIGINT AS v_cents
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
        |grid AS (
        |  SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
        |  FROM (SELECT user_id, min(day) d0, max(day) d1 FROM daily GROUP BY 1)),
        |filled AS (
        |  SELECT g.user_id, g.day, d.n_purchases, d.v_cents
        |  FROM grid g LEFT JOIN daily d USING (user_id, day)),
        |win AS (
        |  SELECT user_id, day, n_purchases, v_cents,
        |    last_value(v_cents IGNORE NULLS) OVER bk AS prev_c,
        |    last_value(CASE WHEN v_cents IS NOT NULL THEN day END IGNORE NULLS)
        |      OVER bk AS prev_d,
        |    first_value(v_cents IGNORE NULLS) OVER fw AS next_c,
        |    first_value(CASE WHEN v_cents IS NOT NULL THEN day END IGNORE NULLS)
        |      OVER fw AS next_d
        |  FROM filled
        |  WINDOW bk AS (PARTITION BY user_id ORDER BY day
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |         fw AS (PARTITION BY user_id ORDER BY day
        |                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT user_id, day, coalesce(n_purchases, 0)::BIGINT AS n_purchases,
        |  prev_c AS locf_cents,
        |  (CASE WHEN v_cents IS NOT NULL THEN v_cents
        |    ELSE (prev_c * (datediff('day', day, next_d)) +
        |          next_c * (datediff('day', prev_d, day)))
        |         // datediff('day', prev_d, next_d)
        |    END)::BIGINT AS lerp_cents
        |FROM win ORDER BY user_id, day""".stripMargin,

    "q160_scd2_history" ->
      """WITH e AS (SELECT user_id, event_type, ts::TIMESTAMP ts, event_id
        |           FROM events WHERE user_id % 5 = 0),
        |chg AS (SELECT user_id, event_type, ts, event_id,
        |    CASE WHEN lag(event_type) OVER w IS NULL
        |           OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS is_chg
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |ver AS (SELECT user_id, event_type, ts,
        |    sum(is_chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING)::BIGINT AS version
        |  FROM chg),
        |iv AS (SELECT user_id, version, event_type, min(ts) AS valid_from,
        |    count(*)::BIGINT AS n_events
        |  FROM ver GROUP BY 1, 2, 3)
        |SELECT user_id, version, event_type, valid_from,
        |  lead(valid_from) OVER (PARTITION BY user_id ORDER BY version) AS valid_to,
        |  lead(valid_from) OVER (PARTITION BY user_id ORDER BY version) IS NULL
        |    AS is_current,
        |  n_events
        |FROM iv ORDER BY user_id, version""".stripMargin,

    "q171_market_basket" ->
      """WITH baskets AS (
        |  SELECT DISTINCT l_orderkey AS okey, p_brand AS brand
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |n AS (SELECT count(DISTINCT okey)::DOUBLE AS n_orders FROM baskets),
        |bc AS (SELECT brand, count(*)::BIGINT AS n_brand FROM baskets GROUP BY 1),
        |pairs AS (
        |  SELECT a.brand AS brand_a, b.brand AS brand_b, count(*)::BIGINT AS n_pair
        |  FROM baskets a JOIN baskets b
        |    ON a.okey = b.okey AND a.brand < b.brand
        |  GROUP BY 1, 2)
        |SELECT brand_a, brand_b, n_pair,
        |  round(n_pair / n_orders, 6) AS support,
        |  round(n_pair / ca.n_brand, 6) AS confidence,
        |  round((n_pair * n_orders) / (ca.n_brand * cb.n_brand), 6) AS lift
        |FROM pairs
        |JOIN bc ca ON ca.brand = brand_a
        |JOIN bc cb ON cb.brand = brand_b
        |CROSS JOIN n
        |ORDER BY n_pair DESC, brand_a, brand_b LIMIT 25""".stripMargin,

    "q172_event_transitions" ->
      """WITH e AS (
        |  SELECT user_id, ts::TIMESTAMP AS ts, event_id, event_type FROM events),
        |steps AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS to_type
        |  FROM e),
        |trans AS (
        |  SELECT from_type, to_type, count(*)::BIGINT AS n
        |  FROM steps WHERE to_type IS NOT NULL GROUP BY 1, 2),
        |tot AS (SELECT from_type, sum(n)::BIGINT AS n_from FROM trans GROUP BY 1)
        |SELECT from_type, to_type, n, round(n / n_from, 6) AS p
        |FROM trans JOIN tot USING (from_type)
        |ORDER BY from_type, to_type""".stripMargin,

    // q173: exact rolling distinct via the same 7-day grid; the sketch
    // estimate is engine-defined, so the envelope boolean pins TRUE
    // (the q66/q142 contract pattern).
    "q173_rolling_distinct" ->
      """WITH e AS (SELECT DISTINCT ts::DATE AS day, user_id FROM events),
        |days AS (SELECT DISTINCT day FROM e)
        |SELECT d.day, count(DISTINCT e.user_id)::BIGINT AS n_users_7d,
        |  true AS sketch_ok
        |FROM days d JOIN e ON e.day BETWEEN d.day - 6 AND d.day
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q177_survival_curve" ->
      """WITH e AS (SELECT user_id, event_type, ts::TIMESTAMP AS ts FROM events),
        |su AS (SELECT user_id, min(ts) AS t0 FROM e
        |       WHERE event_type = 'signup' GROUP BY 1),
        |cv AS (SELECT e.user_id, min(ts) AS t1 FROM e JOIN su USING (user_id)
        |       WHERE event_type = 'purchase' AND ts > t0 GROUP BY 1),
        |hz AS (SELECT max(ts) AS tmax FROM e),
        |u AS (SELECT su.user_id,
        |    (epoch_us(t1) - epoch_us(t0)) // 86400000000 AS conv_day,
        |    (epoch_us(tmax) - epoch_us(t0)) // 86400000000 AS censor_day
        |  FROM su LEFT JOIN cv USING (user_id), hz),
        |dd AS (SELECT unnest(range(0, 15)) AS d)
        |SELECT d, count(*)::BIGINT AS n_observable,
        |  sum(CASE WHEN conv_day IS NOT NULL AND conv_day <= d
        |      THEN 1 ELSE 0 END)::BIGINT AS n_converted,
        |  round(sum(CASE WHEN conv_day IS NOT NULL AND conv_day <= d
        |      THEN 1 ELSE 0 END) / count(*), 6) AS conversion_rate
        |FROM u, dd WHERE censor_day >= d
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q161_expectations" ->
      """WITH m AS (SELECT
        |    count(*)::BIGINT AS n,
        |    (SELECT count(*) FROM
        |      (SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem))::BIGINT AS n_pk,
        |    count(l_quantity)::BIGINT AS n_qty,
        |    count(l_returnflag)::BIGINT AS n_rf,
        |    min(l_quantity) AS min_qty,
        |    min(l_discount) AS min_disc,
        |    max(l_discount) AS max_disc,
        |    sum(CASE WHEN l_returnflag IN ('A','N','R') THEN 0 ELSE 1 END)::BIGINT
        |      AS n_bad_rf,
        |    max(l_shipdate) AS max_sd
        |  FROM lineitem)
        |SELECT * FROM (
        |  SELECT 'row_count' AS check_name, n::DOUBLE AS metric, n > 0 AS passed FROM m
        |  UNION ALL SELECT 'pk_unique', round(n_pk / n, 6), n_pk = n FROM m
        |  UNION ALL SELECT 'complete_l_quantity', round(n_qty / n, 6), n_qty = n FROM m
        |  UNION ALL SELECT 'complete_l_returnflag', round(n_rf / n, 6), n_rf = n FROM m
        |  UNION ALL SELECT 'range_l_discount', round(max_disc, 6),
        |    min_disc >= 0.0 AND max_disc <= 1.0 FROM m
        |  UNION ALL SELECT 'positive_l_quantity', round(min_qty, 6), min_qty > 0.0 FROM m
        |  UNION ALL SELECT 'set_l_returnflag', n_bad_rf::DOUBLE, n_bad_rf = 0 FROM m
        |  UNION ALL SELECT 'freshness_l_shipdate', year(max_sd)::DOUBLE,
        |    max_sd >= TIMESTAMP '2001-01-01 00:00:00' FROM m)
        |ORDER BY check_name""".stripMargin,

    "q212_interval_coverage" ->
      """WITH iv AS (
        |  SELECT user_id, event_id,
        |    epoch_us(ts::TIMESTAMP) AS s_us,
        |    epoch_us(ts::TIMESTAMP) + ((event_id % 120) + 1) * 1000000 AS e_us
        |  FROM events),
        |cov AS (
        |  SELECT user_id,
        |    greatest(e_us - greatest(s_us,
        |      coalesce(max(e_us) OVER (PARTITION BY user_id
        |        ORDER BY s_us, e_us, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), s_us)),
        |      0) AS adds
        |  FROM iv),
        |bounds AS (
        |  SELECT user_id, s_us AS tick, 1 AS d FROM iv
        |  UNION ALL
        |  SELECT user_id, e_us, -1 FROM iv),
        |conc AS (
        |  SELECT user_id,
        |    sum(d) OVER (PARTITION BY user_id ORDER BY tick, d) AS run
        |  FROM bounds)
        |SELECT c.user_id, c.n_intervals, c.covered_us, p.peak_concurrency
        |FROM (SELECT user_id, count(*)::BIGINT AS n_intervals,
        |        sum(adds)::BIGINT AS covered_us FROM cov GROUP BY 1) c
        |JOIN (SELECT user_id, max(run)::BIGINT AS peak_concurrency
        |      FROM conc GROUP BY 1) p USING (user_id)
        |ORDER BY user_id""".stripMargin,

    "q213_cusum_drift" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_us(ts::TIMESTAMP) // 86400000000 AS day,
        |    count(*)::BIGINT AS x
        |  FROM events GROUP BY 1, 2),
        |tot AS (
        |  SELECT event_type, count(*)::BIGINT AS dd, sum(x)::BIGINT AS tt
        |  FROM daily GROUP BY 1),
        |pre AS (
        |  SELECT d.event_type, d.day, d.x, t.dd, t.tt,
        |    sum(d.x * t.dd - t.tt) OVER (PARTITION BY d.event_type
        |      ORDER BY d.day) AS p
        |  FROM daily d JOIN tot t USING (event_type)),
        |cus AS (
        |  SELECT event_type, day, x, dd, tt,
        |    p - least(0, min(p) OVER (PARTITION BY event_type ORDER BY day))
        |      AS cusum
        |  FROM pre)
        |SELECT event_type, day, x, cusum::BIGINT AS cusum,
        |  cusum * 4 > tt * dd AS alarm
        |FROM cus ORDER BY event_type, day""".stripMargin
  )
}
