package graft.gold

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.text.TextAnalysis

/** Gold-layer analytics beyond plain group-by: hierarchical rollups,
  * pivots, exact percentiles, corpus term statistics. All oracle-checked.
  */
object AnalyticsQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q3 shape (shipping priority): 3-way join, date filters,
    // revenue agg, top-10.
    "q50_tpch_q3" -> { (s, dir) =>
      val cutoff = lit("1998-06-01").cast("date")
      t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
        .filter(col("o_orderdate") < cutoff)
        .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .filter(col("l_shipdate") > cutoff)
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },

    // TPC-H Q5 shape (local supplier volume): 6-way join where supplier
    // and customer share a nation, per-nation revenue.
    "q51_tpch_q5" -> { (s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
        .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .join(t(s, dir, "supplier"),
          col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .groupBy(col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },

    // TPC-H Q10 shape (returned-item reporting): revenue lost to returns
    // per customer, top-20.
    "q52_tpch_q10" -> { (s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
        .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .filter(col("l_returnflag") === "R")
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },

    // TPC-H Q18 shape (large-volume customers): the HAVING subquery
    // becomes an aggregated semi-join — ONE pass over lineitem builds
    // the qualifying-order set (no correlated re-scan), and because the
    // >300 filter is highly selective the set is tiny relative to
    // orders; AQE converts the semi-join to broadcast at runtime from
    // the measured shuffle size (no hard-coded hint, so the plan
    // degrades to a shuffle join if a pathological threshold ever
    // makes the set large).
    "q71_tpch_q18" -> { (s, dir) =>
      val li = t(s, dir, "lineitem")
      val big = li.groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("sq"))
        .filter(col("sq") > 300)
        .select(col("l_orderkey").as("big_orderkey"))
      t(s, dir, "orders")
        .join(big, col("o_orderkey") === col("big_orderkey"), "left_semi")
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"))
        .agg(round(sum(col("l_quantity")), 2).as("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    },

    // TPC-H Q21 shape (suppliers who kept orders waiting) — the hardest
    // public anti-join stressor: 4-way join + EXISTS + NOT EXISTS, both
    // correlated on (same order, DIFFERENT supplier). The testdata
    // lineitem has no receipt/commit dates, so "problem line" is
    // l_returnflag = 'R' — the join/semi/anti algebra is Q21's exactly.
    // Plan shape (PlanSpec-gated): the nation filter rides a broadcast
    // dim join and shrinks the fact side ~25× BEFORE the two heavy
    // correlated joins; EXISTS/NOT EXISTS become left-semi/left-anti
    // joins whose equi key is l_orderkey with the <> predicate as a
    // residual condition — hash-partitioned joins, never a cartesian or
    // a per-row re-scan of lineitem.
    "q110_tpch_q21" -> { (s, dir) =>
      val li = t(s, dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_returnflag")
      val late = li.filter(col("l_returnflag") === "R")
        .select("l_orderkey", "l_suppkey")
      val suppNation = t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .filter(col("n_name") === "NATION_3")
        .select("s_suppkey", "s_name")
      late.as("l1")
        .join(suppNation, col("l_suppkey") === col("s_suppkey"))
        .join(t(s, dir, "orders")
            .filter(col("o_orderstatus") === "F").select("o_orderkey"),
          col("l_orderkey") === col("o_orderkey"), "left_semi")
        .join(li.as("l2"),
          col("l1.l_orderkey") === col("l2.l_orderkey") &&
            col("l1.l_suppkey") =!= col("l2.l_suppkey"), "left_semi")
        .join(late.as("l3"),
          col("l1.l_orderkey") === col("l3.l_orderkey") &&
            col("l1.l_suppkey") =!= col("l3.l_suppkey"), "left_anti")
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(100)
    },

    // TPC-H Q22 shape (global-acquaintance check): a scalar aggregate
    // subquery (average positive balance — computed from the EXACT
    // decimal sum cast to double, so both engines derive the bit-same
    // threshold regardless of summation order) broadcast against the
    // full customer table, then NOT EXISTS against pending orders as a
    // plain anti equi-join on the pre-filtered order side. The testdata
    // has no c_phone, so the classic country-code grouping is the
    // nation key.
    "q113_tpch_q22" -> { (s, dir) =>
      val cust = t(s, dir, "customer")
      val avgBal = cust.filter(col("c_acctbal") > 0)
        .agg((sum(col("c_acctbal").cast("decimal(18,2)")).cast("double") /
          count(lit(1)).cast("double")).as("ab"))
      cust.crossJoin(broadcast(avgBal))
        .filter(col("c_acctbal") > col("ab"))
        .join(t(s, dir, "orders").filter(col("o_orderstatus") === "P")
            .select("o_custkey"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("numcust"),
          round(sum(col("c_acctbal").cast("decimal(18,2)")).cast("double"), 2)
            .as("totacctbal"))
        .orderBy("c_nationkey")
    },

    // TPC-H Q17 shape (small-quantity-order revenue): the correlated
    // per-part scalar subquery (0.2 × avg quantity of THIS part) becomes
    // one aggregate over the brand-semi-filtered fact side joined back
    // on the part key — the decorrelation a 100 TB plan needs, never a
    // per-row re-scan. l_quantity is integral in this testdata, so the
    // double average is order-independent-exact and the threshold
    // comparison is deterministic across engines; revenue sums ride
    // DECIMAL(18,2) (the q74/q72 discipline).
    "q114_tpch_q17" -> { (s, dir) =>
      val li = t(s, dir, "lineitem")
      val brand = t(s, dir, "part")
        .filter(col("p_brand") === "Brand#1").select("p_partkey")
      val brandLi = li
        .join(brand, col("l_partkey") === col("p_partkey"), "left_semi")
        .select("l_partkey", "l_quantity", "l_extendedprice")
      val thr = brandLi.groupBy(col("l_partkey"))
        .agg((lit(0.2) * avg(col("l_quantity"))).as("thr"))
      brandLi
        .join(thr, "l_partkey")
        .filter(col("l_quantity") < col("thr"))
        .agg(round(sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
          / 7.0, 2).as("avg_yearly"))
    },

    // TPC-H Q13 shape (customer order-count distribution): left OUTER
    // join with the predicate on the JOIN side (a WHERE would silently
    // drop the zero-order customers the query exists to count), then a
    // two-level aggregation — per-customer count, then the histogram of
    // those counts. Both aggregations are partial+final hash aggs; the
    // outer join shuffles once on the customer key.
    "q118_tpch_q13" -> { (s, dir) =>
      val cust = t(s, dir, "customer").select("c_custkey")
      val ord = t(s, dir, "orders")
        .filter(col("o_orderpriority") =!= "1-URGENT")
        .select("o_custkey", "o_orderkey")
      cust.join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },

    // TPC-H Q2 shape (min-cost supplier): the correlated scalar
    // subquery ("the minimum supply cost FOR THIS PART") decorrelates
    // into one (part, supplier) aggregate reused twice — once re-grouped
    // to the per-part minimum, once joined back on (part, cost) to
    // recover WHICH suppliers achieve it. The testdata has no partsupp
    // table, so supply cost is min(l_extendedprice) per (part, supplier)
    // pair — min is order-independent-exact in doubles, so the equality
    // join back is deterministic. Dim joins (supplier→nation→region)
    // broadcast.
    "q119_tpch_q2" -> { (s, dir) =>
      val ps = t(s, dir, "lineitem")
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(min(col("l_extendedprice")).as("supplycost"))
      val best = ps.groupBy(col("l_partkey"))
        .agg(min(col("supplycost")).as("minc"))
      val supp = t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation")
            .join(broadcast(t(s, dir, "region")
                .filter(col("r_name") === "ASIA").select("r_regionkey")),
              col("n_regionkey") === col("r_regionkey"))
            .select("n_nationkey", "n_name")),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
      ps.as("ps").join(best.as("b"),
          col("ps.l_partkey") === col("b.l_partkey") &&
            col("ps.supplycost") === col("b.minc"))
        .select(col("ps.l_partkey").as("p_key"), col("ps.l_suppkey").as("l_suppkey"),
          col("ps.supplycost").as("supplycost"))
        .join(supp, col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "part").filter(col("p_size") === 5)
            .select("p_partkey", "p_brand")),
          col("p_key") === col("p_partkey"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"),
          col("p_partkey"), col("p_brand"),
          round(col("supplycost"), 2).as("supplycost"))
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
          col("p_partkey"))
        .limit(100)
    },

    // TPC-H Q20 shape (excess-stock suppliers): the nested correlated
    // IN — suppliers whose first-half-1997 shipped quantity of any
    // LIKE-matched part exceeds half that pair's full-period quantity —
    // becomes ONE conditional aggregate per (part, supplier) pair (the
    // correlated re-scan a naive plan would run per pair), a semi join
    // against the name-filtered part dim, and a final semi join into
    // supplier. l_quantity is integral so the double sums and the 0.5×
    // threshold compare exactly.
    "q120_tpch_q20" -> { (s, dir) =>
      val pairs = t(s, dir, "lineitem")
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(
          sum(when(col("l_shipdate") < lit("1997-01-01").cast("date"),
            col("l_quantity")).otherwise(lit(0.0))).as("early_qty"),
          sum(col("l_quantity")).as("total_qty"))
      val hot = pairs
        .join(t(s, dir, "part").filter(col("p_name").startsWith("red"))
            .select("p_partkey"),
          col("l_partkey") === col("p_partkey"), "left_semi")
        .filter(col("early_qty") > lit(0.5) * col("total_qty"))
        .select("l_suppkey")
      t(s, dir, "supplier")
        .join(hot, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_name"), col("n_name"))
        .orderBy("s_name")
    },

    // TPC-H Q7 shape (volume shipping between two nations, by year):
    // the two-sided nation pair predicate ((A,B) or (B,A)) rides the
    // broadcast nation dims on BOTH legs (supplier side and customer
    // side), so the fact table shuffles only for its orders join; the
    // year × nation-pair aggregation is partial+final. Revenue rides
    // DECIMAL(18,4) per the q72 discipline (per-row product is one
    // double op, bit-identical across engines; the SUM is then exact in
    // any order).
    "q121_tpch_q7" -> { (s, dir) =>
      val rev = (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast("decimal(18,4)")
      val n1 = t(s, dir, "nation").select(
        col("n_nationkey").as("s_nkey"), col("n_name").as("supp_nation"))
      val n2 = t(s, dir, "nation").select(
        col("n_nationkey").as("c_nkey"), col("n_name").as("cust_nation"))
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"),
          year(col("l_shipdate")).as("l_year"), rev.as("volume"))
        .join(t(s, dir, "orders").select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "supplier").select("s_suppkey", "s_nationkey"),
          col("l_suppkey") === col("s_suppkey"))
        .join(t(s, dir, "customer").select("c_custkey", "c_nationkey"),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(n1), col("s_nationkey") === col("s_nkey"))
        .join(broadcast(n2), col("c_nationkey") === col("c_nkey"))
        .filter(
          (col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
            (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
        .agg(round(sum(col("volume")).cast("double"), 2).as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    },

    // Sequential analytics (lag + bounded-frame rolling sum) per
    // customer order history. One window partitioning serves both
    // functions — a single shuffle on o_custkey; the (date, key) sort
    // is a total order so lag/frame contents are deterministic. The
    // rolling aggregate runs over DECIMAL(18,2) — exact in both engines
    // regardless of summation order — and casts back to double at the
    // end (a double avg differs in the last ulp between engines and
    // flips 2-dp rounding at half-cent boundaries; measured 53 rows at
    // sf0.01). lag subtraction is a single double op, exact as-is.
    "q74_rolling" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, dir, "orders").select(
        col("o_custkey"), col("o_orderkey"),
        round(col("o_totalprice") - lag(col("o_totalprice"), 1).over(w), 2)
          .as("delta_prev"),
        round(sum(col("o_totalprice").cast("decimal(18,2)"))
          .over(w.rowsBetween(-2, 0)).cast("double"), 2).as("sum3"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // TPC-H Q14 shape (promotion effect): conditional aggregate ratio
    // over one shipdate month, part dim joins broadcast. The per-row
    // revenue product is a single double op (bit-identical across
    // engines) quantized to DECIMAL(18,4) so the SUM is exact in any
    // summation order — a double sum differs in the last ulp between
    // partitionings and can flip the 4-dp rounding (same failure mode
    // q74 fixed with DECIMAL(18,2)). Ratio + round run on doubles after
    // the exact sums.
    "q72_tpch_q14" -> { (s, dir) =>
      val rev = (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast("decimal(18,4)")
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-09-01").cast("date") &&
          col("l_shipdate") < lit("1997-10-01").cast("date"))
        .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .agg(round(lit(100.0) *
          sum(when(col("p_type").startsWith("PROMO"), rev)
            .otherwise(lit(0).cast("decimal(18,4)"))).cast("double") /
          sum(rev).cast("double"), 4).as("promo_revenue_pct"))
    },

    // Hierarchical rollup: per (year, month) + per-year subtotals + grand
    // total in one pass.
    "q40_rollup" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .withColumn("ship_year", year(col("l_shipdate")))
        .withColumn("ship_month", month(col("l_shipdate")))
        .rollup(col("ship_year"), col("ship_month"))
        .agg(count(lit(1)).as("n_items"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("ship_year").asc_nulls_first, col("ship_month").asc_nulls_first)
    },

    // Cube: all grouping-set combinations of (returnflag, linestatus).
    "q56_cube" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_quantity")), 2).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    },

    // Pivot: quantity totals per returnflag, one column per linestatus.
    "q41_pivot" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(round(sum(col("l_quantity")), 2))
        .withColumnsRenamed(Map("F" -> "qty_f", "O" -> "qty_o"))
        .orderBy("l_returnflag")
    },

    // Exact linear-interpolation percentiles per event type.
    "q42_percentiles" -> { (s, dir) =>
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(
          round(expr("percentile(value, 0.25)"), 6).as("p25"),
          round(expr("percentile(value, 0.5)"), 6).as("p50"),
          round(expr("percentile(value, 0.75)"), 6).as("p75"),
          round(expr("percentile(value, 0.99)"), 6).as("p99"))
        .orderBy("event_type")
    },

    // Corpus data card: the per-language summary every training-data
    // release ships — doc counts, length quantiles, token totals.
    "q49_corpus_report" -> { (s, dir) =>
      t(s, dir, "documents")
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(graft.text.TextAnalysis.tokenCount(col("text")).cast("long")).as("total_tokens"),
          round(avg(col("n_chars")), 6).as("avg_chars"),
          round(expr("percentile(n_chars, 0.5)"), 6).as("median_chars"),
          min(col("n_chars")).as("min_chars"),
          max(col("n_chars")).as("max_chars"))
        .orderBy("lang")
    },

    // Corpus term statistics: top 20 tokens by document frequency with
    // inverse document frequency.
    "q43_top_terms" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      // Corpus size joins in as a 1-row frame — an eager count() here
      // would scan the table twice per invocation.
      val n = docs.agg(count(lit(1)).cast("double").as("__n"))
      docs
        .select(col("doc_id"), explode(array_distinct(TextAnalysis.tokens(col("text")))).as("term"))
        .groupBy(col("term"))
        .agg(count(lit(1)).as("doc_freq"))
        .crossJoin(n)
        .withColumn("idf", round(log(col("__n") / col("doc_freq")), 6))
        .drop("__n")
        .orderBy(col("doc_freq").desc, col("term"))
        .limit(20)
    },

    // HLL sketch distinct counting — the 100 TB cardinality path (exact
    // distinct shuffles every value; a sketch ships bytes). DuckDB pins
    // the exact count; the one-shot estimate must land inside the error
    // envelope, and the union of per-group sketches must give the SAME
    // answer under two different groupings (register max-union is
    // order- and partitioning-independent — the property that makes
    // sketches pre-aggregable in a silver layer). Note the direct
    // sketch's estimate is NOT compared for equality against a union's:
    // direct sketches use the HIP estimator, unions the composite one,
    // and they legitimately differ in dense mode.
    "q66_approx_distinct" -> { (s, dir) =>
      val li = t(s, dir, "lineitem")
      def unionBy(g: String) = li
        .groupBy(col(g))
        .agg(hll_sketch_agg(col("l_orderkey")).as("sk"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as(s"m_$g"))
      val global = li.agg(
        countDistinct(col("l_orderkey")).as("n_exact"),
        hll_sketch_estimate(hll_sketch_agg(col("l_orderkey"))).as("approx"))
      global
        .crossJoin(unionBy("l_returnflag"))
        .crossJoin(unionBy("l_linestatus"))
        .select(
          col("n_exact"),
          (abs(col("approx") - col("n_exact")) <= col("n_exact") * lit(0.1)).as("approx_ok"),
          (col("m_l_returnflag") === col("m_l_linestatus") &&
            abs(col("m_l_returnflag") - col("n_exact")) <= col("n_exact") * lit(0.1))
            .as("merge_ok"))
    },

    // TPC-H Q4 shape (order-priority checking): the correlated EXISTS
    // ("some lineitem of this order shipped late") is a left-semi join
    // whose non-equi lateness conjunct rides the equi join on the order
    // key — one shuffle, no per-order re-scan. The testdata has no
    // l_commitdate/l_receiptdate, so "late" is shipdate > orderdate+30d
    // (documented stand-in, identical in the oracle).
    "q124_tpch_q4" -> { (s, dir) =>
      t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("date") &&
          col("o_orderdate") < lit("1997-04-01").cast("date"))
        .join(t(s, dir, "lineitem").select("l_orderkey", "l_shipdate"),
          col("o_orderkey") === col("l_orderkey") &&
            col("l_shipdate") > date_add(col("o_orderdate"), 30), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    },

    // TPC-H Q6 shape (forecast-revenue change): the all-scan-side
    // predicate query — every filter (shipdate range, discount band,
    // quantity cap) pushes to the parquet scan, no join, one
    // partial+final agg. Per-row product is one double op; DECIMAL(18,4)
    // makes the SUM order-exact (q72 discipline).
    "q125_tpch_q6" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("date") &&
          col("l_shipdate") < lit("1998-01-01").cast("date") &&
          col("l_discount") >= 0.03 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(round(sum((col("l_extendedprice") * col("l_discount"))
          .cast("decimal(18,4)")).cast("double"), 2).as("revenue"))
    },

    // TPC-H Q8 shape (national market share): the CASE-inside-ratio
    // aggregate over a 5-table join. Part filter and the Europe customer
    // restriction ride left-semi joins (the fact table never widens);
    // nation/region dims broadcast. Both ratio legs are exact DECIMAL
    // sums cast to double only for the final division.
    "q126_tpch_q8" -> { (s, dir) =>
      val rev = (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast("decimal(18,4)")
      val custEur = t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")
            .join(broadcast(t(s, dir, "region").filter(col("r_name") === "EUROPE")
                .select("r_regionkey")),
              col("n_regionkey") === col("r_regionkey"))
            .select("n_nationkey")),
          col("c_nationkey") === col("n_nationkey"), "left_semi")
        .select("c_custkey")
      t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part").filter(col("p_type") === "ECONOMY")
            .select("p_partkey")),
          col("l_partkey") === col("p_partkey"), "left_semi")
        .select(col("l_orderkey"), col("l_suppkey"), rev.as("volume"))
        .join(t(s, dir, "orders")
            .filter(col("o_orderdate") >= lit("1996-01-01").cast("date") &&
              col("o_orderdate") < lit("1998-01-01").cast("date"))
            .select("o_orderkey", "o_custkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .join(custEur, col("o_custkey") === col("c_custkey"), "left_semi")
        .join(t(s, dir, "supplier").select("s_suppkey", "s_nationkey"),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "nation")
            .select(col("n_nationkey"), col("n_name").as("supp_nation"))),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(round(
          sum(when(col("supp_nation") === "NATION_3", col("volume"))
            .otherwise(lit(0).cast("decimal(18,4)"))).cast("double") /
            sum(col("volume")).cast("double"), 6).as("mkt_share"))
        .orderBy("o_year")
    },

    // TPC-H Q9 shape (product-type profit by nation and year). The
    // testdata has no partsupp, so supply cost is 0.01×p_retailprice per
    // unit (documented stand-in, identical in the oracle — the q119
    // discipline). Per-row profit is ONE double expression with the
    // oracle's exact op order, quantized to DECIMAL(18,4) so the grouped
    // SUM is order-exact.
    "q127_tpch_q9" -> { (s, dir) =>
      val profit = (col("l_extendedprice") * (lit(1.0) - col("l_discount")) -
        lit(0.01) * col("p_retailprice") * col("l_quantity"))
        .cast("decimal(18,4)")
      t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part").filter(col("p_name").contains("red"))
            .select("p_partkey", "p_retailprice")),
          col("l_partkey") === col("p_partkey"))
        .join(t(s, dir, "orders").select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "supplier").select("s_suppkey", "s_nationkey"),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
        .agg(round(sum(profit).cast("double"), 2).as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    },

    // TPC-H Q11 shape (important stock): per-part value restricted to
    // one nation's suppliers, HAVING against a global-scalar fraction.
    // The scalar threshold rides a broadcast cross join of the 1-row
    // re-aggregate — no collect, no second lineitem scan (the per-part
    // frame is localCheckpointed once and reused for both legs).
    "q128_tpch_q11" -> { (s, dir) =>
      val vals = t(s, dir, "lineitem")
        .join(t(s, dir, "supplier")
            .join(broadcast(t(s, dir, "nation")
                .filter(col("n_name") === "NATION_7").select("n_nationkey")),
              col("s_nationkey") === col("n_nationkey"), "left_semi")
            .select("s_suppkey"),
          col("l_suppkey") === col("s_suppkey"), "left_semi")
        .groupBy(col("l_partkey"))
        .agg(sum((col("l_extendedprice") * col("l_quantity"))
          .cast("decimal(18,4)")).as("part_value"))
        .localCheckpoint()
      vals
        .crossJoin(broadcast(vals.agg((sum(col("part_value")) * lit(0.001))
          .as("threshold"))))
        .filter(col("part_value") > col("threshold"))
        .select(col("l_partkey"),
          round(col("part_value").cast("double"), 2).as("part_value"))
        .orderBy(col("part_value").desc, col("l_partkey"))
    },

    // TPC-H Q12 shape (shipmode line-priority histogram): join + two
    // conditional counts. The testdata has no l_shipmode or receipt
    // dates, so l_linestatus stands in for the mode group and "received
    // late" is a shipdate 60–120 days after the order date (documented
    // stand-ins, identical in the oracle).
    "q129_tpch_q12" -> { (s, dir) =>
      val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      t(s, dir, "lineitem").select("l_orderkey", "l_linestatus", "l_shipdate")
        .join(t(s, dir, "orders")
            .select("o_orderkey", "o_orderdate", "o_orderpriority"),
          col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") >= date_add(col("o_orderdate"), 60) &&
          col("l_shipdate") < date_add(col("o_orderdate"), 120) &&
          col("l_shipdate") >= lit("1997-01-01").cast("date") &&
          col("l_shipdate") < lit("1998-01-01").cast("date"))
        .groupBy(col("l_linestatus"))
        .agg(
          sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(hi, 0L).otherwise(1L)).as("low_line_count"))
        .orderBy("l_linestatus")
    },

    // TPC-H Q15 shape (top supplier): the revenue "view" re-aggregates
    // to a scalar max, and WHICH suppliers achieve it comes back via an
    // exact-DECIMAL equality join (q119 decorrelation discipline —
    // doubles would be summation-order-dependent and could miss the
    // max row). The per-supplier frame is localCheckpointed and reused.
    "q130_tpch_q15" -> { (s, dir) =>
      val rev = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("date") &&
          col("l_shipdate") < lit("1997-07-01").cast("date"))
        .groupBy(col("l_suppkey"))
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)")).as("total_revenue"))
        .localCheckpoint()
      rev
        .crossJoin(broadcast(rev.agg(max(col("total_revenue")).as("max_rev"))))
        .filter(col("total_revenue") === col("max_rev"))
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          round(col("total_revenue").cast("double"), 2).as("total_revenue"))
        .orderBy("s_suppkey")
    },

    // TPC-H Q16 shape (parts/supplier relationship): count-distinct
    // suppliers per (brand, type, size) with a NOT IN exclusion. The
    // testdata has no s_comment, so the complaint exclusion is
    // negative-balance suppliers (documented stand-in) riding a
    // broadcast anti join; the part dim filter broadcasts too, so the
    // only shuffle is the final distinct-count aggregation.
    "q131_tpch_q16" -> { (s, dir) =>
      t(s, dir, "lineitem").select("l_partkey", "l_suppkey")
        .join(broadcast(t(s, dir, "part")
            .filter(col("p_brand") =!= "Brand#5" &&
              col("p_size").isin(1, 2, 9, 17, 25, 33, 41, 49))
            .select("p_partkey", "p_brand", "p_type", "p_size")),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(t(s, dir, "supplier").filter(col("s_acctbal") < 0)
            .select("s_suppkey")),
          col("l_suppkey") === col("s_suppkey"), "left_anti")
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))
    },

    // TPC-H Q19 shape (discounted revenue, disjunctive predicates): the
    // OR-of-ANDs over (brand, quantity band, size band) stays one scan +
    // one broadcast join — Catalyst extracts the common l_partkey join
    // key and evaluates the disjunction post-join; no union-of-three-
    // scans rewrite needed.
    "q132_tpch_q19" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part")
            .select("p_partkey", "p_brand", "p_size")),
          col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#12" && col("l_quantity").between(1, 11) &&
            col("p_size").between(1, 5)) ||
            (col("p_brand") === "Brand#23" && col("l_quantity").between(10, 20) &&
              col("p_size").between(1, 10)) ||
            (col("p_brand") === "Brand#3" && col("l_quantity").between(20, 30) &&
              col("p_size").between(1, 15)))
        .agg(round(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)")).cast("double"), 2).as("revenue"))
    },

    // PageRank over the symmetric supplier↔customer trade graph (edges
    // = distinct (supplier, customer) pairs via orders, both
    // directions, so no node dangles and mass is conserved) — the
    // propagation class of graph analytics beside ConnectedComponents'
    // connectivity class. 3 fixed iterations, damping 0.85; every
    // iteration is keyed-join + partial/final agg, DECIMAL-exact
    // contribution sums, 12dp rank rounding — bit-identical across
    // engines, so DuckDB replays all three rounds unrolled. Top-20 by
    // rank with an id tie-break.
    "q141_pagerank" -> { (s, dir) =>
      val pairs = t(s, dir, "lineitem").select("l_orderkey", "l_suppkey")
        .join(t(s, dir, "orders").select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .select((col("l_suppkey") + 1000000L).as("supp"),
          col("o_custkey").as("cust"))
        .distinct()
      val edges = pairs.select(col("supp").as("src"), col("cust").as("dst"))
        .unionAll(pairs.select(col("cust").as("src"), col("supp").as("dst")))
      graft.operators.PageRank.run(edges, iterations = 3)
        .orderBy(col("rank").desc, col("id"))
        .limit(20)
        .select(col("id"), round(col("rank"), 6).as("rank"))
    },

    // Community detection by synchronous label propagation over the same
    // supplier↔customer graph as q141 — self-vote variant with a total
    // (count desc, label asc) tie-break, so the three rounds replay
    // hash-exact in the oracle (integer-only state, the q141/q162
    // iteration-replay discipline).
    "q165_label_prop" -> { (s, dir) =>
      val pairs = t(s, dir, "lineitem").select("l_orderkey", "l_suppkey")
        .join(t(s, dir, "orders").select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .select((col("l_suppkey") + 1000000L).as("supp"),
          col("o_custkey").as("cust"))
        .distinct()
      val edges = pairs.select(col("supp").as("src"), col("cust").as("dst"))
        .unionAll(pairs.select(col("cust").as("src"), col("supp").as("dst")))
      graft.operators.LabelPropagation.run(edges, iterations = 3)
        .orderBy("id")
    },

    // Approximate percentiles — the quantile-sketch sibling of q66's
    // HLL contract: at 100 TB an exact percentile sorts every value
    // through one partition, a GK/KLL-style sketch ships kilobytes.
    // The estimate is engine-defined, so the gate is an error-envelope
    // contract: each approx value must land inside an EXACT (q42-style)
    // quantile band — ±5 rank-percentiles for p50, and [p98, max] for
    // p99 (the upper leg is capped by the distribution's end) — ~10-50×
    // looser than the sketch's configured 1/1000 rank error, tight
    // enough to catch a broken merge. DuckDB pins group counts and the
    // booleans at true.
    "q142_approx_percentile" -> { (s, dir) =>
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          expr("approx_percentile(value, 0.5, 1000)").as("ap50"),
          expr("approx_percentile(value, 0.99, 1000)").as("ap99"),
          expr("percentile(value, 0.45)").as("lo50"),
          expr("percentile(value, 0.55)").as("hi50"),
          expr("percentile(value, 0.98)").as("lo99"),
          expr("percentile(value, 1.0)").as("hi99"))
        .select(col("event_type"), col("n"),
          (col("ap50") >= col("lo50") && col("ap50") <= col("hi50")).as("p50_ok"),
          (col("ap99") >= col("lo99") && col("ap99") <= col("hi99")).as("p99_ok"))
        .orderBy("event_type")
    },

    // Rolling-window anomaly detection with an INTEGER-EXACT 3σ test:
    // per user (event-time ordered), each value checks against the
    // trailing 20 events' mean/variance — but the flag is evaluated as
    // the cross-multiplied integer inequality
    //   (20·v − Σx)²·19 > 9·(20·Σx² − (Σx)²)·20
    // over cent-scaled BIGINTs, so the boundary can never flip on
    // engine-specific fp summation order (stddev_samp differs between
    // engines in the last ulp; an exact comparison cannot). One window
    // shuffle on user_id; full-window rows only (n = 20).
    "q154_rolling_anomaly" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id")).rowsBetween(-20, -1)
      t(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
          round(col("value") * 100).cast("long").as("cents"))
        .withColumn("n", count(col("cents")).over(w))
        .withColumn("sx", sum(col("cents")).over(w))
        .withColumn("sxx", sum(col("cents") * col("cents")).over(w))
        .filter(col("n") === 20)
        .withColumn("dev", col("cents") * 20 - col("sx"))
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n_checked"),
          sum(when(col("dev") * col("dev") * 19 >
            (lit(20) * col("sxx") - col("sx") * col("sx")) * 180, 1L)
            .otherwise(0L)).as("n_anomalies"))
        .orderBy("event_type")
    },

    // Distributed triangle counting (Triangles) over a deterministic
    // circulant graph on the supplier keys (chords {1,2,3,5,8} mod n —
    // SF-stable density: 5n edges, 7n triangles). The engine runs the
    // degree-ordered wedge join (hub-safe: out-degree O(√m) by
    // construction); the oracle is the NAIVE 3-way edge self-join over
    // the identical arithmetic graph, so orientation bugs (double or
    // missed counts) are a hash fail. Census row: edges, open wedges,
    // triangles, global clustering coefficient.
    "q151_triangles" -> { (s, dir) =>
      val sup = t(s, dir, "supplier").select(col("s_suppkey").cast("long").as("k"))
      val maxK = Option(sup.agg(max(col("k"))).head.get(0))
        .fold(0L)(_.asInstanceOf[Number].longValue)
      require(maxK < (1L << 31),
        s"triangle orientation packs (deg, id) into one long; got key $maxK")
      val nF = sup.agg(count(lit(1)).as("__n"))
      val edges = sup.crossJoin(nF)
        .withColumn("d", explode(array(Seq(1L, 2L, 3L, 5L, 8L).map(lit): _*)))
        .select(col("k").as("u"), pmod(col("k") + col("d"), col("__n")).as("v"))
      graft.operators.Triangles.globalCount(edges, "u", "v")
    },

    // Count-min-sketch heavy hitters — the mergeable frequency sketch
    // that pairs with q66's HLL cardinality sketch: term frequencies
    // over every token occurrence via Spark's `count_min_sketch`
    // aggregate (partial sketches merge map-side; only w×d counter
    // arrays cross the shuffle, never per-key rows — the 100 TB path,
    // where the exact per-key aggregation this query ALSO runs is the
    // part you'd drop). The exact pass supplies the top-20 candidate
    // set and the differential ground truth; the sketch is probed on
    // the driver for those 20 terms (two bounded driver reads: one
    // ~100 KB sketch, 20 rows). At these dimensions (eps 0.001 → 2,000+
    // counter columns vs a ~40-term vocabulary, depth from conf 0.999)
    // no term collides in every row, so the CMS estimate — which is
    // always ≥ the true count — equals it exactly, and `overcount` pins
    // 0: the oracle recomputes everything relationally. Seeded hashing
    // keeps the sketch deterministic across JVMs.
    "q144_heavy_hitters" -> { (s, dir) =>
      import s.implicits._
      val toks = t(s, dir, "documents")
        .select(explode(graft.text.TextAnalysis.tokens(col("text"))).as("term"))
        .localCheckpoint() // one tokenize pass feeds both the sketch and the exact agg
      val skBytes = toks
        .agg(expr("count_min_sketch(term, 0.001d, 0.999d, 42)").as("sk"))
        .head.getAs[Array[Byte]](0)
      val sk = org.apache.spark.util.sketch.CountMinSketch
        .readFrom(new java.io.ByteArrayInputStream(skBytes))
      val top = toks.groupBy(col("term"))
        .agg(count(lit(1)).as("exact_n"))
        .orderBy(col("exact_n").desc, col("term"))
        .limit(20)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), sk.estimateCount(r.getString(0))))
        .toSeq
      top.toDF("term", "exact_n", "est_n")
        .withColumn("overcount", col("est_n") - col("exact_n"))
        .orderBy(col("exact_n").desc, col("term"))
    },

    // k-anonymity / l-diversity audit — the data-governance gate a
    // training-data release runs before shipping anything derived from
    // people: every quasi-identifier combination with fewer than k
    // members is a re-identification risk, and a group whose SENSITIVE
    // attribute is near-constant leaks it even at size ≥ k. One
    // hash-partitioned aggregation over the quasi columns; at 100 TB
    // the audit shuffles group rows, never people.
    "q187_k_anonymity" -> { (s, dir) =>
      val quasi = t(s, dir, "customer")
        .select(col("c_nationkey"),
          col("c_mktsegment"),
          floor(col("c_acctbal") / 1000.0).cast("long").as("acctbal_band"),
          col("c_custkey"))
      quasi.groupBy(col("c_nationkey"), col("c_mktsegment"))
        .agg(count(lit(1)).as("group_size"),
          countDistinct(col("acctbal_band")).as("l_diversity"))
        .withColumn("k_violation", col("group_size") < 5L)
        .withColumn("l_violation", col("l_diversity") < 2L)
        .orderBy("c_nationkey", "c_mktsegment")
    },

    // Functional-dependency discovery — schema archaeology for a table
    // nobody documented: for each candidate LHS→RHS pair, how many LHS
    // groups see more than one RHS value (0 ⟺ the dependency HOLDS).
    // Each candidate is one partial+final aggregation keyed on its LHS;
    // the union is a handful of skinny frames (candidates come from the
    // schema, not the data).
    "q188_fd_discovery" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      val candidates = Seq(
        ("doc_id", "source"), ("doc_id", "lang"),
        ("source", "lang"), ("lang", "source"))
      candidates.map { case (lhs, rhs) =>
        docs.groupBy(col(lhs))
          .agg(countDistinct(col(rhs)).as("n_rhs"))
          .agg(count(lit(1)).as("n_groups"),
            sum(when(col("n_rhs") > 1, 1L).otherwise(0L)).as("n_violating"))
          .select(lit(lhs).as("lhs"), lit(rhs).as("rhs"),
            col("n_groups"), col("n_violating"),
            (col("n_violating") === 0L).as("holds"))
      }.reduce(_.unionByName(_)).orderBy("lhs", "rhs")
    },

    // Sorted-neighborhood blocking (merge/purge): candidate pairs whose
    // exact global positions in (c_acctbal, c_custkey) order are within
    // a window of 4 — the ordering-based blocking scheme beside the
    // engine's LSH/pigeonhole/prefix blockers. Two-pass rank (never a
    // single-partition window) + block-keyed equi-join; the nation
    // agreement flag rides along as the match signal a merge/purge pass
    // would score.
    "q194_snm_blocking" -> { (s, dir) =>
      graft.operators.SortedNeighborhood.pairs(
        t(s, dir, "customer"), idCol = "c_custkey",
        sortCols = Seq("c_acctbal"), window = 4,
        carry = Seq("c_nationkey"))
        .select(col("id_a"), col("id_b"), col("dist"),
          (col("c_nationkey_a") === col("c_nationkey_b")).as("same_nation"))
        .orderBy("id_a", "id_b")
    },

    // k-core of the part co-purchase graph (edges = part pairs with ≥2
    // co-occurrence lineitem pairings — row pairs, not distinct orders:
    // a pair co-located twice within ONE order also qualifies, matching
    // the oracle's HAVING count(*) exactly): iterative peeling with a
    // loud convergence assertion, degree agg + double semi-join per
    // round — no adjacency lists, no driver graph. The oracle unrolls
    // the identical 10 rounds (generated from the same constant).
    "q195_kcore" -> { (s, dir) =>
      val li = t(s, dir, "lineitem").select("l_orderkey", "l_partkey")
      val edges = li.as("x")
        .join(li.withColumnRenamed("l_partkey", "r_partkey").as("y"), Seq("l_orderkey"))
        .where(col("l_partkey") < col("r_partkey"))
        .groupBy(col("l_partkey").as("a"), col("r_partkey").as("b"))
        .agg(count(lit(1)).as("w"))
        .where(col("w") >= 2)
        .select("a", "b")
      graft.operators.KCore.kcore(edges, k = 2, maxRounds = 10)
        .orderBy("vertex")
    },

    // Multi-source weighted shortest paths (distance-to-nearest-seed)
    // over the q141 supplier↔customer trade graph — the distance class
    // of graph analytics (ConnectedComponents: connectivity, PageRank:
    // propagation, KCore: density). Integer edge weights derived from
    // the pair BEFORE mirroring (symmetric), every 10th supplier as the
    // seed set; distributed Bellman-Ford relaxation (frontier ⋈ edges +
    // min-agg per round, fixpoint early-exit, loud convergence assert).
    // BIGINT-exact state, so the fixed-round unrolled oracle replays
    // hash-identical (the q141/q195 iteration-replay discipline).
    "q221_sssp" -> { (s, dir) =>
      val pairs = t(s, dir, "lineitem").select("l_orderkey", "l_suppkey")
        .join(t(s, dir, "orders").select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .select((col("l_suppkey") + 1000000L).as("supp"),
          col("o_custkey").as("cust"))
        .distinct()
        .withColumn("w", (col("supp") + col("cust")) % 7 + 1)
      val edges = pairs.select(col("supp").as("src"), col("cust").as("dst"), col("w"))
        .unionAll(pairs.select(col("cust").as("src"), col("supp").as("dst"), col("w")))
      val sources = pairs.select(col("supp").as("id"))
        .where(col("id") % 10 === 0).distinct()
      graft.operators.ShortestPaths.run(edges, sources, maxRounds = 10)
        .orderBy("id")
    },

    // TPC-DS Q1 shape — the optimizer stressor TPC-H lacks: a WITH-CTE
    // consumed TWICE (once as the fact rows, once aggregated into a
    // per-nation threshold), authored as pure SQL through spark.sql so
    // Catalyst's CTE planning (not a hand-shared DataFrame) decides
    // whether the expensive 3-way-join aggregate is computed once.
    // Returned-lineitem revenue stands in for store_returns; the 1.2×
    // threshold boundary clears fp noise by 8 orders of magnitude at
    // both SFs (min relative margin 6.3e-5 at sf0.01).
    "q200_tpcds_q1" -> { (s, dir) =>
      t(s, dir, "customer").createOrReplaceTempView("graft_customer_v")
      t(s, dir, "orders").createOrReplaceTempView("graft_orders_v")
      t(s, dir, "lineitem").createOrReplaceTempView("graft_lineitem_v")
      s.sql(
        """WITH ctr AS (
          |  SELECT c_custkey, c_nationkey,
          |    sum(l_extendedprice * (1.0 - l_discount)) AS ctr_total
          |  FROM graft_customer_v
          |  JOIN graft_orders_v ON c_custkey = o_custkey
          |  JOIN graft_lineitem_v ON o_orderkey = l_orderkey
          |  WHERE l_returnflag = 'R'
          |  GROUP BY 1, 2)
          |SELECT c.c_custkey, c.c_nationkey,
          |  round(c.ctr_total, 2) AS ctr_total
          |FROM ctr c
          |JOIN (SELECT c_nationkey, avg(ctr_total) AS avg_total
          |      FROM ctr GROUP BY 1) a
          |  ON c.c_nationkey = a.c_nationkey
          |WHERE c.ctr_total > 1.2 * a.avg_total
          |ORDER BY c.c_custkey""".stripMargin)
    },

    // RFM segmentation — the classic lifecycle scoring, composed from
    // the exact-rank machinery (QuantileBucket.fused: one two-pass rank
    // per signal, never a global window): recency (last order instant),
    // frequency (order count), monetary (DECIMAL-exact spend — a double
    // sum's engine-dependent addition order could flip near-tie ranks)
    // each map to exact quintiles; output = customer counts per (r,f,m)
    // cell. DuckDB replays the rank → ((rank-1)·5) div N buckets
    // move for move (the q106 discipline).
    "q207_rfm_segments" -> { (s, dir) =>
      val base = t(s, dir, "orders")
        .groupBy(col("o_custkey").as("cust"))
        .agg(
          unix_micros(max(col("o_orderdate")).cast("timestamp")).as("recency"),
          count(lit(1)).as("frequency"),
          sum(col("o_totalprice").cast("decimal(18,2)")).as("monetary"))
      graft.operators.QuantileBucket.fused(base, "cust",
        Seq(("recency", true), ("frequency", true), ("monetary", true)), k = 5)
        .groupBy(col("recency_bucket").as("r"), col("frequency_bucket").as("f"),
          col("monetary_bucket").as("m"))
        .agg(count(lit(1)).as("n_customers"))
        .orderBy("r", "f", "m")
    },

    // Population-stability-index drift monitor — the standard production
    // check that a new corpus slice still looks like the reference
    // (feature drift before it poisons training): fixed-width n_chars
    // buckets, Laplace-smoothed (+0.5) shares on BOTH sides (empty
    // one-sided buckets exist in the real data), PSI = Σ (p−q)·ln(p/q)
    // rounded 6dp, flagged at the classic 0.2 bar. One aggregation +
    // broadcast totals; DuckDB replays the identical arithmetic.
    "q209_psi_drift" -> { (s, dir) =>
      val d = t(s, dir, "documents").select(
        when(col("source") === "src0", lit("ref")).otherwise(lit("cur")).as("cohort"),
        expr("n_chars div 50").as("b"))
      val counts = d.groupBy("b").agg(
        sum(when(col("cohort") === "ref", 1L).otherwise(0L)).as("n_ref"),
        sum(when(col("cohort") === "cur", 1L).otherwise(0L)).as("n_cur"))
      val tot = counts.agg(
        sum("n_ref").as("rt"), sum("n_cur").as("ct"), count(lit(1)).as("nb"))
      val scored = counts.crossJoin(broadcast(tot))
        .withColumn("p", (col("n_ref") + lit(0.5)) / (col("rt") + lit(0.5) * col("nb")))
        .withColumn("q", (col("n_cur") + lit(0.5)) / (col("ct") + lit(0.5) * col("nb")))
        .withColumn("term", (col("p") - col("q")) * log(col("p") / col("q")))
      val psi = scored.agg(round(sum("term"), 6).as("psi"))
      scored.select(col("b"), col("n_ref"), col("n_cur"))
        .crossJoin(broadcast(psi))
        .withColumn("drifted", col("psi") > 0.2)
        .orderBy("b")
    },

    // Recursive hierarchy resolution — the WITH RECURSIVE surface Spark
    // lacks, via pointer doubling (Hierarchy): root + exact depth for
    // every node of the part category forest (parent = key div 8, keys
    // 0-7 self-rooted). O(log depth) keyed self-joins instead of a
    // per-level walk; the oracle IS DuckDB's native WITH RECURSIVE, so
    // the gate proves the doubling loop ≡ textbook recursion on the
    // full per-node frame.
    "q211_hierarchy" -> { (s, dir) =>
      val nodes = t(s, dir, "part").select(
        col("p_partkey").cast("long").as("node"),
        when(col("p_partkey") < 8, col("p_partkey"))
          .otherwise(expr("p_partkey div 8")).cast("long").as("parent"))
      graft.operators.Hierarchy.rootAndDepth(nodes, maxRounds = 8)
        .orderBy("node")
    }
  )

  val oracles: Map[String, String] = Map(
    // q66: the estimate is engine-defined (DataSketches HLL); the exact
    // count is DuckDB's, and the two contract booleans are pinned (the
    // merge identity is exact, not approximate — SketchSpec proves it).
    "q66_approx_distinct" ->
      """SELECT count(DISTINCT l_orderkey)::BIGINT AS n_exact,
        |  true AS approx_ok, true AS merge_ok
        |FROM lineitem""".stripMargin,

    "q50_tpch_q3" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < DATE '1998-06-01'
        |  AND l_shipdate > DATE '1998-06-01'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,

    "q51_tpch_q5" ->
      """SELECT n_name,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY 1 ORDER BY revenue DESC, n_name""".stripMargin,

    "q52_tpch_q10" ->
      """SELECT c_custkey, c_name, n_name,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin,

    // Deterministic LIMIT: the group key includes o_orderkey, so the
    // (o_totalprice DESC, o_orderkey) sort is a total order.
    "q71_tpch_q18" ->
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  round(sum(l_quantity), 2) AS sum_qty
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey IN (
        |  SELECT l_orderkey FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 300)
        |GROUP BY 1, 2, 3, 4, 5
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 100""".stripMargin,

    // Deterministic LIMIT: s_name is unique per supplier, so
    // (numwait DESC, s_name) is a total order.
    "q110_tpch_q21" ->
      """SELECT s_name, count(*) AS numwait
        |FROM lineitem l1
        |JOIN orders o ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
        |JOIN supplier s ON s.s_suppkey = l1.l_suppkey
        |JOIN nation n ON n.n_nationkey = s.s_nationkey AND n.n_name = 'NATION_3'
        |WHERE l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_returnflag = 'R')
        |GROUP BY 1
        |ORDER BY numwait DESC, s_name
        |LIMIT 100""".stripMargin,

    "q113_tpch_q22" ->
      """WITH ab AS (
        |  SELECT (sum(c_acctbal::DECIMAL(18,2)))::DOUBLE / count(*)::DOUBLE a
        |  FROM customer WHERE c_acctbal > 0)
        |SELECT c_nationkey, count(*) AS numcust,
        |  round(sum(c_acctbal::DECIMAL(18,2))::DOUBLE, 2) AS totacctbal
        |FROM customer, ab
        |WHERE c_acctbal > a
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |    WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q114_tpch_q17" ->
      """SELECT round(sum(l_extendedprice::DECIMAL(18,2))::DOUBLE / 7.0, 2)
        |  AS avg_yearly
        |FROM lineitem l
        |JOIN part p ON p.p_partkey = l.l_partkey
        |WHERE p.p_brand = 'Brand#1'
        |  AND l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
        |    FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)""".stripMargin,

    "q118_tpch_q13" ->
      """SELECT c_count, count(*) AS custdist
        |FROM (SELECT c_custkey, count(o_orderkey) AS c_count
        |      FROM customer LEFT OUTER JOIN orders
        |        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |      GROUP BY c_custkey)
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q119_tpch_q2" ->
      """WITH ps AS (
        |  SELECT l_partkey, l_suppkey, min(l_extendedprice) AS supplycost
        |  FROM lineitem GROUP BY 1, 2),
        |best AS (SELECT l_partkey, min(supplycost) AS minc FROM ps GROUP BY 1)
        |SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_brand,
        |  round(ps.supplycost, 2) AS supplycost
        |FROM ps
        |JOIN best ON best.l_partkey = ps.l_partkey AND ps.supplycost = best.minc
        |JOIN part p ON p.p_partkey = ps.l_partkey AND p.p_size = 5
        |JOIN supplier s ON s.s_suppkey = ps.l_suppkey
        |JOIN nation n ON n.n_nationkey = s.s_nationkey
        |JOIN region r ON r.r_regionkey = n.n_regionkey AND r.r_name = 'ASIA'
        |ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
        |LIMIT 100""".stripMargin,

    "q120_tpch_q20" ->
      """SELECT s.s_name, n.n_name
        |FROM supplier s
        |JOIN nation n ON n.n_nationkey = s.s_nationkey
        |WHERE s.s_suppkey IN (
        |  SELECT l_suppkey FROM lineitem
        |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
        |  GROUP BY l_partkey, l_suppkey
        |  HAVING sum(CASE WHEN l_shipdate < DATE '1997-01-01'
        |           THEN l_quantity ELSE 0.0 END) > 0.5 * sum(l_quantity))
        |ORDER BY s.s_name""".stripMargin,

    "q121_tpch_q7" ->
      """SELECT supp_nation, cust_nation, l_year,
        |  round(sum(volume)::DOUBLE, 2) AS revenue
        |FROM (
        |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |    EXTRACT(year FROM l.l_shipdate)::BIGINT AS l_year,
        |    (l.l_extendedprice * (1.0 - l.l_discount))::DECIMAL(18,4) AS volume
        |  FROM lineitem l
        |  JOIN orders o ON o.o_orderkey = l.l_orderkey
        |  JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |  JOIN customer c ON c.c_custkey = o.o_custkey
        |  JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
        |  JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
        |  WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,

    "q74_rolling" ->
      """SELECT o_custkey, o_orderkey,
        |  round(o_totalprice - lag(o_totalprice, 1) OVER
        |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 2) AS delta_prev,
        |  round((sum(o_totalprice::DECIMAL(18,2)) OVER
        |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW))::DOUBLE, 2) AS sum3
        |FROM orders
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q72_tpch_q14" ->
      """SELECT round(100.0 * (sum(CASE WHEN p_type LIKE 'PROMO%'
        |    THEN (l_extendedprice * (1.0 - l_discount))::DECIMAL(18,4)
        |    ELSE 0::DECIMAL(18,4) END))::DOUBLE
        |  / (sum((l_extendedprice * (1.0 - l_discount))::DECIMAL(18,4)))::DOUBLE,
        |  4)::DOUBLE AS promo_revenue_pct
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= DATE '1997-09-01' AND l_shipdate < DATE '1997-10-01'""".stripMargin,

    "q40_rollup" ->
      """SELECT EXTRACT(year FROM l_shipdate) AS ship_year,
        |  EXTRACT(month FROM l_shipdate) AS ship_month,
        |  count(*) AS n_items,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM lineitem
        |GROUP BY ROLLUP(ship_year, ship_month)
        |ORDER BY ship_year NULLS FIRST, ship_month NULLS FIRST""".stripMargin,

    "q56_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem
        |GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q41_pivot" ->
      """SELECT l_returnflag,
        |  round(sum(l_quantity) FILTER (l_linestatus = 'F'), 2) AS qty_f,
        |  round(sum(l_quantity) FILTER (l_linestatus = 'O'), 2) AS qty_o
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q42_percentiles" ->
      """SELECT event_type,
        |  round(quantile_cont(value, 0.25), 6) AS p25,
        |  round(quantile_cont(value, 0.5), 6) AS p50,
        |  round(quantile_cont(value, 0.75), 6) AS p75,
        |  round(quantile_cont(value, 0.99), 6) AS p99
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q49_corpus_report" ->
      """SELECT lang, count(*) AS n_docs,
        |  sum(len(regexp_split_to_array(text, '\s+')))::BIGINT AS total_tokens,
        |  round(avg(n_chars), 6) AS avg_chars,
        |  round(quantile_cont(n_chars, 0.5), 6) AS median_chars,
        |  min(n_chars) AS min_chars, max(n_chars) AS max_chars
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    "q43_top_terms" ->
      """WITH terms AS (
        |  SELECT doc_id,
        |    unnest(list_distinct(regexp_split_to_array(text, '\s+'))) term
        |  FROM documents),
        |df AS (
        |  SELECT term, count(*) doc_freq FROM terms GROUP BY 1),
        |n AS (SELECT count(*) c FROM documents)
        |SELECT term, doc_freq,
        |  round(ln((SELECT c FROM n)::DOUBLE / doc_freq), 6) AS idf
        |FROM df
        |ORDER BY doc_freq DESC, term
        |LIMIT 20""".stripMargin,

    "q124_tpch_q4" ->
      """SELECT o_orderpriority, count(*)::BIGINT AS order_count
        |FROM orders
        |WHERE o_orderdate >= DATE '1997-01-01' AND o_orderdate < DATE '1997-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate >
        |                  date_trunc('day', o_orderdate) + INTERVAL 30 DAY)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q125_tpch_q6" ->
      """SELECT round(sum((l_extendedprice * l_discount)::DECIMAL(18,4))::DOUBLE, 2)
        |    AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01'
        |  AND l_discount >= 0.03 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin,

    "q126_tpch_q8" ->
      """SELECT EXTRACT(year FROM o_orderdate)::BIGINT AS o_year,
        |  round(sum(CASE WHEN n_name = 'NATION_3'
        |      THEN (l_extendedprice * (1.0 - l_discount))::DECIMAL(18,4)
        |      ELSE 0::DECIMAL(18,4) END)::DOUBLE
        |    / sum((l_extendedprice * (1.0 - l_discount))::DECIMAL(18,4))::DOUBLE,
        |    6) AS mkt_share
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'ECONOMY')
        |  AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1998-01-01'
        |  AND o_custkey IN (
        |    SELECT c_custkey FROM customer WHERE c_nationkey IN (
        |      SELECT n_nationkey FROM nation JOIN region ON n_regionkey = r_regionkey
        |      WHERE r_name = 'EUROPE'))
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q127_tpch_q9" ->
      """SELECT n_name AS nation, EXTRACT(year FROM o_orderdate)::BIGINT AS o_year,
        |  round(sum((l_extendedprice * (1.0 - l_discount)
        |      - 0.01 * p_retailprice * l_quantity)::DECIMAL(18,4))::DOUBLE, 2)
        |    AS sum_profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%red%'
        |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin,

    "q128_tpch_q11" ->
      """WITH vals AS (
        |  SELECT l_partkey,
        |    sum((l_extendedprice * l_quantity)::DECIMAL(18,4)) AS part_value
        |  FROM lineitem
        |  WHERE l_suppkey IN (
        |    SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |    WHERE n_name = 'NATION_7')
        |  GROUP BY 1)
        |SELECT l_partkey, round(part_value::DOUBLE, 2) AS part_value
        |FROM vals
        |WHERE part_value > (SELECT sum(part_value) * 0.001 FROM vals)
        |ORDER BY 2 DESC, l_partkey""".stripMargin,

    "q129_tpch_q12" ->
      """SELECT l_linestatus,
        |  sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |      THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
        |  sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |      THEN 0 ELSE 1 END)::BIGINT AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= date_trunc('day', o_orderdate) + INTERVAL 60 DAY
        |  AND l_shipdate < date_trunc('day', o_orderdate) + INTERVAL 120 DAY
        |  AND l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q130_tpch_q15" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    sum((l_extendedprice * (1.0 - l_discount))::DECIMAL(18,4))
        |      AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1997-07-01'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, round(total_revenue::DOUBLE, 2) AS total_revenue
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,

    "q131_tpch_q16" ->
      """SELECT p_brand, p_type, p_size,
        |  count(DISTINCT l_suppkey)::BIGINT AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#5'
        |  AND p_size IN (1, 2, 9, 17, 25, 33, 41, 49)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    "q132_tpch_q19" ->
      """SELECT round(sum((l_extendedprice * (1.0 - l_discount))
        |    ::DECIMAL(18,4))::DOUBLE, 2) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 11
        |       AND p_size BETWEEN 1 AND 5)
        |   OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 10 AND 20
        |       AND p_size BETWEEN 1 AND 10)
        |   OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 30
        |       AND p_size BETWEEN 1 AND 15)""".stripMargin,

    // PageRank replay, 3 iterations unrolled. The teleport base is
    // written (1.0 - 0.85) — NOT the literal 0.15 — because the engine
    // computes it by subtraction and the two doubles differ in the last
    // ulp; per-edge contributions quantize to DECIMAL(28,15) before the
    // order-sensitive sum, and each new rank rounds to 12dp exactly as
    // the engine does.
    "q141_pagerank" -> {
      def iter(i: Int): String =
        s"""r$i AS (
           |  SELECT nodes.id,
           |    round(((1.0 - 0.85) / (SELECT n FROM nn))
           |        + 0.85 * coalesce(c.inflow, 0.0), 12) AS rank
           |  FROM nodes LEFT JOIN (
           |    SELECT e.dst,
           |      sum((r.rank / o.outdeg)::DECIMAL(28,15))::DOUBLE AS inflow
           |    FROM e
           |    JOIN r${i - 1} r ON r.id = e.src
           |    JOIN outdeg o ON o.src = e.src
           |    GROUP BY 1) c ON c.dst = nodes.id)"""
      s"""WITH pairs AS (
         |  SELECT DISTINCT l_suppkey + 1000000 AS supp, o_custkey AS cust
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         |e AS (SELECT supp AS src, cust AS dst FROM pairs
         |      UNION ALL SELECT cust, supp FROM pairs),
         |outdeg AS (SELECT src, count(*)::BIGINT AS outdeg FROM e GROUP BY 1),
         |nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
         |nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
         |r0 AS (SELECT id, (1.0 / (SELECT n FROM nn)) AS rank FROM nodes),
         |${iter(1)},
         |${iter(2)},
         |${iter(3)}
         |SELECT id, round(rank, 6) AS rank FROM (
         |  SELECT id, rank FROM r3 ORDER BY rank DESC, id LIMIT 20) top
         |ORDER BY rank DESC, id""".stripMargin
    },

    // q165: three unrolled LPA rounds over the q141 graph — neighbor
    // votes + the node's own label, argmax by (count desc, label asc).
    "q165_label_prop" -> {
      def round(i: Int): String =
        s"""l$i AS (
           |  SELECT id, label FROM (
           |    SELECT id, label, row_number() OVER (
           |        PARTITION BY id ORDER BY n DESC, label ASC) AS rn
           |    FROM (
           |      SELECT id, label, count(*)::BIGINT AS n FROM (
           |        SELECT e.dst AS id, l.label FROM e
           |        JOIN l${i - 1} l ON l.id = e.src
           |        UNION ALL SELECT id, label FROM l${i - 1}) v
           |      GROUP BY 1, 2) c) r
           |  WHERE rn = 1)"""
      s"""WITH pairs AS (
         |  SELECT DISTINCT l_suppkey + 1000000 AS supp, o_custkey AS cust
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         |e AS (SELECT supp AS src, cust AS dst FROM pairs
         |      UNION ALL SELECT cust, supp FROM pairs),
         |nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
         |l0 AS (SELECT id, id AS label FROM nodes),
         |${round(1)},
         |${round(2)},
         |${round(3)}
         |SELECT id, label FROM l3 ORDER BY id""".stripMargin
    },

    // q142: the estimates are engine-defined (GK-style sketch); DuckDB
    // pins the per-group counts and the envelope booleans (the q66
    // pattern).
    "q142_approx_percentile" ->
      """SELECT event_type, count(*)::BIGINT AS n,
        |  true AS p50_ok, true AS p99_ok
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    // q154: the identical integer inequality (9·20 = 180 folded) over
    // the identical cent-scaled window sums — exact on both engines.
    "q154_rolling_anomaly" ->
      """WITH e AS (
        |  SELECT user_id, ts::TIMESTAMP AS ts, event_id, event_type,
        |         round(value * 100)::BIGINT AS cents
        |  FROM events),
        |w AS (
        |  SELECT event_type, cents,
        |    count(cents) OVER win AS n,
        |    sum(cents) OVER win AS sx,
        |    sum(cents * cents) OVER win AS sxx
        |  FROM e WINDOW win AS (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING))
        |SELECT event_type, count(*)::BIGINT AS n_checked,
        |  sum(CASE WHEN (cents * 20 - sx) * (cents * 20 - sx) * 19
        |             > (20 * sxx - sx * sx) * 180
        |      THEN 1 ELSE 0 END)::BIGINT AS n_anomalies
        |FROM w WHERE n = 20 GROUP BY 1 ORDER BY 1""".stripMargin,

    // q151: the naive 3-way self-join over the identical circulant
    // graph; wedges/clustering from exact integer degree arithmetic.
    "q151_triangles" ->
      """WITH n AS (SELECT count(*)::BIGINT c FROM supplier),
        |raw AS (
        |  SELECT s_suppkey AS k, unnest([1, 2, 3, 5, 8]) AS d FROM supplier),
        |e AS (
        |  SELECT DISTINCT least(k, (k + d) % (SELECT c FROM n)) u,
        |                  greatest(k, (k + d) % (SELECT c FROM n)) v
        |  FROM raw WHERE k <> (k + d) % (SELECT c FROM n)),
        |deg AS (SELECT node, count(*)::BIGINT dg FROM (
        |  SELECT u AS node FROM e UNION ALL SELECT v FROM e) GROUP BY 1),
        |tri AS (
        |  SELECT count(*)::BIGINT t FROM e e1
        |  JOIN e e2 ON e2.u = e1.v
        |  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v)
        |SELECT (SELECT count(*) FROM e)::BIGINT AS n_edges,
        |  (SELECT sum(dg * (dg - 1) // 2) FROM deg)::BIGINT AS n_wedges,
        |  (SELECT t FROM tri) AS n_triangles,
        |  round(3.0 * (SELECT t FROM tri)
        |    / (SELECT sum(dg * (dg - 1) // 2) FROM deg), 6) AS clustering""".stripMargin,

    // q144: the CMS estimate is ≥-exact by construction and collision-
    // free at these dimensions (2,000+ counter columns vs a ~40-term
    // vocabulary), so est_n replays as the exact count and overcount
    // pins 0 — the whole row is relational.
    "q144_heavy_hitters" ->
      """WITH toks AS (
        |  SELECT unnest(regexp_split_to_array(text, '\s+')) term
        |  FROM documents),
        |exact AS (
        |  SELECT term, count(*)::BIGINT AS exact_n FROM toks GROUP BY 1
        |  ORDER BY exact_n DESC, term LIMIT 20)
        |SELECT term, exact_n, exact_n AS est_n, 0::BIGINT AS overcount
        |FROM exact ORDER BY exact_n DESC, term""".stripMargin,

    "q187_k_anonymity" ->
      """SELECT c_nationkey, c_mktsegment,
        |  count(*)::BIGINT AS group_size,
        |  count(DISTINCT (floor(c_acctbal / 1000.0))::BIGINT)::BIGINT
        |    AS l_diversity,
        |  count(*) < 5 AS k_violation,
        |  count(DISTINCT (floor(c_acctbal / 1000.0))::BIGINT) < 2
        |    AS l_violation
        |FROM customer
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,

    "q188_fd_discovery" ->
      """SELECT lhs, rhs, n_groups, n_violating, n_violating = 0 AS holds
        |FROM (
        |  SELECT 'doc_id' AS lhs, 'source' AS rhs,
        |    count(*)::BIGINT AS n_groups,
        |    (count(*) FILTER (WHERE n_rhs > 1))::BIGINT AS n_violating
        |  FROM (SELECT doc_id, count(DISTINCT source) n_rhs
        |        FROM documents GROUP BY 1)
        |  UNION ALL
        |  SELECT 'doc_id', 'lang', count(*)::BIGINT,
        |    (count(*) FILTER (WHERE n_rhs > 1))::BIGINT
        |  FROM (SELECT doc_id, count(DISTINCT lang) n_rhs
        |        FROM documents GROUP BY 1)
        |  UNION ALL
        |  SELECT 'source', 'lang', count(*)::BIGINT,
        |    (count(*) FILTER (WHERE n_rhs > 1))::BIGINT
        |  FROM (SELECT source, count(DISTINCT lang) n_rhs
        |        FROM documents GROUP BY 1)
        |  UNION ALL
        |  SELECT 'lang', 'source', count(*)::BIGINT,
        |    (count(*) FILTER (WHERE n_rhs > 1))::BIGINT
        |  FROM (SELECT lang, count(DISTINCT source) n_rhs
        |        FROM documents GROUP BY 1))
        |ORDER BY lhs, rhs""".stripMargin,

    "q194_snm_blocking" ->
      """WITH ranked AS (
        |  SELECT c_custkey, c_nationkey,
        |    row_number() OVER (ORDER BY c_acctbal, c_custkey) AS rn
        |  FROM customer)
        |SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
        |  b.rn - a.rn AS dist,
        |  a.c_nationkey = b.c_nationkey AS same_nation
        |FROM ranked a JOIN ranked b
        |  ON b.rn > a.rn AND b.rn - a.rn <= 3
        |ORDER BY id_a, id_b""".stripMargin,

    "q195_kcore" -> graft.operators.KCore.oracleSql(
      """SELECT x.l_partkey AS a, y.l_partkey AS b
        |FROM lineitem x JOIN lineitem y
        |  ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
        |GROUP BY 1, 2 HAVING count(*) >= 2""".stripMargin,
      k = 2, maxRounds = 10),

    "q221_sssp" -> graft.operators.ShortestPaths.oracleSql(
      """SELECT supp AS src, cust AS dst, w FROM (
        |  SELECT supp, cust, (supp + cust) % 7 + 1 AS w FROM (
        |    SELECT DISTINCT l_suppkey + 1000000 AS supp, o_custkey AS cust
        |    FROM lineitem JOIN orders ON l_orderkey = o_orderkey))
        |UNION ALL
        |SELECT cust, supp, w FROM (
        |  SELECT supp, cust, (supp + cust) % 7 + 1 AS w FROM (
        |    SELECT DISTINCT l_suppkey + 1000000 AS supp, o_custkey AS cust
        |    FROM lineitem JOIN orders ON l_orderkey = o_orderkey))""".stripMargin,
      """SELECT DISTINCT l_suppkey + 1000000 AS id
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_suppkey % 10 = 0""".stripMargin,
      maxRounds = 10),

    "q200_tpcds_q1" ->
      """WITH ctr AS (
        |  SELECT c_custkey, c_nationkey,
        |    sum(l_extendedprice * (1.0 - l_discount)) AS ctr_total
        |  FROM customer
        |  JOIN orders ON c_custkey = o_custkey
        |  JOIN lineitem ON o_orderkey = l_orderkey
        |  WHERE l_returnflag = 'R'
        |  GROUP BY 1, 2)
        |SELECT c.c_custkey, c.c_nationkey,
        |  round(c.ctr_total, 2) AS ctr_total
        |FROM ctr c
        |JOIN (SELECT c_nationkey, avg(ctr_total) AS avg_total
        |      FROM ctr GROUP BY 1) a
        |  ON c.c_nationkey = a.c_nationkey
        |WHERE c.ctr_total > 1.2 * a.avg_total
        |ORDER BY c.c_custkey""".stripMargin,

    "q207_rfm_segments" ->
      """WITH base AS (
        |  SELECT o_custkey AS cust,
        |    epoch_us(max(o_orderdate)) AS recency,
        |    count(*) AS frequency,
        |    sum(o_totalprice::DECIMAL(18,2)) AS monetary
        |  FROM orders GROUP BY 1),
        |n AS (SELECT count(*) cnt FROM base),
        |r AS (
        |  SELECT cust,
        |    row_number() OVER (ORDER BY recency, cust) rr,
        |    row_number() OVER (ORDER BY frequency, cust) rf,
        |    row_number() OVER (ORDER BY monetary, cust) rm
        |  FROM base)
        |SELECT
        |  (((rr - 1) * 5) // cnt)::BIGINT AS r,
        |  (((rf - 1) * 5) // cnt)::BIGINT AS f,
        |  (((rm - 1) * 5) // cnt)::BIGINT AS m,
        |  count(*)::BIGINT AS n_customers
        |FROM r, n GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "q209_psi_drift" ->
      """WITH d AS (
        |  SELECT CASE WHEN source = 'src0' THEN 'ref' ELSE 'cur' END cohort,
        |    n_chars // 50 AS b
        |  FROM documents),
        |counts AS (
        |  SELECT b,
        |    count(*) FILTER (WHERE cohort = 'ref') AS n_ref,
        |    count(*) FILTER (WHERE cohort = 'cur') AS n_cur
        |  FROM d GROUP BY b),
        |tot AS (SELECT sum(n_ref) rt, sum(n_cur) ct, count(*) nb FROM counts),
        |scored AS (
        |  SELECT b, n_ref, n_cur,
        |    (n_ref + 0.5) / (rt + 0.5 * nb) AS p,
        |    (n_cur + 0.5) / (ct + 0.5 * nb) AS q
        |  FROM counts, tot),
        |psi AS (SELECT round(sum((p - q) * ln(p / q)), 6) AS psi FROM scored)
        |SELECT b, n_ref::BIGINT AS n_ref, n_cur::BIGINT AS n_cur,
        |  psi, psi > 0.2 AS drifted
        |FROM scored, psi ORDER BY b""".stripMargin,

    "q211_hierarchy" ->
      """WITH RECURSIVE nodes AS (
        |  SELECT p_partkey::BIGINT AS node,
        |    (CASE WHEN p_partkey < 8 THEN p_partkey
        |          ELSE p_partkey // 8 END)::BIGINT AS parent
        |  FROM part),
        |walk AS (
        |  SELECT node, node AS root, 0::BIGINT AS depth
        |  FROM nodes WHERE node = parent
        |  UNION ALL
        |  SELECT n.node, w.root, w.depth + 1
        |  FROM nodes n JOIN walk w ON n.parent = w.node
        |  WHERE n.node <> n.parent)
        |SELECT node, root, depth FROM walk ORDER BY node""".stripMargin
  )
}
