package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Physical-plan quality gates — the ".explain and iterate" loop, frozen
  * as assertions so a regression (lost pushdown, surprise shuffle, a
  * broadcast that stopped broadcasting) fails CI instead of shipping.
  * Runs against the read-only sf0.001 tables.
  */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def formatted(df: DataFrame): String = {
    df.queryExecution.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  test("filters push down to the parquet scan and columns prune") {
    val q = sources.Tables.load(spark, dir, "lineitem")
      .filter(col("l_orderkey") < 100)
      .select("l_orderkey", "l_quantity")
    val f = formatted(q)
    assert(f.contains("PushedFilters: [IsNotNull(l_orderkey), LessThan(l_orderkey,100)]"), f)
    // Scan reads exactly the two projected columns.
    assert(f.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"), f)
  }

  test("small dim joins broadcast (no shuffle of the fact side)") {
    val p = plan(operators.ParityQueries.queries("q15_join_enrich")(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("TPC-H Q5 plan: dims broadcast, fact joins shuffle") {
    val p = plan(gold.AnalyticsQueries.queries("q51_tpch_q5")(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p) // nation/region sides
    assert(p.contains("Exchange hashpartitioning"), p) // fact-side join shuffles exist
  }

  test("TPC-H dim joins stay broadcast in the AQE-final plans (q50/q51/q52/q71)") {
    // The dimension sides (nation/region/customer, and q71's aggregated
    // qualifying-order set) must never degrade to SortMergeJoin under AQE
    // re-planning — at 100 TB the fact sides shuffle, but a sort-merge
    // against a kilobyte dim table is a lost broadcast.
    for (name <- Seq("q50_tpch_q3", "q51_tpch_q5", "q52_tpch_q10", "q71_tpch_q18")) {
      val df = gold.AnalyticsQueries.queries(name)(spark, dir)
      df.collect() // AQE finalizes the physical plan only on execution
      val p = plan(df)
      assert(p.contains("BroadcastHashJoin"), s"$name lost all broadcasts:\n$p")
      for (key <- Seq("n_nationkey", "r_regionkey", "c_custkey")) {
        val smjOnDim = p.linesIterator.exists(l => l.contains("SortMergeJoin") && l.contains(key))
        assert(!smjOnDim, s"$name sort-merges a dim join on $key:\n$p")
      }
    }
    // q71's HAVING-subquery semi-join must convert to broadcast at runtime
    // (AQE measures the tiny qualifying set; no hard-coded hint).
    val q71 = gold.AnalyticsQueries.queries("q71_tpch_q18")(spark, dir)
    q71.collect()
    val p71 = plan(q71)
    val semiBroadcast = p71.linesIterator.exists(l =>
      l.contains("BroadcastHashJoin") && l.contains("LeftSemi"))
    assert(semiBroadcast, s"q71 semi-join did not broadcast:\n$p71")
  }

  test("TPC-H Q21 plan: correlated EXISTS/NOT EXISTS are keyed semi/anti joins, no cartesian") {
    // The two correlated subqueries (same order, different supplier) must
    // plan as hash-partitioned LeftSemi/LeftAnti joins keyed on
    // l_orderkey with the <> predicate as a residual — a
    // BroadcastNestedLoopJoin or CartesianProduct here is the per-row
    // re-scan that dies at 100 TB. The nation dim join must broadcast.
    val df = gold.AnalyticsQueries.queries("q110_tpch_q21")(spark, dir)
    df.collect()
    val p = plan(df)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("LeftSemi"), s"q110 lost the EXISTS semi-join:\n$p")
    assert(p.contains("LeftAnti"), s"q110 lost the NOT EXISTS anti-join:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"q110 lost all broadcasts:\n$p")
    val smjOnDim = p.linesIterator.exists(l =>
      l.contains("SortMergeJoin") && l.contains("n_nationkey"))
    assert(!smjOnDim, s"q110 sort-merges the nation dim join:\n$p")
  }

  test("Q22/Q17 plans: scalar threshold broadcasts, correlated agg decorrelates, no cartesian") {
    // q113: the one-row scalar-average side may ride a broadcast nested
    // loop (keyless, one row — correct), but the NOT EXISTS must stay a
    // keyed LeftAnti and nothing may plan a CartesianProduct.
    val q113 = gold.AnalyticsQueries.queries("q113_tpch_q22")(spark, dir)
    q113.collect()
    val p113 = plan(q113)
    assert(!p113.contains("CartesianProduct"), p113)
    assert(p113.contains("LeftAnti"), s"q113 lost the NOT EXISTS anti-join:\n$p113")
    // q114: the correlated per-part average must decorrelate into an
    // aggregate + equi-join — no nested-loop re-scan of lineitem.
    val q114 = gold.AnalyticsQueries.queries("q114_tpch_q17")(spark, dir)
    q114.collect()
    val p114 = plan(q114)
    assert(!p114.contains("CartesianProduct") &&
      !p114.contains("BroadcastNestedLoopJoin"), p114)
    assert(p114.contains("LeftSemi"), s"q114 lost the brand semi-filter:\n$p114")
  }

  test("Q13/Q2/Q20/Q7 plans: outer join keeps zero-order rows, decorrelation, broadcast dims") {
    // q118: the left outer join must stay keyed (no cartesian) and both
    // aggregations partial+final.
    val q118 = gold.AnalyticsQueries.queries("q118_tpch_q13")(spark, dir)
    q118.collect()
    val p118 = plan(q118)
    assert(!p118.contains("CartesianProduct") && !p118.contains("BroadcastNestedLoopJoin"), p118)
    assert(p118.contains("LeftOuter") || p118.contains("RightOuter"),
      s"q118 lost the outer join (zero-order customers would vanish):\n$p118")
    // q119: the correlated per-part min decorrelates into aggregate +
    // equi-join; supplier→nation→region dims broadcast; no cartesian.
    val q119 = gold.AnalyticsQueries.queries("q119_tpch_q2")(spark, dir)
    q119.collect()
    val p119 = plan(q119)
    assert(!p119.contains("CartesianProduct") && !p119.contains("BroadcastNestedLoopJoin"), p119)
    assert(p119.contains("BroadcastHashJoin"), s"q119 lost its dim broadcasts:\n$p119")
    // q120: the nested correlated IN is ONE pair aggregate + two semi
    // joins — never a per-pair re-scan.
    val q120 = gold.AnalyticsQueries.queries("q120_tpch_q20")(spark, dir)
    q120.collect()
    val p120 = plan(q120)
    assert(!p120.contains("CartesianProduct") && !p120.contains("BroadcastNestedLoopJoin"), p120)
    assert(p120.contains("LeftSemi"), s"q120 lost its semi joins:\n$p120")
    // q121: both nation legs broadcast; the disjunctive pair predicate
    // must not force a nested loop.
    val q121 = gold.AnalyticsQueries.queries("q121_tpch_q7")(spark, dir)
    q121.collect()
    val p121 = plan(q121)
    assert(!p121.contains("CartesianProduct") && !p121.contains("BroadcastNestedLoopJoin"), p121)
    assert(p121.contains("BroadcastHashJoin"), s"q121 lost the nation broadcasts:\n$p121")
  }

  test("ingest cycle: corpus anti-joins broadcast, vectors never ride bucket joins") {
    val d = sources.Tables.load(spark, dir, "documents")
    val idx = dedup.MinHashDedup.buildIndex(d, "doc_id", "text")
    val batch = d.select((col("doc_id") + 9000000L).as("doc_id"), col("text"))
    val p = plan(dedup.IncrementalIngest.survivors(idx, batch, "doc_id", "text"))
    // The exact corpus check anti-joins against the SKINNY distinct
    // text-hash set — at this scale Catalyst must pick broadcast for it
    // from size estimates alone (no hint; at 100 TB the hash set outgrows
    // broadcast and the same join degrades to shuffle, which is correct).
    // The later probe-hit anti-join is deliberately NOT gated: its kill
    // list can be any size (a heavy-dup crawl kills most of the batch),
    // so its sort-merge fallback is the scale-general shape.
    val hashAnti = p.linesIterator
      .filter(l => l.contains("LeftAnti") && l.contains("text_hash")).toSeq
    assert(hashAnti.nonEmpty, s"expected the text-hash anti-join in the plan:\n$p")
    assert(hashAnti.forall(_.contains("BroadcastHashJoin")),
      s"the skinny text-hash anti-join must broadcast at this scale:\n$p")
  }

  test("codec queries spread decode work across cores (round-robin exchange)") {
    // The id-only documents scan is ONE partition at small SF; without the
    // explicit repartition every per-doc encode/decode serializes on a
    // single thread (measured 3x on q79 before the gate existed).
    for (name <- Seq("q77_multimodal_decode", "q78_multimodal_audio")) {
      val p = plan(multimodal.MultimodalQueries.queries(name)(spark, dir))
      assert(p.contains("Exchange RoundRobinPartitioning"), s"$name lost its repartition:\n$p")
    }
    // q79 reads its pre-materialized corpus instead of synthesizing
    // in-query (the q85 timer-scope discipline), so its parallelism is
    // baked in at corpus WRITE time: the repartition happens in
    // materializeVideoDecodeCorpus and must survive as multiple parquet
    // files whose splits spread the decode without any in-query exchange.
    val corpus = multimodal.MultimodalQueries.materializeVideoDecodeCorpus(spark, dir)
    val nFiles = new java.io.File(corpus).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(nFiles >= spark.sparkContext.defaultParallelism,
      s"video-decode corpus must carry write-time parallelism: $nFiles files")
    val p79 = plan(multimodal.MultimodalQueries.queries("q79_multimodal_video")(spark, dir))
    assert(p79.contains("FileScan parquet"), s"q79 must read the corpus:\n$p79")
  }

  test("brute-force kNN is a broadcast nested-loop, not a shuffled cross") {
    val p = plan(similarity.BruteForceKnn.topK(
      sources.Tables.load(spark, dir, "embeddings"),
      sources.Tables.load(spark, dir, "embeddings"), "vec_id", "embedding", 1))
    assert(p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("aggregations are partial+final (map-side combine before the shuffle)") {
    val p = plan(SparkEntry.queries("q1_agg")(spark, dir))
    assert("HashAggregate".r.findAllIn(p).length >= 2, p)
    assert(p.contains("Exchange hashpartitioning"), p)
  }

  test("the transform pipeline stays whole-stage codegen end to end") {
    val q = operators.TransformPipeline.plan(sources.Tables.load(spark, dir, "events"))
    q.collect() // AQE finalizes (and codegen markers appear) only on execution
    val p = plan(q)
    // '*(n)' prefixes = operators fused into a WholeStageCodegen stage.
    assert("""\*\(\d+\) (Project|HashAggregate)""".r.findFirstIn(p).isDefined, p)
  }

  test("native expressions stay inside whole-stage codegen") {
    val q = sources.Tables.load(spark, dir, "embeddings")
      .select(similarity.VectorOps.dot(
        similarity.VectorOps.toDouble(col("embedding")),
        similarity.VectorOps.toDouble(col("embedding"))).as("d"))
    val p = plan(q)
    // The graft_dot projection must carry the '*(n)' codegen marker.
    assert("""\*\(\d+\) Project \[graft_dot""".r.findFirstIn(p).isDefined, p)
  }

  test("BPE tokenization stays inside whole-stage codegen") {
    val q = sources.Tables.load(spark, dir, "documents")
      .select(size(text.TextAnalysis.bpeTokens(
        col("text"), text.TextQueries.bpeMerges)).as("n"))
    val p = plan(q)
    assert("""\*\(\d+\) Project """.r.findFirstIn(p).isDefined, p)
    assert(p.contains("graft_bpe_tokens"), p)
  }

  test("fused lang-scores kernel stays inside whole-stage codegen") {
    val q = sources.Tables.load(spark, dir, "documents")
      .select(text.TextAnalysis.langId(col("text")).as("lang"))
    val p = plan(q)
    assert("""\*\(\d+\) Project """.r.findFirstIn(p).isDefined, p)
    assert(p.contains("graft_lang_scores"), p)
  }

  test("HTML text extraction stays inside whole-stage codegen") {
    val q = sources.Tables.load(spark, dir, "documents")
      .select(org.apache.spark.sql.functions.call_function("graft_html_text",
        concat(lit("<p>"), col("text"), lit("</p>")),
        lit(20), lit(33)).as("t"))
    val p = plan(q)
    assert("""\*\(\d+\) Project \[graft_html_text""".r.findFirstIn(p).isDefined, p)
  }

  test("native shingle hashing stays inside whole-stage codegen") {
    val q = sources.Tables.load(spark, dir, "documents")
      .select(dedup.Shingles.shingleSet(col("text")).as("sh"))
    val p = plan(q)
    // The old HOF formulation (transform/concat_ws/array_distinct) was
    // CodegenFallback; the native expression must keep the '*(n)' marker.
    assert("""\*\(\d+\) Project \[graft_shingle_set""".r.findFirstIn(p).isDefined, p)
  }

  test("contamination scan broadcasts the benchmark shingle dictionary") {
    val d = sources.Tables.load(spark, dir, "documents")
    val p = plan(dedup.Contamination.flagged(
      d.filter(col("doc_id") % 5 =!= 0), d.filter(col("doc_id") % 5 === 0),
      "doc_id", "text"))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("contamination shuffled fallback is reachable when broadcast is disabled") {
    val d = sources.Tables.load(spark, dir, "documents")
    def run(bc: Boolean) = dedup.Contamination.flagged(
      d.filter(col("doc_id") % 5 =!= 0), d.filter(col("doc_id") % 5 === 0),
      "doc_id", "text", broadcastDictionary = bc)
    // The hard hint must be absent from the logical plan when disabled
    // (the physical join may still broadcast on small test data via the
    // auto threshold — the contract is that the CALLER's hint is gone and
    // Catalyst is free to shuffle an oversized dictionary).
    assert(!run(false).queryExecution.analyzed.toString.contains("ResolvedHint"))
    assert(run(true).queryExecution.analyzed.toString.contains("ResolvedHint"))
    // Same answer on both paths.
    val a = run(true).orderBy("id").collect().toSeq
    val b = run(false).orderBy("id").collect().toSeq
    assert(a == b)
  }

  test("exact n-gram pairs scan the corpus once (posting lists, no self-join)") {
    val p = plan(dedup.NgramJaccard.similarPairs(
      sources.Tables.load(spark, dir, "documents"), "doc_id", "text", 0.5))
    // a self-join formulation would show the documents scan twice
    assert("FileScan parquet".r.findAllIn(p).size == 1, p)
  }

  test("kNN ranking is a partial+final top-k aggregate, not a window sort") {
    val q = similarity.BruteForceKnn.topK(
      sources.Tables.load(spark, dir, "embeddings"),
      sources.Tables.load(spark, dir, "embeddings"), "vec_id", "embedding", 3)
    val p = plan(q)
    assert(p.contains("partial_graft_topk"), p) // map-side k-trim before the exchange
    assert(!p.contains("Window"), p)
  }

  test("bucketed tables join without a shuffle (co-located join)") {
    val wh = tmpDir("bucket-wh") // explicit table paths; warehouse conf is static
    val orders = sources.Tables.load(spark, dir, "orders")
    val customer = sources.Tables.load(spark, dir, "customer")
    orders.write.mode("overwrite")
      .bucketBy(4, "o_custkey").sortBy("o_custkey")
      .option("path", s"$wh/orders_b").saveAsTable("orders_b")
    customer.write.mode("overwrite")
      .bucketBy(4, "c_custkey").sortBy("c_custkey")
      .option("path", s"$wh/customer_b").saveAsTable("customer_b")
    try {
      withoutBroadcast {
        val joined = spark.table("orders_b")
          .join(spark.table("customer_b"), col("o_custkey") === col("c_custkey"))
        val p = plan(joined)
        assert(p.contains("SortMergeJoin"), p)
        assert(!p.contains("Exchange hashpartitioning"),
          s"bucketed join must not reshuffle:\n$p")
        assert(joined.count() > 0) // and it actually runs
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }

  private def withoutBroadcast[A](body: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("exact dedup is one shuffle, partitioned on the real key columns") {
    val q = dedup.ExactDedup.keepFirst(
      sources.Tables.load(spark, dir, "orders"), Seq("o_custkey"), Seq(col("o_orderkey")))
    val p = plan(q)
    // Collision-free partitioning: the exchange keys on o_custkey itself,
    // not a 64-bit hash alias (ADVICE r1: hash-keyed windows merge distinct
    // keys on collision and save no shuffle payload).
    assert(p.contains("Exchange hashpartitioning(o_custkey"), p)
    assert(!p.contains("xxhash64"), p)
    assert("Exchange".r.findAllIn(p).size == 1, p)
  }

  test("rolling window query shuffles once (both functions share the partitioning)") {
    val p = plan(gold.AnalyticsQueries.queries("q74_rolling")(spark, dir))
    // lag and the framed sum share PARTITION BY o_custkey — one hash
    // exchange total (the final orderBy is a range exchange, not hash).
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
  }

  test("LSH bucket joins carry no vector columns (skinny candidate dedup)") {
    // The multi-table probe join fans a pair out up to nTables×(nPlanes+1)
    // ways; the 64-dim vectors must join back AFTER pair dedup, never ride
    // through that fan-out (the ~60× shuffle-byte regression this froze).
    import org.apache.spark.sql.catalyst.plans.logical.Join
    import org.apache.spark.sql.types.ArrayType
    for (df <- Seq(
      similarity.HyperplaneLsh.approxNearest(
        sources.Tables.load(spark, dir, "embeddings"), "vec_id", "embedding"),
      similarity.HyperplaneLsh.nearDuplicatePairs(
        sources.Tables.load(spark, dir, "embeddings"), "vec_id", "embedding", 0.4))) {
      val joins = df.queryExecution.optimizedPlan.collect { case j: Join => j }
      val bucketJoins = joins.filter(_.references.exists(_.name == "bucket"))
      assert(bucketJoins.nonEmpty, "expected a bucket equi-join in the plan")
      bucketJoins.foreach { j =>
        val arrays = j.output.filter(_.dataType.isInstanceOf[ArrayType]).map(_.name)
        assert(arrays.isEmpty, s"vector columns cross the bucket join: $arrays")
      }
    }
  }

  test("LM scoring joins the model without sort-merging (broadcast under AQE)") {
    // The model (bigram counts + prefixes) is broadcast-sized at this SF;
    // AQE must pick BroadcastHashJoin for both scoring joins — a
    // sort-merge against a dictionary-sized model is a lost broadcast
    // (at 100 TB the model side can genuinely outgrow broadcast and the
    // shuffle is then correct, but never at dictionary scale).
    val df = text.TextQueries.queries("q88_lm_score")(spark, dir)
    df.collect()
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin"), s"q88 lost the model broadcasts:\n$p")
    assert(!p.contains("SortMergeJoin"), s"q88 sort-merges a model join:\n$p")
  }

  test("mixture sampling is one topk aggregation + a broadcast quota trim") {
    import spark.implicits._
    val targets = (0 to 6).map(l => (s"g$l", 0.1)).toDF("grp", "weight")
    val base = (1L to 2000L).map(i => (i, s"g${i % 7}")).toDF("id", "grp")
    val df = operators.Sampling.mixture(base, "grp", "id", targets, total = 100L)
    df.collect()
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin"), s"quota join did not broadcast:\n$p")
    // exactly one aggregation pair (partial + final) — the per-stratum
    // trim must not re-aggregate
    val aggs = p.linesIterator.count(_.trim.startsWith("HashAggregate"))
    assert(aggs <= 4, s"unexpected extra aggregations ($aggs):\n$p")
  }

  test("SCD2 historization runs on a single user_id exchange") {
    val p = plan(gold.BehaviorQueries.queries("q160_scd2_history")(spark, dir))
    // lag-window, running-sum window, the interval aggregation, and the
    // lead-window ALL reuse hashpartitioning(user_id): one hash exchange
    // total (the final orderBy is a range exchange). The aggregation is
    // exchange-free because clustering on (user_id, version, event_type)
    // is satisfied by the user_id partitioning already in place.
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    assert(p.contains("Exchange hashpartitioning(user_id"), p)
  }

  test("gap-fill windows piggyback on the join ordering (no window exchange)") {
    val p = plan(gold.BehaviorQueries.queries("q159_gap_fill")(spark, dir))
    // Two hash exchanges exist — the daily (user_id, day) aggregate and
    // the per-user span aggregate; the LOCF/lerp window stack (three
    // Window nodes sharing one (user_id, day) sort) must not add a third.
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 2, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("funnel and cohort chains stay cartesian-free with broadcast step frames") {
    for (q <- Seq("q157_funnel", "q158_cohort_retention")) {
      val p = plan(gold.BehaviorQueries.queries(q)(spark, dir))
      assert(!p.contains("CartesianProduct"), s"$q:\n$p")
      assert(p.contains("BroadcastHashJoin"), s"$q lost its broadcast joins:\n$p")
    }
  }

  test("the expectation suite is one fused scan (partial+merge, no re-scan)") {
    val p = plan(gold.BehaviorQueries.queries("q161_expectations")(spark, dir))
    // one parquet scan feeds a partial+merge aggregate chain; the
    // distinct-pair constraint adds its aggregate pair but never a
    // second FileScan of lineitem
    assert(p.linesIterator.count(_.contains("FileScan parquet")) == 1, p)
    assert(p.contains("merge_count"), p)
  }

  test("sorted-neighborhood pairs: block equi-join, no OR-join cartesian, no global window") {
    val p = plan(operators.SortedNeighborhood.pairs(
      sources.Tables.load(spark, dir, "customer"),
      "c_custkey", Seq("c_acctbal"), window = 4))
    // the windowed self-join must plan as a hash/sort-merge equi-join on
    // the block key — an OR-join here degenerates to a nested loop
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // the two-pass rank's window partitions by pid, never SinglePartition
    assert(!p.contains("SinglePartition"), p)
  }

  test("k-core rounds are degree aggregates + semi-joins (no adjacency collects)") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("a", "b")
    val p = plan(operators.KCore.kcore(edges, k = 2, maxRounds = 2))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("collect_list"), p)
  }

  test("TPC-DS Q1-shape double-consumed CTE plans keyed joins, no cartesian") {
    val p = plan(gold.AnalyticsQueries.queries("q200_tpcds_q1")(spark, dir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // the WITH-CTE consumed twice must not multiply the fact scan beyond
    // its two consumers (Catalyst either inlines both or reuses one)
    assert(p.linesIterator.count(l =>
      l.contains("FileScan parquet") && l.contains("lineitem")) <= 2, p)
  }

  test("CEP pattern match keys one exchange on user_id (state op, no resort join)") {
    import spark.implicits._
    val ds = sources.Tables.load(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_type"))
      .as[streaming.StatefulOps.TypedEvent]
    val p = plan(streaming.StatefulOps.matchPattern(
      ds, Seq("view", "click", "purchase"), withinMs = 1000L).toDF())
    // batch execution lowers flatMapGroupsWithState to MapGroupsExec
    assert(p.contains("MapGroups"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
  }
}
