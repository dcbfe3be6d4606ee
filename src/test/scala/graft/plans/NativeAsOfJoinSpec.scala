package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.AsOfJoin

/** The native whole-operator as-of join must be EXACTLY the composed
  * union-and-sweep operator, observed from outside: same rows, same
  * nulls, same tie semantics — on randomized inputs, adversarial null
  * plantings, and the real test tables — while its physical plan is the
  * custom exec (no union, no window) with each side shuffled at its own
  * width.
  */
class NativeAsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  /** Run `body` with auto-broadcast off, so the SHUFFLED merge exec is
    * the strategy under test (the broadcast test below covers the other
    * path and pins strategy agreement).
    */
  private def onMergePath[A](body: => A): A = {
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }

  test("native ≡ composed on randomized dense inputs (same seed, 3 draws)") {
    onMergePath { for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val left = (1 to 400).map(i =>
        (rnd.nextInt(12).toLong, rnd.nextInt(1000).toLong, i.toLong))
        .toDF("k", "t", "lid")
      val right = (1 to 300).map(i =>
        (rnd.nextInt(12).toLong, rnd.nextInt(1000).toLong, i * 10.0))
        .toDF("k", "t", "snap")
      val composed = AsOfJoin.backward(left, right, Seq("k"), "t", "t", Seq("snap"))
      val native = NativeAsOfJoin.backward(left, right, Seq("k"), "t", "t", Seq("snap"))
      assert(canon(native) == canon(composed), s"seed $seed diverged")
    } }
  }

  test("null keys/times: native follows SQL join semantics (matches nothing)") { onMergePath {
    val left = Seq[(java.lang.Long, java.lang.Long, Long)](
      (1L, 10L, 1L), (null, 10L, 2L), (1L, null, 3L), (2L, 5L, 4L))
      .toDF("k", "t", "lid")
    val right = Seq[(java.lang.Long, java.lang.Long, Double)](
      (1L, 10L, 1.0), (null, 1L, 2.0), (1L, null, 3.0), (2L, 6L, 4.0))
      .toDF("k", "t", "snap")
    val native = NativeAsOfJoin.backward(left, right, Seq("k"), "t", "t", Seq("snap"))
    val byId = native.collect().map(r => r.getLong(2) -> Option(r.get(4))).toMap
    assert(byId(1L).contains(1.0), "exact tie must be visible (<= semantics)")
    assert(byId(2L).isEmpty && byId(3L).isEmpty,
      "null key/time must not match (DuckDB ASOF parity)")
    assert(byId(4L).isEmpty, "right time after left time must not match")
    // The composed sweep DIFFERS here by design: its window groups SQL
    // nulls, so the null-key left row fills from the null-key snapshot.
    val composed = AsOfJoin.backward(left, right, Seq("k"), "t", "t", Seq("snap"))
    val cById = composed.collect().map(r => r.getLong(2) -> Option(r.get(4))).toMap
    assert(cById(2L).contains(2.0),
      "composed null grouping changed — update the NativeAsOfJoin doc contract")
    // On the non-null rows the two agree exactly.
    assert(cById(1L) == byId(1L) && cById(4L) == byId(4L))
  } }

  test("exact (key, time) right duplicates resolve to the SAME row as composed") { onMergePath {
    val left = Seq((1L, 10L, 1L), (1L, 20L, 2L)).toDF("k", "t", "lid")
    // three snapshots at the identical (key, time) — the pick must be
    // the max-xxhash one on both paths, not sort-order luck.
    val right = Seq((1L, 10L, 111.0), (1L, 10L, 222.0), (1L, 10L, 333.0))
      .toDF("k", "t", "snap")
    val native = NativeAsOfJoin.backward(left, right, Seq("k"), "t", "t", Seq("snap"))
    val composed = AsOfJoin.backward(left, right, Seq("k"), "t", "t", Seq("snap"))
    assert(canon(native) == canon(composed))
    // and stable across repartitionings of the right side
    val reparted = NativeAsOfJoin.backward(left, right.repartition(7),
      Seq("k"), "t", "t", Seq("snap"))
    assert(canon(reparted) == canon(native))
  } }

  test("self-join on the events table: native ≡ composed, and the plan is the custom exec") {
    val events = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val snaps = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .filter(col("event_id") % 10 === 0)
      .select(col("user_id"), col("ts"), col("value").as("snap_value"))
    // composed emits key columns first; project both to one order
    val cols = Seq("event_id", "user_id", "ts", "value", "asof_ts", "snap_value")
    val native = NativeAsOfJoin.backward(events, snaps,
      Seq("user_id"), "ts", "ts", Seq("snap_value"))
    val composed = AsOfJoin.backward(events, snaps,
      Seq("user_id"), "ts", "ts", Seq("snap_value"))
    assert(canon(native.select(cols.map(col): _*)) ==
      canon(composed.select(cols.map(col): _*)))

    val plan = native.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
    assert(!plan.contains("Window"), "native plan must not fall back to the sweep window")
    assert(!plan.contains("Union"), "native plan must not union the sides")
  }

  test("constant memory contract: one partition streams a dense right side") { onMergePath {
    // 1 key, 50k right rows, 100 left rows — a per-key buffering
    // implementation would hold 50k rows; the two-pointer merge holds 1.
    val left = (1 to 100).map(i => (1L, i.toLong * 500, i.toLong)).toDF("k", "t", "lid")
    val right = (1 to 50000).map(i => (1L, i.toLong, i.toDouble)).toDF("k", "t", "snap")
    val out = NativeAsOfJoin.backward(left, right, Seq("k"), "t", "t", Seq("snap"))
      .collect()
    assert(out.length == 100)
    out.foreach { r =>
      val t = r.getLong(1)
      assert(r.getDouble(4) == math.min(t, 50000L).toDouble,
        s"latest snapshot at t=$t wrong: ${r.getDouble(4)}")
    }
  } }

  test("broadcast strategy: small right side broadcasts, probe side is never shuffled, results identical to the merge path") {
    val rnd = new scala.util.Random(7)
    val left = (1 to 500).map(i =>
      (rnd.nextInt(10).toLong, rnd.nextInt(800).toLong, i.toLong)).toDF("k", "t", "lid")
    // duplicates at identical (k, t) included — the tie rule must match too
    val right = ((1 to 120).map(i =>
      (rnd.nextInt(10).toLong, rnd.nextInt(800).toLong, i * 1.0)) ++
      Seq((3L, 100L, 901.0), (3L, 100L, 902.0))).toDF("k", "t", "snap")

    val bcast = NativeAsOfJoin.backward(left, right, Seq("k"), "t", "t", Seq("snap"))
    val bPlan = bcast.queryExecution.executedPlan.toString
    assert(bPlan.contains("BroadcastAsOfJoin"), bPlan)
    assert(bPlan.contains("BroadcastExchange"), bPlan)
    assert(!bPlan.contains("hashpartitioning"),
      s"probe side must not shuffle under the broadcast strategy:\n$bPlan")

    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val merged = NativeAsOfJoin.backward(left, right, Seq("k"), "t", "t", Seq("snap"))
      val mPlan = merged.queryExecution.executedPlan.toString
      assert(mPlan.contains("AsOfJoin") && !mPlan.contains("BroadcastAsOfJoin"),
        s"threshold -1 must force the shuffled merge path:\n$mPlan")
      assert(canon(bcast) == canon(merged),
        "broadcast and merge strategies must agree row-for-row")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }

  test("filters on probe-side columns push through the custom node to the scan") {
    val events = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val snaps = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .filter(col("event_id") % 10 === 0)
      .select(col("user_id"), col("ts"), col("value").as("snap_value"))
    val joined = NativeAsOfJoin.backward(events, snaps,
      Seq("user_id"), "ts", "ts", Seq("snap_value"))
    // mixed predicate: one left-only conjunct (pushable), one touching
    // the as-of output (must stay above)
    val filtered = joined.filter(col("event_id") < 100 && col("snap_value").isNotNull)

    val optimized = filtered.queryExecution.optimizedPlan.toString
    // the left-only conjunct sits BELOW the as-of node after the rule
    val asOfIdx = optimized.indexOf("AsOfJoinPlan")
    assert(asOfIdx >= 0, optimized)
    assert(optimized.indexOf("event_id", asOfIdx) >= 0 &&
      optimized.substring(asOfIdx).contains("Filter"),
      s"pushable conjunct did not move below the node:\n$optimized")
    assert(optimized.substring(0, asOfIdx).contains("snap_value"),
      s"as-of-column conjunct must stay above the node:\n$optimized")
    // and it reaches the parquet scan as a pushed data filter
    val physical = filtered.queryExecution.executedPlan.toString
    assert(physical.contains("PushedFilters: [") &&
      physical.contains("LessThan(event_id,100)"),
      s"predicate did not reach the scan:\n$physical")

    // semantics unchanged: equals filtering the probe side by hand
    val manual = NativeAsOfJoin.backward(events.filter(col("event_id") < 100),
      snaps, Seq("user_id"), "ts", "ts", Seq("snap_value"))
      .filter(col("snap_value").isNotNull)
    assert(canon(filtered) == canon(manual))
  }

  test("scale evidence: broadcast as-of moves <5% of the composed sweep's shuffle bytes") {
    // The wall-clock of q18 vs q186 at bench scale is overhead-bound and
    // proves nothing; the cost model that matters at 100 TB is WHAT
    // CROSSES THE SHUFFLE. Composed union-and-sweep shuffles probe ∪
    // snapshot rows widened to a common schema; broadcast-native
    // shuffles nothing on the probe side at all.
    import graft.MetricsProbe
    val left = (1L to 200000L).map(i => (i % 64, i % 5000, i)).toDF("k", "t", "lid")
      .repartition(8).localCheckpoint()
    val right = (1L to 2000L).map(i => (i % 64, i, i * 2.0)).toDF("k", "t", "snap")
      .localCheckpoint()
    // consume the carried column — a bare count() lets Catalyst prune
    // the composed sweep's window away entirely
    def work(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(count(col("snap"))).head.getLong(0)
    val composed = MetricsProbe.measure(spark) {
      work(AsOfJoin.backward(left, right, Seq("k"), "t", "t", Seq("snap")))
    }
    val native = MetricsProbe.measure(spark) {
      work(NativeAsOfJoin.backward(left, right, Seq("k"), "t", "t", Seq("snap")))
    }
    assert(native.result == composed.result)
    assert(composed.shuffleWriteBytes > 1000000L,
      s"fixture too small to measure: composed wrote ${composed.shuffleWriteBytes}")
    assert(native.shuffleWriteBytes < composed.shuffleWriteBytes / 20,
      s"broadcast as-of wrote ${native.shuffleWriteBytes} vs composed ${composed.shuffleWriteBytes}")
  }

  test("column collisions and missing columns fail loudly") {
    val l = Seq((1L, 1L, 1L)).toDF("k", "t", "snap")
    val r = Seq((1L, 1L, 1.0)).toDF("k", "t", "snap")
    assertThrows[IllegalArgumentException](
      NativeAsOfJoin.backward(l, r, Seq("k"), "t", "t", Seq("snap")))
    assertThrows[IllegalArgumentException](
      NativeAsOfJoin.backward(l, r, Seq("k"), "t", "t", Seq("nope")))
  }
}
