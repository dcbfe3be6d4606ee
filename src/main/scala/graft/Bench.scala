package graft

import java.util.Locale

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, max, xxhash64}

/** Benchmark main: every SparkEntry query against SPARK_GRAFT_SF_DIR
  * (default sf0.1), one JSON line on stdout for the driver. Failed
  * queries are listed in a "failed" array — a crash must not read as a
  * fast green run.
  *
  * Each query reports a COLD time (first run: analysis + codegen compile
  * + execution — comparable to all previous rounds' numbers, headline
  * "value"/"queries") and a WARM time (MEDIAN of SPARK_GRAFT_WARM_RUNS
  * re-runs, default 3: execution with compile caches hot —
  * "value_warm"/"queries_warm").
  *
  * Protocol (r8, after two rounds of adjudicating host noise): the warm
  * median-of-3 is the DECISION channel — on a host with a documented
  * ~15% wall-clock swing, a single sample cannot separate a real
  * regression from load, and a best-of-n systematically under-reports.
  * The median is robust to one slow outlier in either direction. Cold
  * stays a single sample by construction (first-execution codegen/JIT
  * work is unrepeatable within one JVM), so it is INFORMATIONAL: treat
  * cold swings as noise unless the warm median moves too. The JSON
  * records the protocol ("warm_runs"/"warm_stat") so a record can be
  * audited against the protocol that produced it.
  */
object Bench {

  /** JSON string escape (same contract as Verify's). */
  private def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Locale-invariant decimal formatting (a de_DE default locale would
    * print 0,123 and corrupt the JSON).
    */
  private def num(v: Double): String = String.format(Locale.ROOT, "%.3f", Double.box(v))

  /** 2-decimal variant for the compact stdout line (length budget). */
  private def num2(v: Double): String = String.format(Locale.ROOT, "%.2f", Double.box(v))

  /** Stable fingerprint of the benched query set: SHA-256 (16 hex chars)
    * over the sorted query names. Embedded in `bench_detail.json` and
    * `BENCH_RECORD.md` at record time; `BenchRecordSpec` recomputes it
    * from `SparkEntry.queries` and FAILS when the committed record no
    * longer describes the current battery — the r10–r12 staleness class
    * where queries were added without re-recording and the headline
    * numbers silently described a smaller set.
    */
  def querySetHash(names: Iterable[String]): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.update(names.toSeq.sorted.mkString("\n").getBytes("UTF-8"))
    md.digest().take(8).map(b => f"$b%02x").mkString
  }

  /** Ingest-cycle multiplicity of the deliberately N-cycle composite
    * queries (every query not listed runs its pipeline once). Emitted
    * into `bench_detail.json` and `BENCH_RECORD.md` so cross-round TOTAL
    * drift is attributable mechanically: a composite that drains N real
    * micro-batches costs ~N× the single-cycle class by construction —
    * exclude it from per-query cross-round comparisons or normalize by
    * its cycle count.
    */
  val cycles: Map[String, Int] = Map(
    "q227_stream_crawl_ingest" -> 8, // 8 micro-batch ingest cycles
    "q231_rolling_ingest" -> 4,      // 4 batch cycles, rolling index
    "q232_stream_rolling_ingest" -> 4, // 4 checkpoint-resumed drains
    "q241_url_seen_ingest" -> 4,     // 4 batch cycles, URL seen-set
    "q242_crawl_loop_rolling" -> 10, // 10 checkpoint-resumed full-loop drains
    "q245_recrawl_refresh" -> 5,     // 5 batch cycles, change-aware seen-set
    // the r17/r18 control-plane composites are the same deliberate
    // N-sequential-drain class (each iteration rolls the full state
    // through the complete pipeline); their counts mirror the loop
    // bounds in WarcQueries.scala
    "q255_robots_rolling" -> 9,      // 9 day-drains of the robots roll
    "q264_refetch_errors" -> 4,      // 4 clock-tick schedule folds
    "q267_control_refresh" -> 5,     // 5 frontier/refresh ticks
    "q268_fetch_attempts" -> 4,      // 4 attempt-log tick folds
    "q269_sitemap_lastmod" -> 4)     // 4 sequential schedule folds

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark: SparkSession = core.EngineSession
      .builder(master = s"local[$cpus]", shufflePartitions = cpus, appName = "graft-bench")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // The per-unpersist localCheckpoint WARN otherwise floods the
    // driver-kept tail of the bench output (r7 verdict, item 7).
    core.EngineSession.quietLocalCheckpointWarnings()

    // One warm-up action so JVM/codegen startup isn't billed to the first
    // query in the report.
    spark.read.parquet(s"$sfDir/region.parquet").count()

    // ---- host-load probe (r17 verdict #1: make the channel
    // noise-proof, don't hope for calm weather) ----
    // A FIXED CPU-bound measurement (pure codegen hash scan over a
    // 4B range, all cores, ~1 s — compute-dominated, so task
    // scheduling overhead is a small fraction) brackets the battery:
    // its runtime moves with CPU steal / co-tenant load and with
    // little else. ANCHOR = the RUNNING MINIMUM of all readings — the
    // calmest capability the host has demonstrated this run. A
    // re-probe every ~20 queries (median of 3, outside every timed
    // window) that lands above tolerance × anchor ABORTS the record:
    // non-zero exit, no file writes — a degraded window can never be
    // committed. Downward drift never aborts and instead LOWERS the
    // anchor: the first record attempt showed the opening reading
    // carries residual JVM/scheduler warm-up (3× on this host) that
    // only the first real queries burn off, and a host cannot be
    // "too fast" because of load — but once a faster reading reveals
    // the true baseline, any later rise past tolerance × that
    // baseline is load, including the case where the OPENING itself
    // was the degraded window. SPARK_GRAFT_PROBE=off disables (dev
    // only); SPARK_GRAFT_PROBE_TOLERANCE tunes the ratio (default
    // 1.25 = the verdict's 25%).
    val probeEnabled = !sys.env.get("SPARK_GRAFT_PROBE").contains("off")
    val probeTolerance =
      sys.env.getOrElse("SPARK_GRAFT_PROBE_TOLERANCE", "1.25").toDouble
    val probeEvery = 20
    def probeOnce(): Double = {
      val t0 = System.nanoTime()
      // max, not sum: full-range hash values overflow a long SUM under
      // ANSI mode; the work (4B hashes across all cores, ~1 s) is
      // identical. The LONG sample is deliberate: the quantity the
      // probe bounds is the average slowdown of minutes-long record
      // windows, so a sub-second co-scheduling burst must dilute
      // proportionally inside a sample instead of inflating a short
      // sample whole (0.17 s samples spread ±30% on this host and
      // false-aborted two otherwise-calm records at queries 160/260).
      spark.range(0L, 4000000000L, 1L, cpus)
        .select(max(xxhash64(col("id")))).collect(): Unit
      (System.nanoTime() - t0) / 1e9
    }
    // MIN-of-n, not median: a probe point taken right after a heavy
    // query inherits the battery's own in-JVM noise (a GC pause on a
    // 32g heap can hit 2 of 3 samples), and the min is the classic
    // capability estimator: transient in-process stalls inflate
    // individual samples, while SUSTAINED external load (CPU steal, a
    // co-tenant — the thing the probe exists to catch) inflates every
    // sample including the min.
    def probeMin(n: Int): Double = Seq.fill(n)(probeOnce()).min
    val probeOpen: Double =
      if (probeEnabled) { probeOnce(); probeOnce(); probeMin(3) }
      else 0.0
    // (query-index, probe-min) readings, opening included
    val probeLog = scala.collection.mutable.ArrayBuffer[(Int, Double)](
      0 -> probeOpen)
    var probeAnchor = probeOpen
    def probeCheck(afterQueries: Int, haveRecord: Boolean): Unit =
      if (probeEnabled) {
        val first = probeMin(3)
        // one settle-and-retry before declaring the window degraded: a
        // single hot point can be a 10-second co-tenant burst or the
        // tail of the previous query's concurrent GC — neither poisons
        // a 35-minute record the way a SUSTAINED window does (attempt
        // 3 died at query 160 on a spike the host had shed moments
        // later). Only a reading still hot after the pause aborts.
        val m =
          if (first / math.min(probeAnchor, first) > probeTolerance) {
            Thread.sleep(10000)
            math.min(first, probeMin(3))
          } else first
        probeLog += afterQueries -> m
        probeAnchor = math.min(probeAnchor, m)
        val drift = m / probeAnchor
        if (drift > probeTolerance && haveRecord) {
          // the record is void: say why on ONE parseable line, write
          // nothing, exit non-zero — the driver must see a failed
          // channel, never a degraded number
          println(s"""{"metric":"total","value":-1.0,"unit":"sec","aborted":"probe-drift","probe_anchor":${num(probeAnchor)},"probe_now":${num(m)},"drift":${num(drift)},"tolerance":${num(probeTolerance)},"after_queries":$afterQueries,"sf":${q(sfDir)}}""")
          spark.stop()
          sys.exit(2)
        } else if (drift > probeTolerance)
          System.err.println(f"[bench] probe drift $drift%.2fx after " +
            s"$afterQueries queries (dev subset — not aborting)")
      }

    // Dev-only subset filter (comma-separated names); the driver sets no
    // filter and always benches the full battery.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(',').map(_.trim).toSet)

    // Fixture pre-materialization, OUTSIDE every timed window: the
    // synthetic media corpora are test data, not the operators — with
    // generation inside the timed body a record measures corpus
    // synthesis (q85: 13.3s cold in r8 vs ~1.5s in isolation, r8
    // verdict #1; q79: 12.0s warm in the r10 battery vs ~2s in
    // isolation). Caught per corpus: a fixture-build crash must not
    // abort the bench JVM before any query runs (losing every query's
    // numbers and the JSON line). The failure is not cached, so the
    // query's lazy in-body build re-attempts and a real breakage
    // reports as that query alone in "failed" (ADVICE r9).
    val fixtures: Seq[(String, () => String)] = Seq(
      "q85_video_neardup" ->
        (() => multimodal.MultimodalQueries.materializeGifCorpus(spark, sfDir)),
      "q79_multimodal_video" ->
        (() => multimodal.MultimodalQueries.materializeVideoDecodeCorpus(spark, sfDir)))
    fixtures.foreach { case (qname, build) =>
      if (only.forall(_.contains(qname)))
        try { build(): Unit }
        catch {
          case e: Exception =>
            System.err.println(s"[bench] $qname corpus pre-materialization failed: ${e.getMessage}")
        }
    }
    val warmRuns = sys.env.getOrElse("SPARK_GRAFT_WARM_RUNS", "3").toInt
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }

    // Release persisted/localCheckpoint blocks a query run left behind —
    // cross-query storage pollution otherwise squeezes execution memory
    // for later queries (measured: 8x slowdown on the shuffle-heavy ones
    // once the block manager fills). Blocking, and outside the timed
    // window: an async unpersist races into the NEXT run's timing and
    // showed up as multi-second phantom spikes there.
    def cleanup(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      // Terminated streaming queries leave their state-store providers
      // LOADED in the JVM-wide registry (unload is lazy, on the 60 s
      // maintenance cadence): tens of queries × 32 partitions × several
      // stores of versioned in-memory maps accumulate across the
      // battery — heap drag for later queries, and the maintenance
      // thread keeps snapshotting them against scratch checkpoint dirs
      // that ScratchDirs.release already deleted. Unload them with the
      // blocks, outside every timed window; the next streaming query
      // reloads its own providers from its own checkpoint as usual.
      // (Reflective: StateStore.unloadAll() is private[sql] at the
      // Scala level but public bytecode — harness-only usage.)
      try {
        val cls = Class.forName(
          "org.apache.spark.sql.execution.streaming.state.StateStore$")
        val module = cls.getField("MODULE$").get(null)
        cls.getMethod("unloadAll").invoke(module): Unit
      } catch {
        case e: Exception =>
          System.err.println(s"[bench] state-store unload failed: ${e.getMessage}")
      }
      System.gc()
    }

    val results = selected.zipWithIndex.map { case ((name, fn), qi) =>
      if (qi > 0 && qi % probeEvery == 0)
        probeCheck(qi, haveRecord = only.isEmpty)
      def once(): Option[Double] = {
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).count(); true }
          catch {
            case e: Exception =>
              System.err.println(s"[bench] $name failed: ${e.getMessage}")
              false
          }
        val elapsed = (System.nanoTime() - t0) / 1e9
        cleanup()
        if (ok) Some(elapsed) else None
      }
      val cold = once()
      if (cold.isEmpty) failed += name
      // Warm: MEDIAN of n re-runs (lower-middle for even n — still a real
      // sample, still outlier-robust), skipped for a failed query. A query
      // that succeeded cold but crashed ANY warm re-run is a failure —
      // otherwise the median computes over fewer samples than the protocol
      // claims and the crash reads as noise.
      val warmSamples = if (cold.isEmpty) Seq.empty else Seq.fill(warmRuns)(once()).flatten
      val warm = if (warmSamples.size == warmRuns && warmRuns > 0)
        Some(warmSamples.sorted.apply((warmRuns - 1) / 2))
      else None
      if (cold.nonEmpty && warmRuns > 0 && warm.isEmpty) failed += name
      // -1 marks a failed run (NaN is not valid JSON)
      (name, cold.getOrElse(-1.0), warm.getOrElse(-1.0))
    }
    // closing probe: the record is only committed when the window
    // ENDED as calm as it opened
    probeCheck(selected.size, haveRecord = only.isEmpty)
    def row(fmt: Double => String, sel: ((String, Double, Double)) => Double): String =
      results.map { case t @ (k, _, _) => q(k) + ":" + fmt(sel(t)) }.mkString("{", ",", "}")
    val totalCold = results.map(_._2).filter(_ >= 0).sum
    val totalWarm = results.map(_._3).filter(_ >= 0).sum
    val failedJson = failed.map(q).mkString("[", ",", "]")

    // Full-precision cold+warm detail goes to a FILE, not stdout: the
    // driver keeps only the last ~2000 chars of process output, and the
    // two 63-entry maps pushed the single stdout line past that window,
    // truncating its head — every BENCH_r*.json through r4 recorded
    // "parsed": null for this reason. The stdout line below is the
    // parseable record; this file is the human/debug record.
    val protocol = s""""cold_runs":1,"warm_runs":$warmRuns,"warm_stat":"median""""
    val setHash = querySetHash(SparkEntry.queries.keys)
    val cyclesJson = cycles.toSeq.sortBy(_._1)
      .map { case (k, n) => q(k) + ":" + n }.mkString("{", ",", "}")
    // cycle-unit normalization (the adjudication protocol, recomputed
    // IN the record so the criterion is auditable per record): each
    // N-cycle composite counts N units, every other query 1; the r2
    // self-anchored baseline is 0.91 s/unit COLD at sf0.1, and the
    // acceptance bar is ratio <= 2.0.
    val cycleUnits = selected.map { case (n, _) => cycles.getOrElse(n, 1) }.sum
    val secPerUnit = if (cycleUnits > 0) totalCold / cycleUnits else 0.0
    val unitRatio = secPerUnit / 0.91
    // max drift of the steady-state readings vs the anchor (the
    // opening reading is excluded from the drift figure — it carries
    // the JVM warm-up residue by construction — but stays in the
    // readings list for full auditability)
    val probeAnchorFinal =
      if (probeLog.nonEmpty) probeLog.map(_._2).min else 0.0
    val probeDriftMax = {
      val steady = probeLog.drop(1)
      if (steady.nonEmpty && probeAnchorFinal > 0)
        steady.map(_._2 / probeAnchorFinal).max
      else 1.0
    }
    val probeJson = s""""probe":{"open":${num(probeOpen)},"anchor":${num(probeAnchorFinal)},"max_drift":${num(probeDriftMax)},"tolerance":${num(probeTolerance)},"readings":${probeLog.map(p => s"[${p._1},${num(p._2)}]").mkString("[", ",", "]")}}"""
    val detail =
      s"""{"metric":"total","value":${num(totalCold)},"unit":"sec","value_warm":${num(totalWarm)},$protocol,"query_set_hash":${q(setHash)},"query_count":${SparkEntry.queries.size},"cycles":$cyclesJson,"cycle_units":$cycleUnits,"sec_per_unit_cold":${num(secPerUnit)},"unit_ratio_vs_r2":${num(unitRatio)},$probeJson,"queries":${row(num, _._2)},"queries_warm":${row(num, _._3)},"failed":$failedJson,"sf":${q(sfDir)}}"""
    // A dev subset run (SPARK_GRAFT_ONLY) must NOT clobber the committed
    // full-battery record — that is exactly the stale-number class the
    // r7 verdict flagged.
    if (only.isEmpty) {
      try java.nio.file.Files.write(java.nio.file.Paths.get("bench_detail.json"),
        (detail + "\n").getBytes("UTF-8"))
      catch { case e: Exception => System.err.println(s"[bench] detail write failed: ${e.getMessage}") }
      // The single committed source of truth for the headline numbers:
      // README.md and BASELINE.md REFERENCE this file instead of
      // hand-copying totals, so a re-record can never leave the prose
      // quoting a stale record (the r5–r9 drift class; r9 verdict #1).
      val nOk = results.count(t => t._2 >= 0 && t._3 >= 0)
      val slowest = results.filter(_._3 >= 0).sortBy(-_._3).take(5)
        .map { case (k, _, w) => s"$k ${num2(w)}s" }.mkString(", ")
      val cyclesLine = cycles.toSeq.sortBy(_._1)
        .map { case (k, n) => s"$k ×$n" }.mkString(", ")
      val record =
        s"""# Bench record (auto-generated by `graft.Bench` — do not edit)
           |
           |**$nOk queries, ${num2(totalCold)}s cold / ${num2(totalWarm)}s warm-median** at `$sfDir`, ${failed.size} failed.
           |
           |Protocol: cold_runs=1 (informational single first-run sample),
           |warm_runs=$warmRuns, warm_stat=median (the decision channel; robust to one
           |slow outlier on a host with a documented ~15% wall-clock swing).
           |Slowest warm medians: $slowest.
           |Full per-query cold+warm detail: `bench_detail.json`.
           |
           |Cycle-unit criterion (auditable per record): $cycleUnits units →
           |${num2(secPerUnit)} s/unit cold = **${num2(unitRatio)}×** the r2 anchor
           |(0.91 s/unit cold at sf0.1; acceptance bar ≤ 2.0×).
           |
           |Host-load probe: anchor ${num(probeAnchorFinal)} s (running min
           |of min-of-3 fixed CPU references; opening ${num(probeOpen)} s
           |carries JVM warm-up), max steady-state drift ${num2(probeDriftMax)}× across
           |${probeLog.size} readings, tolerance ${num2(probeTolerance)}× —
           |a reading above tolerance × anchor ABORTS the record (exit 2,
           |nothing written), so a committed record is a calm-window record
           |by construction.
           |
           |N-cycle composites (all other queries run their pipeline once):
           |$cyclesLine — each deliberately drains N full ingest cycles, so
           |exclude them from per-query cross-round totals or divide by N.
           |
           |Query set: ${SparkEntry.queries.size} queries, hash `$setHash` —
           |BenchRecordSpec fails the build when `SparkEntry.queries` diverges
           |from this record; re-run `graft.Bench` (full battery) to re-record.
           |""".stripMargin
      try java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_RECORD.md"),
        record.getBytes("UTF-8"))
      catch { case e: Exception => System.err.println(s"[bench] record write failed: ${e.getMessage}") }
    }

    // ONE compact JSON line, engineered to fit the tail window with the
    // sbt "[success] …" epilogue behind it: 2-decimal per-query colds,
    // warm as a scalar only. If the battery ever grows past the budget,
    // keep the slowest queries and say how many were dropped rather
    // than emitting an unparseable over-long line.
    def compactLine(keep: Int): String = {
      val kept = results.sortBy(t => -math.max(t._2, t._3)).take(keep).sortBy(_._1)
      val qmap = kept.map { case (k, c, _) => q(k) + ":" + num2(c) }.mkString("{", ",", "}")
      val omitted = if (kept.size < results.size) s""","queries_omitted":${results.size - kept.size}""" else ""
      s"""{"metric":"total","value":${num2(totalCold)},"unit":"sec","value_warm":${num2(totalWarm)},$protocol,"queries":$qmap$omitted,"failed":$failedJson,"sf":${q(sfDir)}}"""
    }
    // Candidate sizes shrink to 0 (keep=0 → no per-query map at all);
    // the totals/failed-only line is the floor, so the budget is met for
    // any battery size short of an absurd failed-list.
    val line = (Iterator.range(results.size, 0, -8) ++ Iterator(0)).map(compactLine)
      .find(_.length <= 1800).getOrElse(compactLine(0))
    println(line)
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
