package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bench staleness guard (r10–r12 verdicts, ordered three times): the
  * committed BENCH_RECORD.md must describe the CURRENT query battery.
  * `graft.Bench` embeds a fingerprint of the sorted query-name set at
  * record time; this spec recomputes it from `SparkEntry.queries` and
  * fails the build when they diverge — i.e. when a query was added or
  * removed without re-running the full bench. The failure message says
  * exactly how to fix it.
  */
class BenchRecordSpec extends AnyFunSuite {

  private val recordPath = java.nio.file.Paths.get("BENCH_RECORD.md")

  test("BENCH_RECORD.md matches the current SparkEntry.queries set") {
    assert(java.nio.file.Files.exists(recordPath),
      "BENCH_RECORD.md is missing — run graft.Bench (full battery, no " +
        "SPARK_GRAFT_ONLY) to record it")
    val record = new String(java.nio.file.Files.readAllBytes(recordPath), "UTF-8")
    val hashRe = "hash `([0-9a-f]{16})`".r
    val recorded = hashRe.findFirstMatchIn(record).map(_.group(1))
    assert(recorded.nonEmpty,
      "BENCH_RECORD.md carries no query-set hash — it predates the " +
        "staleness guard; re-run graft.Bench (full battery) to re-record")
    val current = Bench.querySetHash(SparkEntry.queries.keys)
    assert(recorded.get == current,
      s"BENCH_RECORD.md is STALE: recorded query-set hash ${recorded.get} " +
        s"!= current $current (${SparkEntry.queries.size} queries). " +
        "SparkEntry.queries changed since the last full bench — re-run " +
        "graft.Bench (full battery, no SPARK_GRAFT_ONLY) and commit the " +
        "regenerated BENCH_RECORD.md + bench_detail.json")
  }

  test("recorded query count matches the battery size") {
    val record = new String(java.nio.file.Files.readAllBytes(recordPath), "UTF-8")
    val countRe = "Query set: (\\d+) queries".r
    countRe.findFirstMatchIn(record).map(_.group(1).toInt) match {
      case Some(n) => assert(n == SparkEntry.queries.size,
        s"recorded query count $n != current battery ${SparkEntry.queries.size}")
      case None => fail("BENCH_RECORD.md carries no 'Query set: N queries' " +
        "line; re-run graft.Bench to re-record")
    }
  }
}
