package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CrawlBudgetSpec extends SparkSpec {
  import spark.implicits._

  private def frontier(perHost: Map[String, Int]) =
    perHost.toSeq.flatMap { case (h, n) =>
      (0 until n).map(i => f"https://$h/p/$i%04d")
    }.toDF("url")

  test("cap: per-host quota from delays, default for absent hosts, floor 1") {
    val f = frontier(Map("a.com" -> 40, "b.com" -> 3, "c.com" -> 10))
    val delays = Seq(("a.com", 2.0), ("b.com", 100.0)).toDF("host", "delay_seconds")
    // horizon 60: a.com quota 30, b.com floor(0.6)→1 (liveness floor),
    // c.com default 5 → quota 12
    val kept = CrawlBudget.cap(f, "url", delays, 60.0, 5.0)
      .withColumn("h", UrlOps.host(col("url")))
      .groupBy("h").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(kept == Map("a.com" -> 30L, "b.com" -> 1L, "c.com" -> 10L), s"$kept")
    // determinism: the lexicographically smallest URLs win
    val aUrls = CrawlBudget.cap(f, "url", delays, 60.0, 5.0)
      .filter(col("url").contains("a.com"))
      .as[String].collect().sorted.toSeq
    assert(aUrls == (0 until 30).map(i => f"https://a.com/p/$i%04d"))
  }

  test("salted two-phase rank equals the single-window form") {
    val f = frontier(Map("hot.com" -> 500, "cold.com" -> 4)).localCheckpoint()
    val delays = Seq(("hot.com", 3.0)).toDF("host", "delay_seconds")
    def run(salts: Int) = CrawlBudget.cap(f, "url", delays, 60.0, 5.0, salts)
      .as[String].collect().sorted.toSeq
    val salted = run(16)
    val plain = run(1)
    assert(salted == plain, "salted two-phase diverged from the single window")
    assert(salted.count(_.contains("hot.com")) == 20) // floor(60/3)
  }

  test("priority order: highest-value URLs win the quota; salted agrees") {
    val f = (0 until 30).map { i =>
      (f"https://a.com/p/$i%04d", (i * 7) % 30) // priorities permuted
    }.toDF("url", "priority")
    val delays = Seq(("a.com", 12.0)).toDF("host", "delay_seconds") // quota 5
    def run(salts: Int) = CrawlBudget.cap(f, "url", delays, 60.0, 5.0,
        skewSalts = salts, priorityCol = Some("priority"))
      .select("priority").as[Int].collect().sorted.toSeq
    val kept = run(16)
    // top-5 priorities of (i*7)%30 over i=0..29: each residue appears
    // once per 30/gcd(7,30)=30 → values are a permutation of 0..29
    assert(kept == Seq(25, 26, 27, 28, 29), s"kept priorities: $kept")
    assert(run(1) == kept, "salted priority rank diverged from single window")
  }

  test("invalid knobs are rejected") {
    val f = frontier(Map("a.com" -> 1))
    val d = Seq(("a.com", 1.0)).toDF("host", "delay_seconds")
    intercept[IllegalArgumentException](CrawlBudget.cap(f, "url", d, 0.0, 5.0))
    intercept[IllegalArgumentException](CrawlBudget.cap(f, "url", d, 60.0, -1.0))
    intercept[IllegalArgumentException](CrawlBudget.cap(f, "url", d, 60.0, 5.0, 0))
  }
}
