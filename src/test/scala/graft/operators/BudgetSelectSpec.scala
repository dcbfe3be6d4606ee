package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BudgetSelectSpec extends SparkSpec {
  import spark.implicits._

  private val items = Seq(
    // (id, score, cost) — rank order by (score desc, id): 5, 2, 4, 1, 3
    (1L, 1.0, 40L),
    (2L, 3.0, 30L),
    (3L, 0.5, 10L),
    (4L, 2.0, 25L),
    (5L, 9.0, 50L)
  ).toDF("id", "score", "cost")

  private def select(budget: Long, partitions: Int = 3): Seq[(Long, Long)] =
    BudgetSelect.selectUnderBudget(items, "id", "score", "cost", budget, partitions)
      .orderBy("cum_cost")
      .select(col("id"), col("cum_cost")).as[(Long, Long)].collect().toSeq

  test("keeps the best-ranked prefix whose cumulative cost fits") {
    // prefix cumsums: 50, 80, 105, 145, 155
    assert(select(budget = 110) == Seq((5L, 50L), (2L, 80L), (4L, 105L)))
  }

  test("a budget cutting exactly on a boundary includes that row") {
    assert(select(budget = 80).map(_._1) == Seq(5L, 2L))
  }

  test("budget below the first row selects nothing; huge budget selects all") {
    assert(select(budget = 49).isEmpty)
    assert(select(budget = 1000).map(_._1) == Seq(5L, 2L, 4L, 1L, 3L))
  }

  test("result is identical for any partition count (global prefix exactness)") {
    for (p <- Seq(1, 2, 4, 8)) {
      assert(select(budget = 110, partitions = p) ==
        Seq((5L, 50L), (2L, 80L), (4L, 105L)), s"partitions=$p")
    }
  }

  test("durable checkpoint mode produces identical output to ephemeral") {
    val dir = java.nio.file.Files.createTempDirectory("budget-ckpt").toString
    for (budget <- Seq(49L, 80L, 110L, 1000L); p <- Seq(1, 3, 8)) {
      val durable = BudgetSelect
        .selectUnderBudget(items, "id", "score", "cost", budget, p, Some(dir))
        .orderBy("cum_cost")
        .select(col("id"), col("cum_cost")).as[(Long, Long)].collect().toSeq
      assert(durable == select(budget, p), s"budget=$budget partitions=$p")
    }
  }

  private val grouped = Seq(
    // per group (score desc, id) rank: en → 5, 2, 4, 1, 3; de → 11, 12
    (1L, "en", 1.0, 40L),
    (2L, "en", 3.0, 30L),
    (3L, "en", 0.5, 10L),
    (4L, "en", 2.0, 25L),
    (5L, "en", 9.0, 50L),
    (11L, "de", 2.0, 20L),
    (12L, "de", 1.0, 30L),
    (21L, "zz", 5.0, 1L) // no budget for zz → dropped
  ).toDF("id", "lang", "score", "cost")

  private def selectGrouped(
      budgets: Map[String, Long], partitions: Int = 3,
      ckpt: Option[String] = None): Seq[(Long, String, Long)] =
    BudgetSelect.selectUnderBudgetPerGroup(
        grouped, "id", "lang", "score", "cost", budgets, partitions, ckpt)
      .orderBy("grp", "cum_cost")
      .select(col("id"), col("grp"), col("cum_cost"))
      .as[(Long, String, Long)].collect().toSeq

  test("per-group budgets select independently; unbudgeted groups drop") {
    // en cumsums: 50, 80, 105, 145, 155; de cumsums: 20, 50
    assert(selectGrouped(Map("en" -> 110L, "de" -> 25L)) ==
      Seq(("de", 11L, 20L), ("en", 5L, 50L), ("en", 2L, 80L), ("en", 4L, 105L))
        .map(t => (t._2, t._1, t._3)))
  }

  test("grouped selection is partition-count invariant and durable ≡ ephemeral") {
    val expect = selectGrouped(Map("en" -> 145L, "de" -> 50L), partitions = 1)
    val dir = java.nio.file.Files.createTempDirectory("budget-grp-ckpt").toString
    for (p <- Seq(1, 2, 4, 8)) {
      assert(selectGrouped(Map("en" -> 145L, "de" -> 50L), p) == expect, s"p=$p")
      assert(selectGrouped(Map("en" -> 145L, "de" -> 50L), p, Some(dir)) == expect,
        s"durable p=$p")
    }
  }

  test("grouped: zero budget selects nothing for that group only") {
    val out = selectGrouped(Map("en" -> 0L, "de" -> 20L))
    assert(out == Seq((11L, "de", 20L)))
  }

  test("negative costs fail loudly in both modes") {
    val bad = items.unionByName(Seq((7L, 4.0, -5L)).toDF("id", "score", "cost"))
    val dir = java.nio.file.Files.createTempDirectory("budget-neg").toString
    for (ckpt <- Seq(None, Some(dir))) {
      val e = intercept[IllegalArgumentException] {
        BudgetSelect.selectUnderBudget(bad, "id", "score", "cost", 100L, 3, ckpt)
          .collect()
      }
      assert(e.getMessage.contains("non-negative"), s"mode=$ckpt: ${e.getMessage}")
    }
  }

  test("zero-cost rows ride along inside the budget") {
    val withFree = items.unionByName(Seq((6L, 5.0, 0L)).toDF("id", "score", "cost"))
    val out = BudgetSelect.selectUnderBudget(withFree, "id", "score", "cost", 80L, 3)
      .orderBy("cum_cost", "id").select("id").as[Long].collect().toSeq
    assert(out == Seq(5L, 6L, 2L)) // 6 ranks between 5 and 2, costs nothing
  }
}
