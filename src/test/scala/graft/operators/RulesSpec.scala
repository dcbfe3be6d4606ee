package graft.operators

import graft.SparkSpec

class RulesSpec extends SparkSpec {
  import spark.implicits._

  test("rules apply in order: filter, derive, conditional update") {
    val df = Seq(
      ("a", 10.0), ("b", 3.0), ("c", -1.0)
    ).toDF("k", "v")
    val out = Rules.applyAll(df, Seq(
      Rules.FilterRule("positive", "v >= 0"),
      Rules.ColumnRule("double-it", "v2", "v * 2"),
      Rules.WhenRule("zero-b", "v2", "k = 'b'", "0.0")))
      .as[(String, Double, Double)].collect().sortBy(_._1).toSeq
    assert(out == Seq(("a", 10.0, 20.0), ("b", 3.0, 0.0)))
  }

  test("a bad expression fails at plan time with the rule's SQL surfaced") {
    val df = Seq(("a", 1.0)).toDF("k", "v")
    val e = intercept[Exception] {
      Rules.applyAll(df, Seq(Rules.FilterRule("broken", "no_such_col > 1"))).collect()
    }
    assert(e.getMessage.contains("no_such_col"))
  }
}
