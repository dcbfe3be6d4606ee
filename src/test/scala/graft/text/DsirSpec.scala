package graft.text

import graft.SparkSpec

class DsirSpec extends SparkSpec {
  import spark.implicits._

  // target: "a b" → feats {a, b, "a b"}, N_t = 3
  // raw: 10:"a a" → {a, a, "a a"}; 11:"z z" → {z, z, "z z"}; N_r = 6
  // merged vocab V = |{a, b, "a b", "a a", z, "z z"}| = 6
  private val target = Seq((1L, "a b")).toDF("doc_id", "text")
  private val raw = Seq((10L, "a a"), (11L, "z z")).toDF("doc_id", "text")

  test("hand-computed model totals and mean importance log-ratios") {
    val m = Dsir.train(target, raw, "doc_id", "text")
    assert(m.nTarget == 3L)
    assert(m.nRaw == 6L)
    assert(m.vocabSize == 6L)
    val out = Dsir.score(raw, m, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // doc 10: 2× lp(a) = ln(2/9)−ln(3/12), 1× lp("a a") = ln(1/9)−ln(2/12)
    val lpA = math.log(2.0 / 9.0) - math.log(3.0 / 12.0)
    val lpAA = math.log(1.0 / 9.0) - math.log(2.0 / 12.0)
    assert(out(10L)._1 == 3L)
    assert(math.abs(out(10L)._2 - (2 * lpA + lpAA) / 3.0) < 1e-5)
    // doc 11: 2× lp(z) = ln(1/9)−ln(3/12), 1× lp("z z") = ln(1/9)−ln(2/12)
    val lpZ = math.log(1.0 / 9.0) - math.log(3.0 / 12.0)
    assert(math.abs(out(11L)._2 - (2 * lpZ + lpAA) / 3.0) < 1e-5)
    // the doc sharing vocabulary with the target must outrank the one
    // that doesn't
    assert(out(10L)._2 > out(11L)._2)
  }

  test("selectTopK is a deterministic (score desc, id) cut, not a global sort") {
    val m = Dsir.train(target, raw, "doc_id", "text")
    val scored = Dsir.score(raw, m, "doc_id", "text")
    val top1 = Dsir.selectTopK(scored, "doc_id", "dsir_score", k = 1)
    assert(top1.collect().map(_.getLong(0)).toSeq == Seq(10L))
    // plan gate: per-partition heaps + k-row driver merge, no Exchange
    // for a global sort
    val plan = top1.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("features absent from one corpus get the add-one floor, never a null score") {
    val m = Dsir.train(target, raw, "doc_id", "text")
    val out = Dsir.score(Seq((20L, "b z")).toDF("doc_id", "text"),
      m, "doc_id", "text").collect()
    assert(out.length == 1)
    // b: target-only; z: raw-only; "b z": absent both sides (probe doc
    // outside both corpora) — all finite
    assert(!out.head.isNullAt(2))
    assert(out.head.getLong(1) == 3L)
  }
}
