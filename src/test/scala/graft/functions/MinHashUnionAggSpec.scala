package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.dedup.{MinHashDedup, Shingles}

class MinHashUnionAggSpec extends SparkSpec {
  import spark.implicits._

  test("aggregated signature equals the signature of the concatenated group") {
    val k = 32
    val docs = Seq(
      ("src1", "alpha beta gamma delta epsilon zeta"),
      ("src1", "eta theta iota kappa lambda mu"),
      ("src2", "nu xi omicron pi rho sigma"))
      .toDF("source", "text")

    // Per-group union signature via the aggregator...
    val agg = docs
      .select(col("source"),
        MinHashDedup.signature(Shingles.shingleSet(col("text")), k).as("sig"))
      .as[(String, Seq[Long])]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(MinHashUnionAgg.toColumn.name("usig"))
      .collect().toMap

    // ...must equal signing each group's pooled shingle set directly.
    val direct = docs
      .groupBy("source")
      .agg(flatten(collect_list(Shingles.shingleSet(col("text")))).as("pooled"))
      .select(col("source"), MinHashDedup.signature(array_distinct(col("pooled")), k).as("sig"))
      .as[(String, Seq[Long])]
      .collect().toMap

    assert(agg.keySet == direct.keySet)
    agg.keys.foreach(src => assert(agg(src) == direct(src), s"group $src"))
  }
}
