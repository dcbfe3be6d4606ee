package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CorpusDiffSpec extends SparkSpec {
  import spark.implicits._

  test("hand-built snapshots: every status classified") {
    val oldSnap = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("id", "text")
    val newSnap = Seq((1L, "alpha"), (2L, "beta CHANGED"), (4L, "delta")).toDF("id", "text")
    val got = CorpusDiff.diff(oldSnap, newSnap, "id", Seq("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed", 4L -> "added"))
  }

  test("multi-column content identity") {
    val oldSnap = Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "text", "meta")
    val newSnap = Seq((1L, "a", 10L), (2L, "b", 21L)).toDF("id", "text", "meta")
    val got = CorpusDiff.diff(oldSnap, newSnap, "id", Seq("text", "meta"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed"))
  }

  test("signature-pair verdicts equal text-compare verdicts on the real corpus") {
    val d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select("doc_id", "text")
    val newSnap = d.filter(col("doc_id") % 13 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 11 === 0, concat(col("text"), lit(" zzchanged")))
          .otherwise(col("text")).as("text"))
    val bySig = CorpusDiff.diff(d, newSnap, "doc_id", Seq("text"))
    val byText = d.as("o").join(newSnap.as("n"), col("o.doc_id") === col("n.doc_id"), "full_outer")
      .select(
        coalesce(col("o.doc_id"), col("n.doc_id")).as("doc_id"),
        when(col("o.doc_id").isNull, "added")
          .when(col("n.doc_id").isNull, "removed")
          .when(col("o.text") =!= col("n.text"), "changed")
          .otherwise("unchanged").as("status"))
    assert(bySig.exceptAll(byText).isEmpty && byText.exceptAll(bySig).isEmpty)
  }

  test("plan: id-keyed full-outer join over signatures, no text shuffle") {
    val d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val df = CorpusDiff.diff(d, d, "doc_id", Seq("text"))
    df.count()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("FullOuter"), p)
    assert(p.contains("xxhash64"), p)
    // The exchanges must repartition the skinny signature projection —
    // text is consumed at the scan and never reaches a shuffle.
    val exchangeLines = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchangeLines.nonEmpty && exchangeLines.forall(!_.contains("text")), p)
  }
}
