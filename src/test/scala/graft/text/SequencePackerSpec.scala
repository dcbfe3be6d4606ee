package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SequencePackerSpec extends SparkSpec {
  import spark.implicits._

  test("packing preserves every doc once, respects capacity, truncates giants") {
    val docs = Seq(
      (1L, 400), (2L, 500), (3L, 200), // 400+500 fit; 200 starts seq 2 with...
      (4L, 300), (5L, 9999) // ...300; the giant truncates to 1024 alone
    ).toDF("doc_id", "n_tok")
    val packed = SequencePacker.pack(docs.coalesce(1), "doc_id", "n_tok", maxTokens = 1024)
      .collect().sortBy(_.seq_index)

    assert(packed.flatMap(_.doc_ids).sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    assert(packed.forall(_.n_tokens <= 1024))
    assert(packed.map(_.n_tokens).sum == 400 + 500 + 200 + 300 + 1024)
  }

  test("packs the real documents table densely") {
    val docs = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .withColumn("n_tok", TextAnalysis.tokenCount(col("text")))
    val packed = SequencePacker.pack(docs, "doc_id", "n_tok", maxTokens = 512, numPartitions = 4)
    val stats = packed.agg(
      sum(col("n_docs")).as("docs"),
      max(col("n_tokens")).as("maxtok"),
      avg(col("n_tokens")).as("avgtok")).head()
    assert(stats.getAs[Long]("docs") == 500L)
    assert(stats.getAs[Int]("maxtok") <= 512)
    assert(stats.getAs[Double]("avgtok") > 512 * 0.6, "packing should be reasonably dense")
  }
}
