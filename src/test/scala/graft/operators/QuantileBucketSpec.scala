package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class QuantileBucketSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")

  test("differential vs the global-window formulation") {
    val two = QuantileBucket.bucketed(docs, "doc_id", "n_chars", k = 10)
    val n = docs.count()
    val win = docs
      .select(col("doc_id").as("id"), col("n_chars").cast("double").as("score"))
      .withColumn("rank",
        row_number().over(Window.orderBy(col("score"), col("id"))).cast("long"))
      .withColumn("bucket", expr(s"((rank - 1) * 10) div ${n}L"))
    assert(two.exceptAll(win).isEmpty && win.exceptAll(two).isEmpty)
  }

  test("ranks are a 1..N permutation and bucket sizes differ by at most one") {
    val out = QuantileBucket.bucketed(docs, "doc_id", "n_chars", k = 10)
    val n = docs.count()
    assert(out.count() == n)
    assert(out.agg(min(col("rank")), max(col("rank")),
      countDistinct(col("rank"))).head() match {
      case r => r.getLong(0) == 1L && r.getLong(1) == n && r.getLong(2) == n
    })
    val sizes = out.groupBy("bucket").count().collect().map(_.getLong(1))
    assert(sizes.length == 10 && sizes.max - sizes.min <= 1)
  }

  test("invariant to requested partition count") {
    val a = QuantileBucket.bucketed(docs, "doc_id", "n_chars", k = 4, partitions = 3)
    val b = QuantileBucket.bucketed(docs, "doc_id", "n_chars", k = 4, partitions = 11)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("fused: direction-aware buckets and mean ensemble") {
    // 4 rows, k=4 → each bucket holds one row. "good" is higher-better,
    // "noise" lower-better: id 1 is best on both (bucket 3 twice).
    val df = Seq(
      (1L, 40.0, 0.1),
      (2L, 30.0, 0.2),
      (3L, 20.0, 0.3),
      (4L, 10.0, 0.4)).toDF("id", "good", "noise")
    val got = QuantileBucket.fused(df, "id", Seq(("good", true), ("noise", false)), k = 4)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      (1L, 3L, 3L, 3.0),
      (2L, 2L, 2L, 2.0),
      (3L, 1L, 1L, 1.0),
      (4L, 0L, 0L, 0.0)))
  }

  test("durable checkpoint mode is identical to ephemeral across partition counts") {
    val dir = java.nio.file.Files.createTempDirectory("quantile-ckpt").toString
    val ephemeral = QuantileBucket.bucketed(docs, "doc_id", "n_chars", k = 7)
    for (p <- Seq(1, 3, 11)) {
      val durable = QuantileBucket.bucketed(
        docs, "doc_id", "n_chars", k = 7, partitions = p,
        checkpointDir = Some(s"$dir/p$p"))
      assert(durable.exceptAll(ephemeral).isEmpty &&
        ephemeral.exceptAll(durable).isEmpty, s"partitions=$p")
    }
    val sig = docs.withColumn("text_len", length(col("text")))
    val fusedEph = QuantileBucket.fused(
      sig, "doc_id", Seq(("n_chars", true), ("text_len", false)), k = 5)
    val fusedDur = QuantileBucket.fused(
      sig, "doc_id", Seq(("n_chars", true), ("text_len", false)), k = 5,
      partitions = 3, checkpointDir = Some(s"$dir/fused"))
    assert(fusedDur.exceptAll(fusedEph).isEmpty &&
      fusedEph.exceptAll(fusedDur).isEmpty)
  }

  test("plan: no single-partition stage anywhere") {
    val p = QuantileBucket.bucketed(docs, "doc_id", "n_chars", k = 10)
      .queryExecution.executedPlan.toString
    assert(!p.contains("SinglePartition"), p)
  }
}
