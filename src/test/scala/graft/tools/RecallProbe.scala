package graft.tools

import org.apache.spark.sql.functions._

import graft.similarity._

/** Scratch: measure ANN recall@1 vs brute force at a given sf dir. */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.core.EngineSession
      .builder(master = "local[8]", shufflePartitions = 8, appName = "recall-probe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = graft.sources.Tables.load(spark, dir, "embeddings")

    val exact = BruteForceKnn.topK(e, e, "vec_id", "embedding", k = 1)
      .groupBy(col("query_id")).agg(round(max(col("cosine")), 6).as("exact_cos"))

    def recall(approx: org.apache.spark.sql.DataFrame): (Long, Long, Double) = {
      val j = exact.join(approx, Seq("query_id"), "left")
        .agg(
          count(lit(1)).as("n"),
          sum(when(abs(col("best_cosine") - col("exact_cos")) < lit(1e-9), 1L).otherwise(0L)).as("hits"))
        .collect()(0)
      val n = j.getLong(0); val h = j.getLong(1)
      (n, h, h.toDouble / n)
    }

    val lsh = HyperplaneLsh.approxNearest(e, "vec_id", "embedding")
      .select(col("query_id"), col("best_cosine"))
    println(s"LSH recall@1: ${recall(lsh)}")

    val model = IvfIndex.train(e, "embedding", nCells = 8)
    val ivf = IvfIndex.approxTopK(e, "vec_id", "embedding", model, k = 1)
      .filter(col("rnk") === 1)
      .select(col("query_id"), col("cosine").as("best_cosine"))
    println(s"IVF recall@1: ${recall(ivf)}")
    spark.stop()
  }
}
