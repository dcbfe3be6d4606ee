package graft.tools

import org.apache.spark.sql.functions._

/** Dev scratch main: dump the physical plan of whatever is under scrutiny.
  * Not part of the engine surface; edit freely.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.EngineSession
      .builder(master = "local[32]", shufflePartitions = 32, appName = "plan-dump")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.sources.Tables.load(spark, "/root/testdata/sf0.1", "documents")
    docs.count() // warm scan

    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body
      println(f"[stage] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val withSets = t("shingle sets + checkpoint") {
      docs.select(col("doc_id"), graft.dedup.Shingles.shingleSet(col("text")).as("shset"))
        .filter(size(col("shset")) > 0).localCheckpoint()
    }
    val withSig = withSets.withColumn("sig",
      graft.dedup.MinHashDedup.signature(col("shset"), 128))
    t("signatures (count)") { withSig.select(col("sig")(0)).count() }
    val cands = graft.dedup.MinHashDedup.candidatePairs(withSig, "doc_id", "sig", 32, 4)
    t("candidates") { cands.count() }
    t("full pipeline") {
      graft.dedup.MinHashDedup.nearDuplicatePairs(docs, "doc_id", "text").count()
    }
    spark.stop()
  }
}
