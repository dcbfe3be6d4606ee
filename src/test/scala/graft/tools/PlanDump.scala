package graft.tools

import org.apache.spark.sql.functions._

/** Dev scratch main: dump the physical plan of whatever is under scrutiny.
  * Not part of the engine surface; edit freely.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.EngineSession
      .builder(master = "local[4]", shufflePartitions = 4, appName = "plan-dump")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val q = graft.dedup.NgramJaccard.similarPairs(docs, "doc_id", "text", 0.5)
    println("=== PLAN START ===")
    println(q.queryExecution.executedPlan.toString.take(6000))
    println("=== PLAN END ===")
    spark.stop()
  }
}
