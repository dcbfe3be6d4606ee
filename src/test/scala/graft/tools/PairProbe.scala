package graft.tools
import org.apache.spark.sql.functions._
import graft.similarity._
object PairProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.core.EngineSession.builder(master = "local[8]", shufflePartitions = 8, appName = "pair-probe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = graft.sources.Tables.load(spark, dir, "embeddings")
    val exact = BruteForceKnn.nearDuplicatePairs(e, "vec_id", "embedding", threshold = 0.4).count()
    for (nt <- Seq(4, 8)) {
      val found = HyperplaneLsh.nearDuplicatePairs(e, "vec_id", "embedding", threshold = 0.4, nTables = nt).count()
      println(s"nTables=$nt: found $found / exact $exact = ${found.toDouble / exact}")
    }
    spark.stop()
  }
}
