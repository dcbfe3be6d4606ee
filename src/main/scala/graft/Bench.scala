package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: every SparkEntry query against SPARK_GRAFT_SF_DIR
  * (default sf0.1), one JSON line on stdout for the driver.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark: SparkSession = core.EngineSession
      .builder(master = s"local[$cpus]", shufflePartitions = cpus, appName = "graft-bench")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // One warm-up action so JVM/codegen startup isn't billed to the first
    // query in the report.
    spark.read.parquet(s"$sfDir/region.parquet").count()

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() }
      catch { case e: Throwable => System.err.println(s"[bench] $name failed: ${e.getMessage}") }
      val elapsed = (System.nanoTime() - t0) / 1e9
      // Release persisted/localCheckpoint blocks the query left behind —
      // cross-query storage pollution otherwise squeezes execution memory
      // for later queries (measured: 8x slowdown on the shuffle-heavy
      // ones once the block manager fills).
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      name -> elapsed
    }
    val qs = results.map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
