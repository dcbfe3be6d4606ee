package graft

import java.util.Locale

import org.apache.spark.sql.SparkSession

/** Benchmark main: every SparkEntry query against SPARK_GRAFT_SF_DIR
  * (default sf0.1), one JSON line on stdout for the driver. Failed
  * queries are listed in a "failed" array — a crash must not read as a
  * fast green run.
  */
object Bench {

  /** JSON string escape (same contract as Verify's). */
  private def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Locale-invariant decimal formatting (a de_DE default locale would
    * print 0,123 and corrupt the JSON).
    */
  private def num(v: Double): String = String.format(Locale.ROOT, "%.3f", Double.box(v))

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

    // Dev-only subset filter (comma-separated names); the driver sets no
    // filter and always benches the full battery.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(',').map(_.trim).toSet)
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() }
      catch {
        case e: Exception =>
          failed += name
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      val elapsed = (System.nanoTime() - t0) / 1e9
      // Release persisted/localCheckpoint blocks the query left behind —
      // cross-query storage pollution otherwise squeezes execution memory
      // for later queries (measured: 8x slowdown on the shuffle-heavy
      // ones once the block manager fills). Blocking, and outside the
      // timed window: an async unpersist races into the NEXT query's
      // timing and showed up as multi-second phantom spikes there.
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      System.gc()
      name -> elapsed
    }
    val qs = results.map { case (k, v) => q(k) + ":" + num(v) }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val failedJson = failed.map(q).mkString("[", ",", "]")
    println(s"""{"metric":"total","value":${num(total)},"unit":"sec","queries":$qs,"failed":$failedJson,"sf":${q(sfDir)}}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
