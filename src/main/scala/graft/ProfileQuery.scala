package graft

import java.util.Locale

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev-only measurement harness (guide §1: measure first): runs ONE named
  * SparkEntry query against SPARK_GRAFT_SF_DIR and prints a per-job wall-time
  * table attributed by call site, plus per-stage task-time totals — the
  * local[32] stand-in for the Spark UI (disabled in EngineSession). Not part
  * of the driver contract; Bench remains the timing channel.
  *
  * Usage: sbt "runMain graft.ProfileQuery q242_crawl_loop_rolling[,qNNN...] [warmRuns]"
  */
object ProfileQuery {

  private final case class JobRow(
      id: Int, start: Long, var end: Long = 0L, site: String, desc: String)

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ProfileQuery <queryName>[,<queryName>...] [warmRuns]")
    val names = args(0).split(',').map(_.trim).filter(_.nonEmpty).toSeq
    val warmRuns = if (args.length > 1) args(1).toInt else 1
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark: SparkSession = core.EngineSession
      .builder(master = s"local[$cpus]", shufflePartitions = cpus,
        appName = "graft-profile")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    core.EngineSession.quietLocalCheckpointWarnings()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    names.foreach(profileOne(spark, sfDir, _, warmRuns))
    spark.stop()
  }

  private def profileOne(
      spark: SparkSession, sfDir: String, name: String, warmRuns: Int): Unit = {

    val jobs = mutable.LinkedHashMap.empty[Int, JobRow]
    val stageTaskMs = mutable.LinkedHashMap.empty[Int, (String, Long, Int)]
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs.synchronized {
        val site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        jobs(js.jobId) = JobRow(js.jobId, js.time, site = site, desc = desc)
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.get(je.jobId).foreach(_.end = je.time)
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        stageTaskMs.synchronized {
          val info = sc.stageInfo
          val run = info.taskMetrics.executorRunTime
          stageTaskMs(info.stageId) =
            (info.name.take(90), run, info.numTasks)
        }
    }

    val fn = SparkEntry.queries(name)
    // cold run (informational — Bench owns the cold channel)
    val tc0 = System.nanoTime()
    fn(spark, sfDir).count(): Unit
    val coldWall = (System.nanoTime() - tc0) / 1e9
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    System.gc()

    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    var r = 0
    while (r < warmRuns) {
      fn(spark, sfDir).count(): Unit
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      r += 1
    }
    val wall = (System.nanoTime() - t0) / 1e9
    spark.sparkContext.removeSparkListener(listener)
    // let straggler listener events drain
    Thread.sleep(500)

    def fmt(v: Double): String = String.format(Locale.ROOT, "%8.3f", Double.box(v))
    println(s"== $name: $warmRuns warm run(s), wall ${fmt(wall)} s " +
      s"(cold ${fmt(coldWall)} s) ==")
    val rows = jobs.synchronized(jobs.values.toSeq)
    val totalJobMs = rows.map(j => math.max(0L, j.end - j.start)).sum
    println(s"-- ${rows.size} jobs, sum of job wall ${fmt(totalJobMs / 1e3)} s " +
      "(gaps = driver/planning time) --")
    val bySite = rows.groupBy(_.site).map { case (site, js) =>
      (site, js.map(j => math.max(0L, j.end - j.start)).sum, js.size)
    }.toSeq.sortBy(-_._2)
    bySite.take(40).foreach { case (site, ms, n) =>
      println(f"${ms / 1e3}%9.3f s  n=$n%-4d $site")
    }
    println("-- top stages by executor task time --")
    stageTaskMs.synchronized(stageTaskMs.toSeq).sortBy(-_._2._2).take(25)
      .foreach { case (sid, (nm, ms, nt)) =>
        println(f"${ms / 1e3}%9.3f s-task  stage=$sid%-5d tasks=$nt%-4d $nm")
      }
  }
}
