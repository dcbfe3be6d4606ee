package graft.core

/** Bounded-lifetime scratch directories for driver queries that must
  * materialize state per invocation (TxTable MERGE round trips, streaming
  * sink + checkpoint dirs). Each call hands out a fresh temp dir; older
  * dirs are reaped once more than `keep` exist, and a shutdown hook reaps
  * the rest — disk stays bounded however many times a bench battery
  * repeats.
  *
  * Contract with callers: a dir older than the newest `keep` may be
  * deleted at any subsequent `fresh` call, so any DataFrame returned to a
  * consumer must be decoupled from its dir first (eager
  * `localCheckpoint`) — reap eligibility equals consumption. All queue
  * ops (reap loop AND add) run under one lock (concurrent callers racing
  * size()/poll() once NPE'd on a null poll). `keep` defaults high enough
  * that a dir still in use DURING a query body (q82 holds its dir for a
  * whole StreamingQuery run) survives several concurrent invocations;
  * genuinely parallel query drivers should raise it further.
  */
object ScratchDirs {

  private val created = new java.util.concurrent.ConcurrentLinkedQueue[java.io.File]()
  private lazy val reaper: Unit = Runtime.getRuntime.addShutdownHook(new Thread(() => {
    created.forEach(deleteRecursively)
  }))

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }

  def fresh(prefix: String, keep: Int = 8): String = {
    reaper
    val d = java.nio.file.Files.createTempDirectory(prefix).toFile
    created.synchronized {
      while (created.size() > keep) {
        val victim = created.poll()
        if (victim != null) deleteRecursively(victim)
      }
      created.add(d)
    }
    d.getAbsolutePath
  }
}
