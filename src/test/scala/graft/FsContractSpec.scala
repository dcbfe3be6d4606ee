package graft

import java.net.URI

import org.apache.hadoop.fs.{FileStatus, FileUtil, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.spark.sql.functions._

import graft.core.{FileFormat, SinkSpec, SourceSpec}
import graft.meta.JobLedger
import graft.sinks.Writers
import graft.sources.Readers

/** Object-store emulation for the filesystem contract: a `mockfs://` scheme
  * backed by local disk whose `rename` is a COPY + DELETE — observable
  * semantics of HDFS rename, but never an atomic metadata move, which is
  * exactly the property s3a lacks (the reference's whole deployment surface
  * is S3: extractor.py:71-102, loader.py:115-142). Every rename is counted
  * so the suite can prove the commit path actually crossed this FS.
  *
  * Hadoop instantiates this reflectively from `fs.mockfs.impl`, hence the
  * public no-arg class.
  */
class FakeObjectStoreFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "mockfs"
  override def getUri: URI = URI.create("mockfs:///")

  /** RawLocalFileSystem statuses lazy-load permissions via `new File(uri)`,
    * which rejects any scheme but `file:` — exactly the kind of hidden
    * local-FS assumption this suite exists to catch. A real object store
    * returns complete metadata from the listing; emulate that by
    * materializing the status eagerly with default permissions.
    */
  private def solidify(st: FileStatus): FileStatus =
    new FileStatus(st.getLen, st.isDirectory, st.getReplication, st.getBlockSize,
      st.getModificationTime, st.getAccessTime,
      if (st.isDirectory) FsPermission.getDirDefault else FsPermission.getFileDefault,
      "graft", "graft", st.getPath)

  override def getFileStatus(f: Path): FileStatus = solidify(super.getFileStatus(f))

  override def listStatus(f: Path): Array[FileStatus] = super.listStatus(f).map(solidify)

  override def rename(src: Path, dst: Path): Boolean = {
    FakeObjectStoreFileSystem.renames.incrementAndGet()
    if (!exists(src)) false
    else {
      // HDFS semantics: an existing directory destination receives src
      // INSIDE it; an existing file destination refuses.
      val target =
        if (exists(dst) && getFileStatus(dst).isDirectory) new Path(dst, src.getName)
        else dst
      if (exists(target)) false
      else FileUtil.copy(this, src, this, target, true /* deleteSource */, getConf)
    }
  }
}

object FakeObjectStoreFileSystem {
  val renames = new java.util.concurrent.atomic.AtomicInteger(0)
}

/** Filesystem-contract suite: the identical extract → transform → load,
  * idempotent-append, archive-move, and ledger flows run against BOTH a
  * plain local path and the `mockfs://` object-store emulation above.
  * What this pins:
  *   - every path in Readers/Writers/JobLedger resolves its FileSystem from
  *     the path's own scheme (no hidden java.io.File / default-FS shortcut);
  *   - the commit path tolerates a rename that is merely copy+delete — the
  *     job succeeds, output parquet is complete, and no `_temporary`
  *     droppings remain;
  *   - L7 archive-move and ledger compaction (both rename-based with
  *     explicit false-return handling) behave identically on both schemes.
  */
class FsContractSpec extends SparkSpec {

  spark.sparkContext.hadoopConfiguration
    .set("fs.mockfs.impl", classOf[FakeObjectStoreFileSystem].getName)

  private def hfs(p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def writeText(path: String, text: String): Unit = {
    val out = hfs(path).create(new Path(path), true)
    out.write(text.getBytes("UTF-8"))
    out.close()
  }

  private def listAll(root: String): Seq[String] = {
    val fs = hfs(root)
    val it = fs.listFiles(new Path(root), true)
    val b = scala.collection.mutable.ArrayBuffer.empty[String]
    while (it.hasNext) b += it.next().getPath.toString
    b.toSeq
  }

  private val fixtures: Seq[(String, String => String)] = Seq(
    "local file fixture" -> identity[String] _,
    "mockfs object-store fixture (non-atomic rename)" -> (("mockfs://" + (_: String))))

  for ((fixtureName, scheme) <- fixtures) {

    test(s"[$fixtureName] single-file pipeline run commits, ledgers, and leaves no _temporary") {
      val root = scheme(tmpDir("fs-contract"))
      writeText(s"$root/in/sales.csv",
        "order_id,customer_id,quantity,unit_price\nA1,C1,1,10.5\nA2,C2,2,3.25\n")
      val ledger = new JobLedger(spark, s"$root/out/_ledger")
      val outcome = Pipeline.run(spark,
        SourceSpec.SingleFile(s"$root/in/sales.csv"),
        SinkSpec(s"$root/out", FileFormat.Parquet),
        ledger = Some(ledger))
      assert(outcome.status == "success", outcome.error)
      val load = outcome.load.get
      assert(load.rowsLoaded == 2L)
      assert(load.destination.startsWith(root), load.destination)
      assert(spark.read.parquet(load.destination).count() == 2L)
      assert(!listAll(load.destination).exists(_.contains("_temporary")),
        "committer left _temporary droppings in the destination")
      val row = ledger.getJob(outcome.jobId).get
      assert(row.getAs[String]("status") == "SUCCESS")
    }

    test(s"[$fixtureName] batch extract sweeps the prefix and aligns columns") {
      val root = scheme(tmpDir("fs-batch"))
      writeText(s"$root/in/a.csv", "order_id,quantity\nA,1\n")
      writeText(s"$root/in/b.csv", "order_id,status\nB,done\n")
      writeText(s"$root/in/ignored.xyz", "not a supported format")
      val df = Readers.batch(spark, s"$root/in")
      assert(df.count() == 2L)
      assert(df.columns.sorted.toSeq == Seq("order_id", "quantity", "status"))
    }

    test(s"[$fixtureName] appendDedup is idempotent across re-runs") {
      val root = scheme(tmpDir("fs-append"))
      val df = spark.range(5).select(col("id"),
        sha2(col("id").cast("string"), 256).as("_row_hash"))
      val first = Writers.appendDedup(df, s"$root/dedup")
      val second = Writers.appendDedup(df, s"$root/dedup")
      assert(first.status == "success" && first.rowsLoaded == 5L)
      assert(second.status == "skipped" && second.rowsLoaded == 0L)
      assert(spark.read.parquet(s"$root/dedup").count() == 5L)
    }

    test(s"[$fixtureName] archive move relocates the consumed source") {
      val root = scheme(tmpDir("fs-archive"))
      writeText(s"$root/in/data.csv", "a,b\n1,2\n")
      val at = java.time.Instant.parse("2024-03-05T10:00:00Z")
      val moved = Writers.archiveSource(
        spark.range(1).toDF(), s"$root/in/data.csv", root, at)
      assert(moved.isDefined)
      // compare via Path: "mockfs:///x" normalizes to "mockfs:/x"
      assert(moved.get == new Path(s"$root/archive/2024/03/data.csv").toString)
      assert(!hfs(root).exists(new Path(s"$root/in/data.csv")))
      assert(hfs(root).exists(new Path(moved.get)))
      // Recurring basename: second archive of the same name gets suffixed,
      // never silently lost (rename-returns-false handling).
      writeText(s"$root/in/data.csv", "a,b\n3,4\n")
      val again = Writers.archiveSource(
        spark.range(1).toDF(), s"$root/in/data.csv", root, at)
      assert(again.isDefined && again.get != moved.get, again)
    }

    test(s"[$fixtureName] ledger events and compaction survive the scheme") {
      val root = scheme(tmpDir("fs-ledger"))
      val ledger = new JobLedger(spark, s"$root/_ledger")
      for (i <- 1 to 3) {
        ledger.startJob(s"job-$i", Map("type" -> "direct"))
        ledger.completeJob(s"job-$i", Map("status" -> "success"), 1.0)
      }
      assert(ledger.listJobs().count() == 3L)
      ledger.compact(parts = 1)
      assert(ledger.listJobs().count() == 3L)
      assert(ledger.listJobs(status = Some("SUCCESS")).count() == 3L)
    }
  }

  // Registered last: by the time this runs the mockfs fixtures above have
  // written through parquet commit, appendDedup, archive, and compaction —
  // the counter proves those paths really crossed the non-atomic-rename FS
  // (a zero here would mean the emulation silently fell back to file://).
  test("mockfs commit paths exercised the non-atomic rename") {
    assert(FakeObjectStoreFileSystem.renames.get() > 0)
  }
}
