package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec

class TxTableSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("txtable").resolve("t").toString

  private def rows(dir: String): Map[Long, String] =
    TxTable.read(spark, dir).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[String]("v")).toMap

  test("init + merge: matched rows replaced, new rows inserted, version bumps") {
    val dir = freshDir()
    TxTable.init(spark, dir, Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"))
    assert(TxTable.currentVersion(spark, dir) == 1L)

    val stats = TxTable.merge(spark, dir,
      Seq((2L, "B!"), (4L, "d")).toDF("id", "v"), Seq("id"))
    assert(stats == TxTable.MergeStats(version = 2L, updated = 1L, inserted = 1L, total = 4L))
    assert(rows(dir) == Map(1L -> "a", 2L -> "B!", 3L -> "c", 4L -> "d"))
  }

  test("time travel reads any committed version; history records operations") {
    val dir = freshDir()
    TxTable.init(spark, dir, Seq((1L, "a")).toDF("id", "v"))
    TxTable.merge(spark, dir, Seq((1L, "a2")).toDF("id", "v"), Seq("id"))
    TxTable.merge(spark, dir, Seq((2L, "b")).toDF("id", "v"), Seq("id"))

    assert(TxTable.readVersion(spark, dir, 1).collect().map(_.getString(1)).toSeq == Seq("a"))
    assert(TxTable.readVersion(spark, dir, 2).collect().map(_.getString(1)).toSet == Set("a2"))
    assert(rows(dir) == Map(1L -> "a2", 2L -> "b"))
    assert(TxTable.history(spark, dir).map(_.operation) == Seq("init", "merge", "merge"))
  }

  test("duplicate keys in updates are rejected") {
    val dir = freshDir()
    TxTable.init(spark, dir, Seq((1L, "a")).toDF("id", "v"))
    intercept[IllegalArgumentException] {
      TxTable.merge(spark, dir, Seq((2L, "x"), (2L, "y")).toDF("id", "v"), Seq("id"))
    }
  }

  test("schema evolution: new columns appear, absent columns survive on matched rows") {
    val dir = freshDir()
    TxTable.init(spark, dir, Seq((1L, "a", 10), (2L, "b", 20)).toDF("id", "v", "score"))
    // updates lack `score` (preserved) and bring `tag` (new)
    val stats = TxTable.merge(spark, dir,
      Seq((2L, "B!", "hot"), (3L, "c", "new")).toDF("id", "v", "tag"),
      Seq("id"), allowSchemaEvolution = true)
    assert(stats.updated == 1L && stats.inserted == 1L && stats.total == 3L)
    val got = TxTable.read(spark, dir).collect().map { r =>
      r.getAs[Long]("id") ->
        ((r.getAs[String]("v"), Option(r.get(r.fieldIndex("score"))),
          Option(r.getAs[String]("tag"))))
    }.toMap
    assert(got(1L) == (("a", Some(10), None)))       // untouched: null tag
    assert(got(2L) == (("B!", Some(20), Some("hot")))) // score preserved
    assert(got(3L) == (("c", None, Some("new"))))    // insert: null score
    // without the flag, mismatched schemas still refuse
    intercept[IllegalArgumentException] {
      TxTable.merge(spark, dir, Seq((4L, "d")).toDF("id", "v"), Seq("id"))
    }
  }

  test("delete removes matching rows transactionally") {
    val dir = freshDir()
    TxTable.init(spark, dir, Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"))
    val remaining = TxTable.delete(spark, dir, "id >= 2")
    assert(remaining == 1L)
    assert(rows(dir) == Map(1L -> "a"))
    assert(TxTable.currentVersion(spark, dir) == 2L)
  }

  test("a stolen commit slot forces retry against the new base (optimistic concurrency)") {
    val dir = freshDir()
    TxTable.init(spark, dir, Seq((1L, "a")).toDF("id", "v"))
    // Simulate a concurrent writer claiming version 2 mid-merge by
    // pre-committing it: our merge must lose the race for v2, re-read,
    // and land as v3 on top of the interloper's state.
    val interloper = Seq((9L, "z")).toDF("id", "v")
    TxTable.merge(spark, dir, interloper, Seq("id")) // v2
    val stats = TxTable.merge(spark, dir, Seq((1L, "a2")).toDF("id", "v"), Seq("id"))
    assert(stats.version == 3L)
    assert(rows(dir) == Map(1L -> "a2", 9L -> "z"))
  }

  test("an uncommitted snapshot directory is invisible to readers (crash safety)") {
    val dir = freshDir()
    TxTable.init(spark, dir, Seq((1L, "a")).toDF("id", "v"))
    // Crash between data write and commit: a data dir with no commit file.
    Seq((666L, "junk")).toDF("id", "v").write
      .parquet(new Path(dir, "v-2-deadbeef").toString)
    assert(TxTable.currentVersion(spark, dir) == 1L)
    assert(rows(dir) == Map(1L -> "a"))
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // Within the grace window the orphan is indistinguishable from a
    // concurrent writer's in-flight snapshot — vacuum must leave it.
    TxTable.vacuum(spark, dir, keep = 2)
    assert(fs.exists(new Path(dir, "v-2-deadbeef")))
    // With no writers possible (grace 0) it is reclaimed.
    TxTable.vacuum(spark, dir, keep = 2, graceMs = 0L)
    assert(!fs.exists(new Path(dir, "v-2-deadbeef")))
    assert(rows(dir) == Map(1L -> "a"))
  }

  test("streaming mergeSink upserts each micro-batch; replayed batches are idempotent") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = freshDir()
    val input = MemoryStream[(Long, String, Long)]
    val sink = TxTable.mergeSink(dir, Seq("id"), orderBy = Some("seq"))
    val q = input.toDF().toDF("id", "v", "seq")
      .writeStream.foreachBatch(sink).start()
    try {
      input.addData((1L, "a", 1L), (2L, "b", 1L))
      q.processAllAvailable()
      assert(rows(dir) == Map(1L -> "a", 2L -> "b"))

      // one batch, conflicting rows for id=2: largest seq wins
      input.addData((2L, "stale", 2L), (2L, "fresh", 3L), (3L, "c", 2L))
      q.processAllAvailable()
      assert(rows(dir) == Map(1L -> "a", 2L -> "fresh", 3L -> "c"))
    } finally q.stop()

    // replay: re-merging the same rows is a content no-op (state stays
    // identical) even though it commits a new version
    val replay = Seq((2L, "fresh", 3L), (3L, "c", 2L)).toDF("id", "v", "seq")
    TxTable.merge(spark, dir, replay.select(col("id"), col("v"), col("seq")), Seq("id"))
    assert(rows(dir) == Map(1L -> "a", 2L -> "fresh", 3L -> "c"))
  }

  test("vacuum keeps the newest versions readable and drops older data dirs") {
    val dir = freshDir()
    TxTable.init(spark, dir, Seq((1L, "a")).toDF("id", "v"))
    (2 to 4).foreach(i => TxTable.merge(spark, dir,
      Seq((i.toLong, s"v$i")).toDF("id", "v"), Seq("id")))
    TxTable.vacuum(spark, dir, keep = 2)
    assert(rows(dir).keySet == Set(1L, 2L, 3L, 4L))        // latest intact
    assert(TxTable.readVersion(spark, dir, 3).count() == 3) // kept
    intercept[TxTable.VacuumedVersionException] { TxTable.readVersion(spark, dir, 1).count() } // vacuumed: typed signal
    assert(TxTable.history(spark, dir).length == 4)         // log retained
  }

  test("compact rewrites the snapshot into fewer files with identical content") {
    val dir = freshDir()
    // 8-file initial version = the small-file shape trickle ingest leaves
    TxTable.init(spark, dir,
      (1L to 64L).map(i => (i, s"v$i")).toDF("id", "v").repartition(8))
    TxTable.merge(spark, dir, Seq((65L, "v65")).toDF("id", "v"), Seq("id"))
    val before = rows(dir)
    val baseVersion = TxTable.currentVersion(spark, dir)

    def fileCount(): Int = {
      val dataDir = TxTable.history(spark, dir).last.dataDir
      new java.io.File(dir, dataDir).listFiles()
        .count(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    }
    assert(fileCount() > 1)

    TxTable.compact(spark, dir, numFiles = 1)
    assert(TxTable.currentVersion(spark, dir) == baseVersion + 1)
    assert(TxTable.history(spark, dir).last.operation == "compact")
    assert(fileCount() == 1)
    assert(rows(dir) == before)                         // content identical
    assert(TxTable.readVersion(spark, dir, baseVersion).count() == 65) // time travel intact

    // Z-ordered compaction: same content, clustered layout
    TxTable.compact(spark, dir, numFiles = 2, zOrderBy = Seq("id"))
    assert(rows(dir) == before)
    intercept[IllegalArgumentException] { TxTable.compact(spark, dir, numFiles = 0) }
  }

  test("changes classifies insert/update/delete/unchanged between versions") {
    val dir = freshDir()
    TxTable.init(spark, dir,
      Seq((1L, "a"), (2L, "b"), (3L, null: String)).toDF("id", "v"))           // v1
    TxTable.merge(spark, dir,
      Seq((2L, "B!"), (4L, "d")).toDF("id", "v"), Seq("id"))                   // v2
    TxTable.delete(spark, dir, "id = 1")                                       // v3

    val feed = TxTable.changes(spark, dir, 1L, 3L, Seq("id")).collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[String]("change_type"), r.getAs[String]("v"))).toMap
    assert(feed == Map(
      1L -> ("delete", "a"),      // pre image for deletes
      2L -> ("update", "B!"),     // post image
      3L -> ("unchanged", null),  // null value compares null-safe, not as a change
      4L -> ("insert", "d")))

    // identical versions: everything unchanged
    val self = TxTable.changes(spark, dir, 3L, 3L, Seq("id")).collect()
    assert(self.forall(_.getAs[String]("change_type") == "unchanged"))

    // feed across a schema-evolution boundary is refused by default, not guessed
    TxTable.merge(spark, dir, Seq((5L, "e", 9L)).toDF("id", "v", "extra"),
      Seq("id"), allowSchemaEvolution = true)                                  // v4
    val e = intercept[IllegalArgumentException] {
      TxTable.changes(spark, dir, 1L, 4L, Seq("id"))
    }
    assert(e.getMessage.contains("schema change"))
  }

  test("changes across schema evolution reads at the post schema (Delta CDF contract)") {
    val dir = freshDir()
    TxTable.init(spark, dir,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"))                    // v1
    TxTable.merge(spark, dir,
      Seq((2L, "B!", 7L), (5L, "e", 9L)).toDF("id", "v", "extra"),
      Seq("id"), allowSchemaEvolution = true)                                  // v2
    TxTable.delete(spark, dir, "id = 3")                                       // v3

    val feed = TxTable.changes(spark, dir, 1L, 3L, Seq("id"),
      allowSchemaEvolution = true).collect()
      .map(r => r.getAs[Long]("id") ->
        ((r.getAs[String]("change_type"), r.getAs[String]("v"),
          Option(r.getAs[java.lang.Long]("extra"))))).toMap
    assert(feed == Map(
      1L -> (("unchanged", "a", None)),  // pre null-fills extra; both null → no change
      2L -> (("update", "B!", Some(7L))),
      3L -> (("delete", "c", None)),     // pre image at the read schema
      5L -> (("insert", "e", Some(9L)))))

    // feed keyed on a column one side lacks has no join identity
    val e = intercept[IllegalArgumentException] {
      TxTable.changes(spark, dir, 1L, 3L, Seq("extra"), allowSchemaEvolution = true)
    }
    assert(e.getMessage.contains("must exist in both"))
  }

  test("vacuum(keep = 0) is rejected; keep = 1 leaves the table readable") {
    val dir = freshDir()
    TxTable.init(spark, dir, Seq((1L, "a")).toDF("id", "v"))
    TxTable.merge(spark, dir, Seq((2L, "b")).toDF("id", "v"), Seq("id"))
    // keep = 0 would delete the CURRENT version's data dir out from under
    // the commit log (ADVICE r3) — must fail loudly, not brick the table.
    intercept[IllegalArgumentException] { TxTable.vacuum(spark, dir, keep = 0) }
    assert(rows(dir) == Map(1L -> "a", 2L -> "b")) // untouched
    TxTable.vacuum(spark, dir, keep = 1, graceMs = 0L)
    assert(rows(dir) == Map(1L -> "a", 2L -> "b")) // current version survives
  }
}
