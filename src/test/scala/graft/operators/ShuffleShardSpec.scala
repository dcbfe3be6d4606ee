package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ShuffleShardSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")

  test("output is a permutation: every id once, positions 1..|shard| per shard") {
    val out = ShuffleShard.assign(docs, "doc_id", nShards = 10)
    assert(out.count() == docs.count())
    assert(out.select("id").distinct().count() == docs.count())
    val bad = out.groupBy("shard")
      .agg(count(lit(1)).as("n"), min(col("pos")).as("lo"), max(col("pos")).as("hi"))
      .filter(col("lo") =!= 1L || col("hi") =!= col("n"))
      .count()
    assert(bad == 0L)
  }

  test("assignment is invariant to input partitioning") {
    val a = ShuffleShard.assign(docs, "doc_id", 10)
    val b = ShuffleShard.assign(docs.repartition(17), "doc_id", 10)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("md5 keying balances shards without salting") {
    val sizes = ShuffleShard.assign(docs, "doc_id", 10)
      .groupBy("shard").count().collect().map(_.getLong(1))
    assert(sizes.length == 10)
    val mean = sizes.sum.toDouble / sizes.length
    assert(sizes.forall(n => n > mean * 0.5 && n < mean * 2.0),
      s"unbalanced shards: ${sizes.mkString(",")}")
  }

  test("sharded export writes one directory per shard and loses nothing") {
    val dir = java.nio.file.Files.createTempDirectory("graft-shard-spec").toFile
    try {
      val out = s"${dir.getAbsolutePath}/shards"
      ShuffleShard.assign(docs, "doc_id", nShards = 10)
        .write.mode("overwrite").partitionBy("shard").parquet(out)
      val shardDirs = new java.io.File(out).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("shard=")).map(_.getName).sorted
      assert(shardDirs.toSeq == (0 to 9).map(i => s"shard=$i").sorted)
      assert(spark.read.parquet(out).count() == docs.count())
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(dir)
    }
  }

  test("plan: one shard-keyed exchange, per-shard (never global) sort") {
    val p = ShuffleShard.assign(docs, "doc_id", 10)
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(p).size == 1, p)
    assert(p.contains("hashpartitioning(shard"), p)
    assert(!p.contains("rangepartitioning"), p)
  }

  test("hexLong generalizes hex4 exactly and decodes full-width hex") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq("00000000", "ffffffff", "0123abcd", "deadbeef").toDF("h")
      .select(col("h"),
        ShuffleShard.hexLong(col("h"), 4).as("l4"),
        ShuffleShard.hexLong(col("h"), 8).as("l8"))
    df.collect().foreach { r =>
      val h = r.getString(0)
      assert(r.getLong(1) == java.lang.Long.parseLong(h.take(4), 16), h)
      assert(r.getLong(2) == java.lang.Long.parseLong(h, 16), h)
    }
    // q182's fingerprint width: 8 hex digits reach 2^32 − 1 without
    // int overflow in the column arithmetic.
    assert(df.filter(col("h") === "ffffffff").head.getLong(2) == 4294967295L)
  }
}
