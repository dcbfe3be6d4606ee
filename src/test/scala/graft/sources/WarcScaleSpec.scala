package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import graft.{MetricsProbe, SparkSpec}

/** MEASURES the WARC layout's cost model (the Common-Crawl-scale story
  * the WarcShards scaladoc claims), the TarScaleSpec discipline:
  *  - pack shuffles each payload byte exactly once (the shard-keyed
  *    exchange is the minimum movement a sharded export permits);
  *  - record scan parallelism is the shard-file count — the Common
  *    Crawl unit of work — and no task reads more than one shard.
  */
class WarcScaleSpec extends SparkSpec {

  private def corpus(n: Int, nShards: Int) = {
    import spark.implicits._
    spark.range(n.toLong).as[Long].map { id =>
      WarcShards.Entry((id % nShards).toInt, id, "resource",
        s"http://e/$id", s"<urn:graft:$id>", "text/plain",
        (s"doc $id " + ("tok " * (id % 37).toInt)).getBytes(UTF_8))
    }
  }

  test("pack shuffle bytes grow with payload, not worse (1x vs 8x corpus)") {
    val dir1 = tmpDir("warcscale1")
    val dir8 = tmpDir("warcscale8")
    val m1 = MetricsProbe.measure(spark)(
      WarcShards.pack(corpus(500, 4), dir1).count())
    val m8 = MetricsProbe.measure(spark)(
      WarcShards.pack(corpus(4000, 4), dir8).count())
    val ratio = m8.shuffleWriteBytes.toDouble / math.max(1L, m1.shuffleWriteBytes)
    info(f"pack shuffle: 1x ${m1.shuffleWriteBytes}%d B, 8x ${m8.shuffleWriteBytes}%d B (${ratio}%.2f x)")
    assert(ratio > 4.0 && ratio < 12.0,
      f"pack shuffle grew $ratio%.2f x on an 8x corpus — expected ~8x (payload-proportional)")
  }

  test("record scan parallelism equals the shard-file count; no task reads two shards") {
    val dir = tmpDir("warcscale-scan")
    val nShards = 8
    WarcShards.pack(corpus(2000, nShards), dir).count()
    val oldMax = spark.conf.get("spark.sql.files.maxPartitionBytes")
    val oldCost = spark.conf.get("spark.sql.files.openCostInBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "65536")
      spark.conf.set("spark.sql.files.openCostInBytes", "0")
      val records = WarcShards.readRecords(spark, dir)
      assert(records.rdd.getNumPartitions == nShards,
        s"expected $nShards scan partitions, got ${records.rdd.getNumPartitions}")
      val shardBytes = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
        .toArray.map(p => java.nio.file.Files.size(p.asInstanceOf[java.nio.file.Path])).max
      val m = MetricsProbe.measure(spark)(records.count())
      info(s"scan peak task input ${m.peakTaskInputBytes} B vs max shard $shardBytes B")
      assert(m.peakTaskInputBytes <= shardBytes * 2,
        s"one scan task read ${m.peakTaskInputBytes} B — more than one shard's bytes")
    } finally {
      spark.conf.set("spark.sql.files.maxPartitionBytes", oldMax)
      spark.conf.set("spark.sql.files.openCostInBytes", oldCost)
    }
  }
}
