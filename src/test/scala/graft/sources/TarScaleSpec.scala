package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.functions._

import graft.{MetricsProbe, SparkSpec}

/** MEASURES the tar shard layout's cost model (the 100 TB export/scan
  * story the TarShards scaladoc claims):
  *  - pack shuffles each payload byte exactly once (the shard-keyed
  *    exchange IS the minimum data movement a sharded export permits):
  *    shuffle-write bytes grow ∝ payload, with framing overhead bounded;
  *  - scan parallelism is the shard count — each shard is one task's
  *    unit of work, so a 200k-shard corpus fans out 200k-wide;
  *  - no single scan task reads more than one shard's bytes (hot-task
  *    gate: a skew here would serialize the scan at scale).
  */
class TarScaleSpec extends SparkSpec {

  private def corpus(n: Int, nShards: Int) = {
    import spark.implicits._
    spark.range(n.toLong).as[Long].map { id =>
      TarShards.Member((id % nShards).toInt, f"$id%010d.txt",
        (s"doc $id " + ("tok " * (id % 37).toInt)).getBytes(UTF_8))
    }
  }

  test("pack shuffle bytes grow with payload, not worse (1x vs 8x corpus)") {
    val dir1 = tmpDir("tarscale1")
    val dir8 = tmpDir("tarscale8")
    val m1 = MetricsProbe.measure(spark)(
      TarShards.pack(corpus(500, 4), dir1).count())
    val m8 = MetricsProbe.measure(spark)(
      TarShards.pack(corpus(4000, 4), dir8).count())
    val ratio = m8.shuffleWriteBytes.toDouble / math.max(1L, m1.shuffleWriteBytes)
    info(f"pack shuffle: 1x ${m1.shuffleWriteBytes}%d B, 8x ${m8.shuffleWriteBytes}%d B (${ratio}%.2f x)")
    // payload grows 8x (plus the per-member name/framing constant); the
    // gate catches a super-linear term (a second shuffle of the corpus,
    // an accidental sort fan-out), not serialization constants
    assert(ratio > 4.0 && ratio < 12.0,
      f"pack shuffle grew $ratio%.2f x on an 8x corpus — expected ~8x (payload-proportional)")
  }

  test("scan parallelism equals the shard count; no task reads two shards") {
    val dir = tmpDir("tarscale-scan")
    val nShards = 8
    TarShards.pack(corpus(2000, nShards), dir).count()
    // Production shards are row-group-sized (≫ openCostInBytes), so each
    // lands in its own FilePartition; these test shards are a few hundred
    // KB, which the bin-packer would coalesce — pin the file-split confs
    // to production-equivalent ratios for the duration of the assertion.
    val oldMax = spark.conf.get("spark.sql.files.maxPartitionBytes")
    val oldCost = spark.conf.get("spark.sql.files.openCostInBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "65536")
      spark.conf.set("spark.sql.files.openCostInBytes", "0")
      val members = TarShards.readMembers(spark, dir)
      // one binaryFile row (= one shard) per partition → per-task work is
      // one shard, the unit that makes a 200k-shard corpus 200k-wide
      assert(members.rdd.getNumPartitions == nShards,
        s"expected $nShards scan partitions, got ${members.rdd.getNumPartitions}")
      val shardBytes = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
        .toArray.map(p => java.nio.file.Files.size(p.asInstanceOf[java.nio.file.Path])).max
      val m = MetricsProbe.measure(spark)(members.count())
      info(s"scan peak task input ${m.peakTaskInputBytes} B vs max shard $shardBytes B")
      assert(m.peakTaskInputBytes <= shardBytes * 2,
        s"one scan task read ${m.peakTaskInputBytes} B — more than one shard's bytes")
    } finally {
      spark.conf.set("spark.sql.files.maxPartitionBytes", oldMax)
      spark.conf.set("spark.sql.files.openCostInBytes", oldCost)
    }
  }
}
