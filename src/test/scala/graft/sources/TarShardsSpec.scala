package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8

import graft.SparkSpec
import graft.sources.TarShards.TarCodec

class TarShardsSpec extends SparkSpec {

  private def roundTrip(members: Seq[(String, Array[Byte])]): Seq[(String, Array[Byte])] = {
    val out = new ByteArrayOutputStream()
    members.foreach { case (n, b) => TarCodec.writeMember(out, n, b) }
    TarCodec.writeTrailer(out)
    TarCodec.parse(out.toByteArray).toSeq
  }

  test("codec round-trips members across every padding boundary") {
    // 0, 1, 511, 512, 513 bytes: empty member, sub-block, exact-block ± 1.
    val sizes = Seq(0, 1, 511, 512, 513, 2048, 3000)
    val members = sizes.map { n =>
      (s"m$n.bin", Array.tabulate[Byte](n)(i => ((i * 31 + n) % 251).toByte))
    }
    val back = roundTrip(members)
    assert(back.map(_._1) == members.map(_._1))
    members.zip(back).foreach { case ((_, a), (_, b)) =>
      assert(java.util.Arrays.equals(a, b))
    }
  }

  test("archive bytes are deterministic (mtime/uid/gid pinned)") {
    def bytes(): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      TarCodec.writeMember(out, "a.txt", "hello".getBytes(UTF_8))
      TarCodec.writeTrailer(out)
      out.toByteArray
    }
    assert(java.util.Arrays.equals(bytes(), bytes()))
    // header + 1 data block + 2 trailer blocks
    assert(bytes().length == 4 * 512)
  }

  test("parse rejects a corrupted checksum") {
    val out = new ByteArrayOutputStream()
    TarCodec.writeMember(out, "a.txt", "payload".getBytes(UTF_8))
    TarCodec.writeTrailer(out)
    val a = out.toByteArray
    a(0) = 'b'.toByte // name change invalidates the stored checksum
    val e = intercept[IllegalArgumentException](TarCodec.parse(a).toSeq)
    assert(e.getMessage.contains("checksum"))
  }

  test("parse rejects bad magic and truncated members") {
    val out = new ByteArrayOutputStream()
    TarCodec.writeMember(out, "a.txt", "payload".getBytes(UTF_8))
    TarCodec.writeTrailer(out)
    val bad = out.toByteArray.clone()
    bad(257) = 'X'.toByte
    assert(intercept[IllegalArgumentException](TarCodec.parse(bad).toSeq)
      .getMessage.contains("magic"))
    // cut inside the data block: member claims 7 bytes, archive ends first
    val cut = java.util.Arrays.copyOfRange(out.toByteArray, 0, 512 + 3)
    assert(intercept[IllegalArgumentException](TarCodec.parse(cut).toSeq)
      .getMessage.contains("truncated"))
  }

  test("parse skips non-file members and tolerates extra zero padding") {
    val out = new ByteArrayOutputStream()
    // a directory member (typeflag '5', size 0), hand-built via header
    val dir = TarCodec.header("d/", 0)
    dir(156) = '5'
    // recompute checksum after the typeflag edit
    java.util.Arrays.fill(dir, 148, 156, ' '.toByte)
    var sum = 0L
    dir.foreach(b => sum += (b & 0xff))
    val oct = java.lang.Long.toOctalString(sum)
    val padded = ("0" * (6 - oct.length)) + oct
    System.arraycopy(padded.getBytes(UTF_8), 0, dir, 148, 6)
    dir(154) = 0; dir(155) = ' '.toByte
    out.write(dir)
    TarCodec.writeMember(out, "f.txt", "x".getBytes(UTF_8))
    TarCodec.writeTrailer(out)
    out.write(new Array[Byte](512 * 3)) // blocking-factor padding
    val back = TarCodec.parse(out.toByteArray).toSeq
    assert(back.map(_._1) == Seq("f.txt"))
  }

  test("foreign archives: ustar prefix field and GNU 'L' long names parse correctly") {
    def withChecksum(h: Array[Byte]): Array[Byte] = {
      java.util.Arrays.fill(h, 148, 156, ' '.toByte)
      var sum = 0L
      h.foreach(b => sum += (b & 0xff))
      val oct = java.lang.Long.toOctalString(sum)
      System.arraycopy((("0" * (6 - oct.length)) + oct).getBytes(UTF_8), 0, h, 148, 6)
      h(154) = 0; h(155) = ' '.toByte
      h
    }
    val out = new ByteArrayOutputStream()
    // member with a prefix-split path (dir part at offset 345)
    val pref = TarCodec.header("leaf.txt", 2)
    System.arraycopy("some/deep/dir".getBytes(UTF_8), 0, pref, 345, 13)
    out.write(withChecksum(pref))
    out.write("hi".getBytes(UTF_8)); out.write(new Array[Byte](510))
    // GNU long-name entry ('L'): data names the NEXT member
    val longName = ("x" * 120) + ".bin"
    val l = TarCodec.header("././@LongLink", longName.length.toLong)
    l(156) = 'L'.toByte
    out.write(withChecksum(l))
    out.write(longName.getBytes(UTF_8))
    out.write(new Array[Byte](512 - longName.length % 512))
    TarCodec.writeMember(out, "placeholder", "payload".getBytes(UTF_8))
    TarCodec.writeTrailer(out)
    val back = TarCodec.parse(out.toByteArray).toSeq
    assert(back.map(_._1) == Seq("some/deep/dir/leaf.txt", longName))
    assert(new String(back(1)._2, UTF_8) == "payload")
  }

  test("member names longer than the ustar field are rejected at write") {
    val out = new ByteArrayOutputStream()
    val long = "x" * 101
    assertThrows[IllegalArgumentException](
      TarCodec.writeMember(out, long, Array.emptyByteArray))
  }

  test("pack/readMembers round-trip with sorted member order and manifest totals") {
    import spark.implicits._
    val dir = tmpDir("tarshards")
    val members = spark.createDataset(Seq(
      TarShards.Member(0, "000b.txt", "beta".getBytes(UTF_8)),
      TarShards.Member(0, "000a.txt", "alpha".getBytes(UTF_8)),
      TarShards.Member(1, "000c.txt", "gamma!".getBytes(UTF_8))
    ))
    val manifest = TarShards.pack(members, dir).orderBy("shard").collect()
    assert(manifest.map(r => (r.getInt(0), r.getLong(2), r.getLong(3))).toSeq ==
      Seq((0, 2L, 9L), (1, 1L, 6L)))
    val back = TarShards.readMembers(spark, dir)
      .orderBy("name")
      .as[(String, String, Array[Byte])]
      .collect()
    assert(back.map(_._2).toSeq == Seq("000a.txt", "000b.txt", "000c.txt"))
    assert(back.map(m => new String(m._3, UTF_8)).toSeq ==
      Seq("alpha", "beta", "gamma!"))
    assert(back.map(_._1).toSeq == Seq("shard-00000.tar", "shard-00000.tar", "shard-00001.tar"))
    // within-shard order on disk is name order, independent of input order
    val raw = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "shard-00000.tar"))
    assert(TarCodec.parse(raw).map(_._1).toSeq == Seq("000a.txt", "000b.txt"))
  }

  test("resume skips complete shards (header-only stats) and rebuilds missing ones") {
    import spark.implicits._
    val dir = tmpDir("tarresume")
    val members = spark.createDataset(Seq(
      TarShards.Member(0, "a.txt", "alpha".getBytes(UTF_8)),
      TarShards.Member(0, "b.txt", "bb".getBytes(UTF_8)),
      TarShards.Member(1, "c.txt", "gamma!".getBytes(UTF_8))
    ))
    TarShards.pack(members, dir).count()
    val shard0 = java.nio.file.Paths.get(dir, "shard-00000.tar")
    val before = java.nio.file.Files.readAllBytes(shard0)
    // simulate a crashed export: shard 1 missing, a stale attempt tmp left over
    java.nio.file.Files.delete(java.nio.file.Paths.get(dir, "shard-00001.tar"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "shard-00001.tar.tmp-99"), Array[Byte](1, 2, 3))
    val manifest = TarShards.pack(members, dir, resume = true)
      .orderBy("shard").collect()
      .map(r => (r.getInt(0), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    assert(manifest.toSeq == Seq((0, 2L, 7L, true), (1, 1L, 6L, false)))
    // the skipped shard's bytes are untouched; no tmp files survive
    assert(java.util.Arrays.equals(java.nio.file.Files.readAllBytes(shard0), before))
    // shard1's rebuild commits its attempt tmp and reaps the stale one
    assert(!new java.io.File(dir).list().exists(_.contains(".tmp")))
    val back = TarShards.readMembers(spark, dir).orderBy("name")
      .as[(String, String, Array[Byte])].collect()
    assert(back.map(_._2).toSeq == Seq("a.txt", "b.txt", "c.txt"))
  }

  test("a stale shard from a DIFFERENT export is rejected, not adopted") {
    // regression (ADVICE r11): a pre-existing final file is adopted as a
    // prior commit of THIS export only when its member count matches
    // what this export would write; a foreign shard must fail loudly
    // instead of shipping a manifest row describing someone else's bytes
    import spark.implicits._
    val dir = tmpDir("tarstale")
    // "different export": shard 0 written with ONE member
    TarShards.pack(spark.createDataset(Seq(
      TarShards.Member(0, "old.txt", "old".getBytes(UTF_8)))), dir).count()
    // this export's shard 0 has TWO members → resume must reject
    val members = spark.createDataset(Seq(
      TarShards.Member(0, "a.txt", "alpha".getBytes(UTF_8)),
      TarShards.Member(0, "b.txt", "bb".getBytes(UTF_8))))
    val e = intercept[org.apache.spark.SparkException] {
      TarShards.pack(members, dir, resume = true).count()
    }
    assert(e.getMessage.contains("stale shard") ||
      Option(e.getCause).exists(_.getMessage.contains("stale shard")))
    // matching count → adopted cleanly (the legitimate resume/retry path)
    val again = TarShards.pack(spark.createDataset(Seq(
      TarShards.Member(0, "old.txt", "old".getBytes(UTF_8)))), dir, resume = true)
      .collect()
    assert(again.map(r => (r.getInt(0), r.getLong(2), r.getBoolean(4))).toSeq ==
      Seq((0, 1L, true)))
  }

  test("scanStats matches the true member count and payload across block edges") {
    val out = new ByteArrayOutputStream()
    val sizes = Seq(0, 1, 511, 512, 513)
    sizes.zipWithIndex.foreach { case (n, i) =>
      TarCodec.writeMember(out, s"m$i.bin", new Array[Byte](n))
    }
    TarCodec.writeTrailer(out)
    val (n, payload) = TarCodec.scanStats(
      new java.io.ByteArrayInputStream(out.toByteArray))
    assert(n == sizes.length && payload == sizes.map(_.toLong).sum)
  }

  test("samples groups multi-component keys; missing components stay absent") {
    import spark.implicits._
    val dir = tmpDir("tarwds")
    val members = spark.createDataset(Seq(
      TarShards.Member(0, "k1.txt", "t1".getBytes(UTF_8)),
      TarShards.Member(0, "k1.cls", "c1".getBytes(UTF_8)),
      TarShards.Member(0, "k2.txt", "t2".getBytes(UTF_8))
    ))
    TarShards.pack(members, dir).count()
    val rows = TarShards.samples(TarShards.readMembers(spark, dir))
      .selectExpr("key", "map_keys(components) AS exts",
        "cast(element_at(components, 'txt') as string) AS txt")
      .orderBy("key")
      .as[(String, Seq[String], String)]
      .collect()
    assert(rows.toSeq == Seq(
      ("k1", Seq("cls", "txt"), "t1"),
      ("k2", Seq("txt"), "t2")))
  }
}
