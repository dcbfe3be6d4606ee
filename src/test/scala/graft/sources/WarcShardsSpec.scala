package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

import graft.SparkSpec
import graft.sources.WarcShards.{Entry, WarcCodec}

class WarcShardsSpec extends SparkSpec {
  import spark.implicits._

  private def rec(warcType: String, id: String, uri: String,
      payload: String): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    WarcCodec.writeRecord(out, warcType, id, uri, "text/plain",
      payload.getBytes(StandardCharsets.UTF_8))
    out.toByteArray
  }

  test("codec round trip: write two records, parse them back byte-exact") {
    val bytes = rec("response", "<urn:1>", "http://e/1", "hello world") ++
      rec("metadata", "<urn:2>", "", "second payload")
    val rs = WarcCodec.parse(bytes).toList
    assert(rs.map(_.warcType) == List("response", "metadata"))
    assert(rs.map(_.recordId) == List("<urn:1>", "<urn:2>"))
    assert(rs.head.targetUri == "http://e/1")
    assert(rs(1).targetUri == "")
    assert(rs.map(r => new String(r.payload, StandardCharsets.UTF_8)) ==
      List("hello world", "second payload"))
  }

  test("per-record gzip: concatenated members parse transparently") {
    val out = new ByteArrayOutputStream()
    for (i <- 1 to 3) {
      val gz = new java.util.zip.GZIPOutputStream(out)
      WarcCodec.writeRecord(gz, "resource", s"<urn:$i>", "", "text/plain",
        s"payload number $i".getBytes(StandardCharsets.UTF_8))
      gz.finish()
    }
    val rs = WarcCodec.parse(out.toByteArray).toList
    assert(rs.map(r => new String(r.payload, StandardCharsets.UTF_8)) ==
      (1 to 3).map(i => s"payload number $i").toList)
  }

  test("strict parse: bad magic, missing length, truncation, bomb cap") {
    val bad = "HTTP/1.1 200\r\n\r\n".getBytes(StandardCharsets.US_ASCII)
    val e1 = intercept[IllegalArgumentException](WarcCodec.parse(bad).toList)
    assert(e1.getMessage.contains("not a WARC record"))

    val noLen = "WARC/1.0\r\nWARC-Type: x\r\n\r\n".getBytes(StandardCharsets.US_ASCII)
    val e2 = intercept[IllegalArgumentException](WarcCodec.parse(noLen).toList)
    assert(e2.getMessage.contains("Content-Length"))

    val full = rec("response", "<urn:1>", "", "hello world")
    val e3 = intercept[IllegalArgumentException](
      WarcCodec.parse(full.dropRight(20)).toList)
    assert(e3.getMessage.contains("truncated"))

    val e4 = intercept[IllegalArgumentException](
      WarcCodec.parse(full, maxRecordBytes = 4L).toList)
    assert(e4.getMessage.contains("cap"))
  }

  test("http envelope parse: status + body; non-http payload is None") {
    val body = "<html>x</html>".getBytes(StandardCharsets.UTF_8)
    val payload = WarcCodec.httpResponse(body, "text/html")
    val Some((status, b)) = WarcCodec.parseHttp(payload)
    assert(status == 200)
    assert(java.util.Arrays.equals(b, body))
    assert(WarcCodec.parseHttp("no http here".getBytes).isEmpty)
  }

  test("envelope surfaces Retry-After, X-Robots-Tag and a non-gzip " +
      "Content-Encoding (body left compressed)") {
    val body = "<html>x</html>".getBytes(StandardCharsets.UTF_8)
    val Some(env) = WarcCodec.parseHttpEnvelope(WarcCodec.httpResponse(
      body, "text/html",
      Seq("Retry-After" -> "120", "X-Robots-Tag" -> "NoIndex, nofollow")))
    assert(env.retryAfter == "120" && env.xRobotsTag == "noindex, nofollow",
      s"retryAfter=${env.retryAfter} xrt=${env.xRobotsTag}")
    assert(env.contentEncoding == "", "absent encoding must surface empty")
    // gzip is inflated and the surfaced encoding CLEARS; br survives
    // verbatim with the body untouched (no JDK brotli codec — the
    // crawl loop fences on the token)
    val Some(gz) = WarcCodec.parseHttpEnvelope(
      WarcCodec.httpResponseGzip(body, "text/html"))
    assert(gz.contentEncoding == "" && java.util.Arrays.equals(gz.body, body))
    val wire = Array.fill[Byte](9)(66)
    val h = ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
      s"Content-Encoding: BR\r\nContent-Length: ${wire.length}\r\n\r\n")
      .getBytes(StandardCharsets.UTF_8)
    val Some(br) = WarcCodec.parseHttpEnvelope(h ++ wire)
    assert(br.contentEncoding == "br" && java.util.Arrays.equals(br.body, wire),
      s"br: enc=${br.contentEncoding} bodyLen=${br.body.length}")
  }

  test("chunked and gzip bodies decode to the same entity bytes") {
    val body = ("x" * 950 + " tail").getBytes(StandardCharsets.UTF_8)
    val Some((s1, b1)) = WarcCodec.parseHttp(
      WarcCodec.httpResponseChunked(body, "text/html", chunkSize = 100))
    assert(s1 == 200 && java.util.Arrays.equals(b1, body))
    val Some((s2, b2)) = WarcCodec.parseHttp(
      WarcCodec.httpResponseGzip(body, "text/html"))
    assert(s2 == 200 && java.util.Arrays.equals(b2, body))
    // bomb cap applies to the INFLATED size
    val e = intercept[IllegalArgumentException](WarcCodec.parseHttp(
      WarcCodec.httpResponseGzip(("y" * 100000).getBytes, "text/html"),
      maxBodyBytes = 1000L))
    assert(e.getMessage.contains("cap"))
    // malformed chunk framing fails loudly, not silently
    val bad = WarcCodec.httpResponseChunked(body, "text/html", chunkSize = 100)
    bad(bad.length - 3) = 'X' // corrupt the terminating 0-chunk CRLF
    intercept[IllegalArgumentException](WarcCodec.parseHttp(bad))
  }

  test("pack + readRecords round trip across plain and gzip shards") {
    val dir = tmpDir("warc-rt")
    val entries = (0L until 20L).map { i =>
      Entry((i % 4).toInt, i, "response", s"http://e/doc/$i", s"<urn:graft:$i>",
        "application/http;msgtype=response",
        WarcCodec.httpResponse(s"body text $i".getBytes(StandardCharsets.UTF_8),
          "text/plain"))
    }
    val ds = spark.createDataset(entries)
    val m1 = WarcShards.pack(ds.filter(_.shard % 2 == 0), dir, gzip = false)
    val m2 = WarcShards.pack(ds.filter(_.shard % 2 == 1), dir, gzip = true)
    assert(m1.count() == 2 && m2.count() == 2)

    // a crashed attempt's tmp leftover must NOT enter the scan
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "shard-00099.warc.tmp-7"),
      "garbage not a warc".getBytes(StandardCharsets.UTF_8))
    val back = WarcShards.readRecords(spark, dir)
    assert(back.count() == 20)
    val rows = back.collect()
    assert(rows.forall(_.getAs[Int]("http_status") == 200))
    val texts = rows.map(r =>
      new String(r.getAs[Array[Byte]]("body"), StandardCharsets.UTF_8)).toSet
    assert(texts == (0L until 20L).map(i => s"body text $i").toSet)
    // both layouts actually on disk
    val files = new java.io.File(dir).list().toSet
    assert(files.exists(_.endsWith(".warc")) && files.exists(_.endsWith(".warc.gz")))
  }

  test("readRecords streams shards: binaryFile content column is pruned") {
    // the scale contract (r11/r12 verdicts): per-task memory is one
    // record, not the whole compressed shard — the binaryFile scan must
    // supply the file LISTING only, with `content` pruned out of
    // ReadSchema, and the task-side stream does the parsing
    val dir = tmpDir("warc-prune")
    val entries = (0L until 6L).map { i =>
      Entry(0, i, "resource", s"http://e/$i", s"<urn:$i>", "text/plain",
        s"payload $i".getBytes(StandardCharsets.UTF_8))
    }
    WarcShards.pack(spark.createDataset(entries), dir, gzip = true): Unit
    val df = WarcShards.readRecords(spark, dir)
    val scan = df.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(scan.contains("ReadSchema"), s"expected a file scan leaf:\n$scan")
    assert(!scan.contains("content"),
      s"binaryFile content column must be pruned from the scan:\n$scan")
    assert(df.count() == 6)
  }

  test("readRecordsStream: streaming scan prunes content; records equal batch") {
    // The streaming front door's scale contract (r13 verdict #1, the
    // batch gate's twin): the binaryFile SOURCE scan must list paths
    // only — `content` pruned out of the executed micro-batch's
    // ReadSchema — with each task streaming its shard file through
    // parseStream via the closure shared with readRecords.
    val dir = tmpDir("warc-stream-prune")
    val entries = (0L until 10L).map { i =>
      Entry((i % 2).toInt, i, "resource", s"http://e/$i", s"<urn:$i>",
        "text/plain", s"payload $i".getBytes(StandardCharsets.UTF_8))
    }
    val ds = spark.createDataset(entries)
    WarcShards.pack(ds.filter(_.shard == 0), dir, gzip = false): Unit
    WarcShards.pack(ds.filter(_.shard == 1), dir, gzip = true): Unit

    val sq = WarcShards.readRecordsStream(spark, dir, maxFilesPerTrigger = 1)
      .writeStream.format("memory").queryName("warc_stream_gate").start()
    try {
      sq.processAllAvailable()
      // capture the last executed micro-batch's physical plan
      val out = new ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(out, true, "UTF-8"))(sq.explain())
      val plan = out.toString("UTF-8")
      val scanLines = plan.linesIterator.filter(_.contains("ReadSchema")).mkString("\n")
      assert(scanLines.nonEmpty, s"expected a file scan with ReadSchema:\n$plan")
      assert(!scanLines.contains("content"),
        s"binaryFile content must be pruned from the streaming scan:\n$scanLines")
    } finally sq.stop()
    val got = spark.table("warc_stream_gate")
      .select("record_id", "payload_bytes").as[(String, Long)].collect().toSet
    val want = WarcShards.readRecords(spark, dir)
      .select("record_id", "payload_bytes").as[(String, Long)].collect().toSet
    assert(got.size == 10 && got == want)
  }

  test("scanStats streams headers and skips payloads: equals full parse") {
    // one multi-record stream, plain and gzip; the header-only skip path
    // (used by resume's manifest reconstruction at constant memory) must
    // agree exactly with the materializing parse
    val out = new ByteArrayOutputStream()
    (0 until 50).foreach { i =>
      WarcCodec.writeRecord(out, "response", s"<urn:$i>", s"http://e/$i",
        "text/plain", ("x" * (i * 37 % 911)).getBytes(StandardCharsets.UTF_8))
    }
    val plain = out.toByteArray
    val gzBos = new ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(gzBos)
    gz.write(plain); gz.finish()
    for (bytes <- Seq(plain, gzBos.toByteArray)) {
      val viaParse = WarcCodec.parse(bytes).map(_.payload.length.toLong).toSeq
      val (n, p) = WarcCodec.scanStats(new java.io.ByteArrayInputStream(bytes))
      assert(n == 50L && n == viaParse.size.toLong)
      assert(p == viaParse.sum)
    }
  }

  test("WARC-Concurrent-To pairs refetched URIs that URI-keying cannot") {
    // real crawls refetch the SAME URI across segments: two
    // request/response pairs share target_uri, and only the
    // Concurrent-To record-id link pairs them unambiguously
    val dir = tmpDir("warc-refetch")
    val uri = "http://example.com/page"
    val entries = Seq(0L, 1L).flatMap { fetch =>
      val body = s"fetch number $fetch".getBytes(StandardCharsets.UTF_8)
      Seq(
        Entry(0, fetch * 2, "request", uri, s"<urn:req:$fetch>",
          "application/http;msgtype=request",
          s"GET /page HTTP/1.1\r\n\r\n".getBytes(StandardCharsets.UTF_8),
          concurrentTo = s"<urn:resp:$fetch>"),
        Entry(0, fetch * 2 + 1, "response", uri, s"<urn:resp:$fetch>",
          "application/http;msgtype=response",
          WarcCodec.httpResponse(body, "text/plain")))
    }
    WarcShards.pack(spark.createDataset(entries), dir): Unit
    val recs = WarcShards.readRecords(spark, dir).collect()
    assert(recs.length == 4)
    // URI keying collides: both responses carry the same target_uri
    assert(recs.filter(_.getAs[String]("warc_type") == "response")
      .map(_.getAs[String]("target_uri")).distinct.length == 1)
    // concurrent_to pairing is exact: each request names its response
    val pairs = recs.filter(_.getAs[String]("warc_type") == "request")
      .map(r => r.getAs[String]("record_id") -> r.getAs[String]("concurrent_to"))
      .toMap
    assert(pairs == Map("<urn:req:0>" -> "<urn:resp:0>",
      "<urn:req:1>" -> "<urn:resp:1>"))
    // non-paired records surface an empty concurrent_to, not null/garbage
    assert(recs.filter(_.getAs[String]("warc_type") == "response")
      .forall(_.getAs[String]("concurrent_to") == ""))
  }

  test("pack is deterministic; resume skips complete shards with exact stats") {
    val dir1 = tmpDir("warc-det1")
    val dir2 = tmpDir("warc-det2")
    val entries = (0L until 10L).map { i =>
      Entry(0, i, "resource", s"http://e/$i", s"<urn:$i>", "text/plain",
        s"payload $i".getBytes(StandardCharsets.UTF_8))
    }
    val ds = spark.createDataset(entries)
    WarcShards.pack(ds, dir1, gzip = true): Unit
    WarcShards.pack(ds, dir2, gzip = true): Unit
    val f1 = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir1, "shard-00000.warc.gz"))
    val f2 = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir2, "shard-00000.warc.gz"))
    assert(java.util.Arrays.equals(f1, f2), "gzip shards must be byte-identical")

    val resumed = WarcShards.pack(ds, dir1, gzip = true, resume = true).collect()
    assert(resumed.length == 1)
    val r = resumed.head
    assert(r.getAs[Boolean]("resumed"))
    assert(r.getAs[Long]("n_records") == 10L)
    assert(r.getAs[Long]("payload_bytes") ==
      entries.map(_.payload.length.toLong).sum)
  }

  test("a stale shard from a DIFFERENT export is rejected, not adopted") {
    // the TarShards.pack stale-shard guard, applied to the WARC twin: a
    // pre-existing final file is adopted as a prior commit of THIS
    // export only when its record count matches what this export would
    // write; a foreign shard must fail loudly instead of shipping a
    // manifest row describing someone else's bytes
    val dir = tmpDir("warc-stale")
    def entries(n: Long) = spark.createDataset((0L until n).map { i =>
      Entry(0, i, "resource", s"http://e/$i", s"<urn:$i>", "text/plain",
        s"payload $i".getBytes(StandardCharsets.UTF_8))
    })
    // "different export": shard 0 committed with THREE records
    WarcShards.pack(entries(3), dir, gzip = true): Unit
    // this export's shard 0 has TEN records → resume must reject
    val e = intercept[org.apache.spark.SparkException] {
      WarcShards.pack(entries(10), dir, gzip = true, resume = true).count()
    }
    assert(e.getMessage.contains("stale shard") ||
      Option(e.getCause).exists(_.getMessage.contains("stale shard")), e.getMessage)
    // matching count → adopted cleanly (the legitimate resume path)
    val ok = WarcShards.pack(entries(3), dir, gzip = true, resume = true).collect()
    assert(ok.length == 1 && ok.head.getAs[Boolean]("resumed"))
    assert(ok.head.getAs[Long]("n_records") == 3L)
  }
}
