package graft.sources

import java.io.{BufferedOutputStream, ByteArrayInputStream, InputStream, OutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** WARC (Web ARChive, ISO 28500) source + sink — the ingestion front
  * door for Common-Crawl-shaped corpora, pure JVM like the ustar codec
  * ([[TarShards]]). A WARC file is a sequence of records, each framed as
  *
  * {{{
  * WARC/1.0\r\n
  * WARC-Type: response\r\n
  * WARC-Record-ID: <urn:...>\r\n
  * WARC-Target-URI: http://...\r\n        (optional)
  * Content-Type: application/http...\r\n
  * Content-Length: N\r\n
  * \r\n
  * <N payload bytes>\r\n\r\n
  * }}}
  *
  * Common Crawl ships records individually gzipped and concatenated
  * (`.warc.gz`); both the plain and per-record-gzip layouts are
  * supported — the reader detects the 0x1f8b magic and streams through
  * `GZIPInputStream`, whose multi-member handling makes record framing
  * independent of gzip member boundaries.
  *
  * The reference's extract stage (extractor.py:94-99) is this slot for
  * CSV/JSON; WARC is the same single-file-parse shape over a framed
  * binary format. Downstream, [[graft.functions.HtmlTextExtractor]]
  * turns response bodies into curated text.
  */
object WarcShards {

  /** Fixed WARC-Date for synthesized archives: byte-determinism is what
    * makes [[pack]]'s resume/retry skip sound (same contract as tar).
    */
  val FixedDate = "2026-01-01T00:00:00Z"

  /** One record to pack: `ord` orders records within a shard (write
    * order is part of WARC semantics — warcinfo first, then
    * request/response pairs).
    */
  final case class Entry(
      shard: Int,
      ord: Long,
      warcType: String,
      targetUri: String,
      recordId: String,
      contentType: String,
      payload: Array[Byte],
      concurrentTo: String = "",
      refersTo: String = "",
      truncated: String = "")

  /** Parsed record: named WARC headers pulled out, full payload. */
  final case class Record(
      warcType: String,
      recordId: String,
      targetUri: String,
      contentType: String,
      payload: Array[Byte],
      concurrentTo: String = "",
      refersTo: String = "",
      truncated: String = "")

  object WarcCodec {

    private val Crlf = "\r\n".getBytes(StandardCharsets.US_ASCII)

    /** Per-record cap: a few KB of gzip can legally declare a
      * multi-GB record (decompression bomb) — on an executor that is
      * an OOM, not an exception you can catch. Checked from the header
      * BEFORE the payload is read.
      */
    val DefaultMaxRecordBytes: Long = 256L * 1024 * 1024

    def writeRecord(out: OutputStream, warcType: String, recordId: String,
        targetUri: String, contentType: String, payload: Array[Byte],
        concurrentTo: String = "", refersTo: String = "",
        truncated: String = ""): Unit = {
      val h = new StringBuilder
      h.append("WARC/1.0\r\n")
      h.append("WARC-Type: ").append(warcType).append("\r\n")
      h.append("WARC-Record-ID: ").append(recordId).append("\r\n")
      h.append("WARC-Date: ").append(FixedDate).append("\r\n")
      if (concurrentTo.nonEmpty)
        h.append("WARC-Concurrent-To: ").append(concurrentTo).append("\r\n")
      if (refersTo.nonEmpty)
        h.append("WARC-Refers-To: ").append(refersTo).append("\r\n")
      if (truncated.nonEmpty)
        h.append("WARC-Truncated: ").append(truncated).append("\r\n")
      if (targetUri.nonEmpty)
        h.append("WARC-Target-URI: ").append(targetUri).append("\r\n")
      if (contentType.nonEmpty)
        h.append("Content-Type: ").append(contentType).append("\r\n")
      h.append("Content-Length: ").append(payload.length).append("\r\n")
      h.append("\r\n")
      out.write(h.toString.getBytes(StandardCharsets.UTF_8))
      out.write(payload)
      out.write(Crlf)
      out.write(Crlf)
    }

    /** An HTTP/1.1 200 response payload wrapping `body` — what a
      * `response` record carries. Content-Length is the body's byte
      * count, so the full payload is closed-form from the body.
      * `extraHeaders` plants additional verbatim header lines (cache
      * validators for the refresh-crawl fixtures).
      */
    def httpResponse(body: Array[Byte], contentType: String,
        extraHeaders: Seq[(String, String)] = Nil): Array[Byte] = {
      val extra = extraHeaders.map { case (k, v) => s"$k: $v\r\n" }.mkString
      val h = s"HTTP/1.1 200 OK\r\nContent-Type: $contentType\r\n" +
        extra + s"Content-Length: ${body.length}\r\n\r\n"
      val hb = h.getBytes(StandardCharsets.UTF_8)
      val outB = new Array[Byte](hb.length + body.length)
      System.arraycopy(hb, 0, outB, 0, hb.length)
      System.arraycopy(body, 0, outB, hb.length, body.length)
      outB
    }

    /** An HTTP/1.1 3xx redirect response payload — what a crawler's
      * `response` record carries when the server answered with a
      * `Location` instead of content (the body is the conventional
      * short HTML stub real servers attach). For fixtures and the
      * redirect-harvest tests.
      */
    def httpRedirect(status: Int, location: String): Array[Byte] = {
      require(status >= 300 && status <= 399,
        s"redirect status must be 3xx, got $status")
      val reason = status match {
        case 301 => "Moved Permanently"
        case 302 => "Found"
        case 303 => "See Other"
        case 307 => "Temporary Redirect"
        case 308 => "Permanent Redirect"
        case _ => "Redirect"
      }
      val body = s"<html><body>$reason</body></html>"
        .getBytes(StandardCharsets.UTF_8)
      val h = s"HTTP/1.1 $status $reason\r\nLocation: $location\r\n" +
        s"Content-Type: text/html\r\nContent-Length: ${body.length}\r\n\r\n"
      val hb = h.getBytes(StandardCharsets.UTF_8)
      val outB = new Array[Byte](hb.length + body.length)
      System.arraycopy(hb, 0, outB, 0, hb.length)
      System.arraycopy(body, 0, outB, hb.length, body.length)
      outB
    }

    /** An HTTP/1.1 304 Not Modified payload — what a `response` record
      * carries when the crawler revalidated with `If-None-Match` /
      * `If-Modified-Since` and the origin confirmed the cached copy
      * (RFC 9110 §15.4.5: no body; the validators are re-sent). For
      * fixtures and the refresh-crawl tests.
      */
    def httpNotModified(etag: String = "",
        lastModified: String = ""): Array[Byte] = {
      val extra =
        (if (etag.nonEmpty) s"ETag: $etag\r\n" else "") +
          (if (lastModified.nonEmpty) s"Last-Modified: $lastModified\r\n"
           else "")
      (s"HTTP/1.1 304 Not Modified\r\n$extra\r\n")
        .getBytes(StandardCharsets.UTF_8)
    }

    /** An HTTP/1.1 200 response whose body rides `Transfer-Encoding:
      * chunked` (one chunk per `chunkSize` bytes) — the other wire shape
      * real captures carry. For fixtures and round-trip tests.
      */
    def httpResponseChunked(body: Array[Byte], contentType: String,
        chunkSize: Int = 256): Array[Byte] = {
      require(chunkSize > 0, s"chunkSize must be positive: $chunkSize")
      val out = new java.io.ByteArrayOutputStream(body.length + 128)
      out.write((s"HTTP/1.1 200 OK\r\nContent-Type: $contentType\r\n" +
        "Transfer-Encoding: chunked\r\n\r\n").getBytes(StandardCharsets.UTF_8))
      var off = 0
      while (off < body.length) {
        val n = math.min(chunkSize, body.length - off)
        out.write(s"${n.toHexString}\r\n".getBytes(StandardCharsets.US_ASCII))
        out.write(body, off, n)
        out.write('\r'); out.write('\n')
        off += n
      }
      out.write("0\r\n\r\n".getBytes(StandardCharsets.US_ASCII))
      out.toByteArray
    }

    /** An HTTP/1.1 200 response whose body is gzip Content-Encoding. */
    def httpResponseGzip(body: Array[Byte], contentType: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream(body.length / 2 + 64)
      val gz = new GZIPOutputStream(bos)
      gz.write(body); gz.finish()
      val enc = bos.toByteArray
      val h = s"HTTP/1.1 200 OK\r\nContent-Type: $contentType\r\n" +
        s"Content-Encoding: gzip\r\nContent-Length: ${enc.length}\r\n\r\n"
      val hb = h.getBytes(StandardCharsets.UTF_8)
      val outB = new Array[Byte](hb.length + enc.length)
      System.arraycopy(hb, 0, outB, 0, hb.length)
      System.arraycopy(enc, 0, outB, hb.length, enc.length)
      outB
    }

    private def dechunk(raw: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream(raw.length)
      var i = 0
      var done = false
      while (!done) {
        // chunk-size line (hex, optional ;extensions), CRLF
        var j = i
        while (j < raw.length && raw(j) != '\r') j += 1
        require(j + 1 < raw.length && raw(j + 1) == '\n',
          "malformed chunked body: missing CRLF after chunk size")
        val sizeLine = new String(raw, i, j - i, StandardCharsets.US_ASCII)
        val size = Integer.parseInt(sizeLine.takeWhile(c =>
          Character.digit(c, 16) >= 0), 16)
        i = j + 2
        if (size == 0) done = true
        else {
          require(i + size + 2 <= raw.length, "truncated chunked body")
          out.write(raw, i, size)
          require(raw(i + size) == '\r' && raw(i + size + 1) == '\n',
            "malformed chunked body: missing CRLF after chunk data")
          i += size + 2
        }
      }
      out.toByteArray
    }

    private def gunzip(raw: Array[Byte], cap: Long): Array[Byte] = {
      val in = new GZIPInputStream(new ByteArrayInputStream(raw), 64 * 1024)
      val out = new java.io.ByteArrayOutputStream(math.min(raw.length.toLong * 4, cap).toInt)
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) {
        out.write(buf, 0, n)
        require(out.size() <= cap,
          s"gzip body inflated past cap $cap (decompression-bomb guard)")
        n = in.read(buf)
      }
      out.toByteArray
    }

    /** The parsed HTTP response envelope: status, the `Location` header
      * (redirect target, "" when absent — VERBATIM, not resolved: a
      * relative Location resolves against the record's target URI
      * downstream, [[RedirectEdges]]), the `Content-Type` charset
      * parameter ("" when absent), the `Content-Type` MEDIA TYPE
      * (lowercased token before any `;` parameter, "" when absent —
      * the crawl loop's extract-vs-asset routing key), the cache
      * validators a refresh crawler echoes back (`ETag` verbatim incl.
      * quotes/`W/` prefix per RFC 9110 §8.8.3, `Last-Modified`
      * verbatim — both "" when absent), and the entity body.
      */
    final case class HttpEnvelope(status: Int, location: String,
        charset: String, mediaType: String, etag: String,
        lastModified: String, retryAfter: String,
        contentEncoding: String, xRobotsTag: String, body: Array[Byte])

    /** Split an HTTP message payload into its [[HttpEnvelope]]. None if
      * the payload is not an HTTP response (no status line / no
      * blank-line separator). The two wire transforms real captures
      * carry are undone here — `Transfer-Encoding: chunked` is
      * de-chunked and `Content-Encoding: gzip` inflated (in that order,
      * per RFC 9112; inflation rides the same decompression-bomb cap as
      * record parsing) — so downstream extraction always sees entity
      * bytes. Named headers the crawl loop needs (`Location` for 3xx
      * harvesting, the charset for decode) surface here rather than
      * being re-parsed from raw bytes downstream — the header block is
      * framed exactly once.
      */
    def parseHttpEnvelope(payload: Array[Byte],
        maxBodyBytes: Long = DefaultMaxRecordBytes): Option[HttpEnvelope] = {
      if (payload.length < 12 ||
          !new String(payload, 0, 5, StandardCharsets.US_ASCII).equals("HTTP/"))
        return None
      // find \r\n\r\n
      var i = 0
      var sep = -1
      while (sep < 0 && i + 3 < payload.length) {
        if (payload(i) == '\r' && payload(i + 1) == '\n' &&
            payload(i + 2) == '\r' && payload(i + 3) == '\n') sep = i
        else i += 1
      }
      if (sep < 0) return None
      val head = new String(payload, 0, sep, StandardCharsets.US_ASCII)
      val lines = head.split("\r\n")
      val parts = lines(0).split(" ")
      val status = if (parts.length >= 2) parts(1).takeWhile(_.isDigit) else ""
      if (status.isEmpty) return None
      // ONE pass over the header lines: split each line once into
      // (key, value) — the seven named-header lookups below are then
      // allocation-free scans (a per-lookup iterator-with-split was
      // measurably hot: the envelope parse runs per record on the
      // WARC ingest path)
      val keys = new Array[String](lines.length - 1)
      val vals = new Array[String](lines.length - 1)
      var li = 1
      while (li < lines.length) {
        val l = lines(li)
        val k = l.indexOf(':')
        if (k > 0) {
          keys(li - 1) = l.substring(0, k).trim
          vals(li - 1) = l.substring(k + 1).trim
        } else { keys(li - 1) = ""; vals(li - 1) = "" }
        li += 1
      }
      def hdrVerbatim(name: String): String = {
        var j = 0
        while (j < keys.length) {
          if (keys(j).equalsIgnoreCase(name)) return vals(j)
          j += 1
        }
        ""
      }
      // transform headers' values are lowercased tokens;
      // Location/ETag/Last-Modified stay case-SENSITIVE in value (URL
      // paths; opaque entity tags; HTTP-dates)
      def hdr(name: String): Option[String] =
        Some(hdrVerbatim(name)).filter(_.nonEmpty)
          .map(_.toLowerCase(java.util.Locale.ROOT))
      val location = hdrVerbatim("Location")
      val etag = hdrVerbatim("ETag")
      val lastModified = hdrVerbatim("Last-Modified")
      // Retry-After (RFC 9110 §10.2.3): verbatim — seconds or an
      // HTTP-date; the refresh loop parses the numeric form and treats
      // dates as absent (a crawl clock has no wall-time axis)
      val retryAfter = hdrVerbatim("Retry-After")
      // X-Robots-Tag (the header twin of robots META): lowercased
      // directive list, "" when absent
      val xRobotsTag = hdr("X-Robots-Tag").getOrElse("")
      val contentType = hdr("Content-Type")
      val charset = contentType
        .flatMap(ct => "charset=\\s*\"?([^\";\\s]+)".r.findFirstMatchIn(ct)
          .map(_.group(1)))
        .getOrElse("")
      val mediaType = contentType
        .map(ct => { val s = ct.indexOf(';'); if (s < 0) ct else ct.substring(0, s).trim })
        .getOrElse("")
      var body = java.util.Arrays.copyOfRange(payload, sep + 4, payload.length)
      if (hdr("Transfer-Encoding").exists(_.contains("chunked")))
        body = dechunk(body)
      // gzip is undone here (body becomes entity bytes and the surfaced
      // encoding clears); any OTHER token (br, zstd, …) survives as the
      // column value so the crawl loop can fence the still-compressed
      // body instead of minting garbage text — the JDK has no brotli
      // codec (the H.264/MP3 precedent: route, never guess)
      var contentEncoding = hdr("Content-Encoding").getOrElse("")
      if (contentEncoding == "gzip" || contentEncoding == "x-gzip") {
        body = gunzip(body, maxBodyBytes)
        contentEncoding = ""
      } else if (contentEncoding == "identity") contentEncoding = ""
      Some(HttpEnvelope(status.toInt, location, charset, mediaType, etag,
        lastModified, retryAfter, contentEncoding, xRobotsTag, body))
    }

    /** (status, body) convenience view of [[parseHttpEnvelope]]. */
    def parseHttp(payload: Array[Byte],
        maxBodyBytes: Long = DefaultMaxRecordBytes): Option[(Int, Array[Byte])] =
      parseHttpEnvelope(payload, maxBodyBytes).map(e => (e.status, e.body))

    /** Read one CRLF-terminated line (without the terminator); None at
      * clean end-of-stream before any byte.
      */
    private def readLine(in: InputStream): Option[String] = {
      val buf = new java.io.ByteArrayOutputStream(64)
      var c = in.read()
      if (c < 0) return None
      while (c >= 0 && c != '\n') { buf.write(c); c = in.read() }
      val b = buf.toByteArray
      val len = if (b.nonEmpty && b(b.length - 1) == '\r') b.length - 1 else b.length
      Some(new String(b, 0, len, StandardCharsets.UTF_8))
    }

    private def readFully(in: InputStream, len: Int): Array[Byte] = {
      val b = new Array[Byte](len)
      var got = 0
      while (got < len) {
        val r = in.read(b, got, len - got)
        require(r >= 0, s"truncated WARC payload: wanted $len, got $got")
        got += r
      }
      b
    }

    /** Discard exactly `len` bytes. `skip` on an inflater stream can
      * return 0 without reaching EOF, so fall back to draining reads.
      */
    private def skipFully(in: InputStream, len: Long): Unit = {
      var left = len
      val buf = new Array[Byte](8 * 1024)
      while (left > 0) {
        val s = in.skip(left)
        if (s > 0) left -= s
        else {
          val r = in.read(buf, 0, math.min(left, buf.length.toLong).toInt)
          require(r >= 0, s"truncated WARC payload: $left bytes short")
          left -= r
        }
      }
    }

    /** The parsed framing of one record header: named headers plus the
      * declared payload length. None at clean end-of-stream.
      */
    private def readHeader(raw: InputStream,
        maxRecordBytes: Long): Option[(String, String, String, String, String, String, String, Long)] = {
      // skip inter-record blank lines, stop at end-of-stream
      var first: Option[String] = readLine(raw)
      while (first.exists(_.isEmpty)) first = readLine(raw)
      first.map { magic =>
        require(magic == "WARC/1.0" || magic == "WARC/1.1",
          s"not a WARC record header: '$magic'")
        var warcType = ""; var recordId = ""; var uri = ""
        var cType = ""; var concTo = ""; var refTo = ""; var trunc = ""
        var cLen = -1L
        var line = readLine(raw).getOrElse(
          throw new IllegalArgumentException("truncated WARC header"))
        while (line.nonEmpty) {
          val k = line.indexOf(':')
          require(k > 0, s"malformed WARC header line: '$line'")
          val key = line.substring(0, k).toLowerCase(java.util.Locale.ROOT)
          val v = line.substring(k + 1).trim
          key match {
            case "warc-type" => warcType = v
            case "warc-record-id" => recordId = v
            case "warc-target-uri" => uri = v
            case "warc-concurrent-to" => concTo = v
            case "warc-refers-to" => refTo = v
            case "warc-truncated" =>
              trunc = v.toLowerCase(java.util.Locale.ROOT)
            case "content-type" => cType = v
            case "content-length" => cLen = v.toLong
            case _ => () // tolerated: unknown headers are legal
          }
          line = readLine(raw).getOrElse(
            throw new IllegalArgumentException("truncated WARC header"))
        }
        require(cLen >= 0, "WARC record without Content-Length")
        require(cLen <= maxRecordBytes,
          s"WARC record of $cLen bytes exceeds cap $maxRecordBytes " +
            "(decompression-bomb guard)")
        (warcType, recordId, uri, cType, concTo, refTo, trunc, cLen)
      }
    }

    /** Sniff the 0x1f8b gzip magic without consuming the stream. */
    private def maybeGunzip(in: InputStream): InputStream = {
      val pb = new java.io.PushbackInputStream(in, 2)
      val b0 = pb.read(); val b1 = pb.read()
      if (b1 >= 0) pb.unread(b1)
      if (b0 >= 0) pb.unread(b0)
      if (b0 == 0x1f && b1 == 0x8b) new GZIPInputStream(pb, 64 * 1024) else pb
    }

    /** Strict lazy parse of a (possibly per-record-gzipped) WARC stream.
      * Verifies the version magic, requires Content-Length, enforces the
      * record cap. STREAMING: per-call memory is one record's payload
      * (cap-bounded), never the shard — a 1 GB Common Crawl shard parses
      * in O(maxRecordBytes), which is what makes the binaryFile-free
      * [[WarcShards.readRecords]] and the resume stat-scan safe at real
      * shard sizes. Does not close `in`.
      */
    def parseStream(in: InputStream,
        maxRecordBytes: Long = DefaultMaxRecordBytes): Iterator[Record] = {
      val raw = maybeGunzip(new java.io.BufferedInputStream(in, 64 * 1024))
      new Iterator[Record] {
        private var nextRec: Record = null
        private var done = false

        private def advance(): Unit = {
          if (nextRec == null && !done) {
            readHeader(raw, maxRecordBytes) match {
              case None => done = true
              case Some((warcType, recordId, uri, cType, concTo, refTo,
                  trunc, cLen)) =>
                val payload = readFully(raw, cLen.toInt)
                nextRec = Record(warcType, recordId, uri, cType, payload, concTo,
                  refTo, trunc)
            }
          }
        }

        override def hasNext: Boolean = { advance(); nextRec != null }
        override def next(): Record = {
          advance()
          if (nextRec == null) throw new NoSuchElementException
          val r = nextRec; nextRec = null; r
        }
      }
    }

    /** In-memory convenience overload (fixtures, per-record-gzip tests,
      * the streaming front door's per-file micro-batch bytes).
      */
    def parse(bytes: Array[Byte],
        maxRecordBytes: Long = DefaultMaxRecordBytes): Iterator[Record] =
      parseStream(new ByteArrayInputStream(bytes), maxRecordBytes)

    /** Header-only stats `(n_records, payload_bytes)` — the resume path's
      * manifest reconstruction. Payload bytes are SKIPPED, never
      * materialized (for `.gz` they still stream through the inflater —
      * gzip has no random access — but no payload array is built):
      * constant memory regardless of shard or record size. Does not
      * close `in`.
      */
    def scanStats(in: InputStream,
        maxRecordBytes: Long = DefaultMaxRecordBytes): (Long, Long) = {
      val raw = maybeGunzip(new java.io.BufferedInputStream(in, 64 * 1024))
      var n = 0L
      var payload = 0L
      var h = readHeader(raw, maxRecordBytes)
      while (h.isDefined) {
        val len = h.get._8
        skipFully(raw, len)
        n += 1
        payload += len
        h = readHeader(raw, maxRecordBytes)
      }
      (n, payload)
    }

    /** In-memory convenience overload. */
    def scanStats(bytes: Array[Byte]): (Long, Long) =
      scanStats(new ByteArrayInputStream(bytes))
  }

  /** Pack entries into one `shard-%05d.warc[.gz]` per shard key under
    * `outDir`. Same commit protocol as [[TarShards.pack]]: attempt-unique
    * tmp + single rename; an existing final file is a prior attempt's (or
    * resumed run's) commit — byte-determinism (fixed WARC-Date, `ord`
    * ordering, mtime-free gzip header) makes skipping sound. Returns the
    * manifest `(shard, file, n_records, payload_bytes, resumed)`.
    */
  def pack(entries: Dataset[Entry], outDir: String,
      gzip: Boolean = false, resume: Boolean = false,
      baseExt: String = "warc"): DataFrame = {
    val spark = entries.sparkSession
    import spark.implicits._
    val hadoopConf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val ext = if (gzip) s"$baseExt.gz" else baseExt
    val packed = entries
      .groupByKey(_.shard)
      .flatMapSortedGroups(col("ord"), col("recordId")) {
        (shard: Int, it: Iterator[Entry]) =>
          val path = new org.apache.hadoop.fs.Path(outDir, f"shard-$shard%05d.$ext")
          val fs = path.getFileSystem(hadoopConf.value)
          def statsRow(resumed: Boolean) = {
            // Streamed header-only scan: constant memory however large
            // the committed shard is (real Common Crawl shards run ~1 GB)
            val in = fs.open(path)
            val (n, p) = try WarcCodec.scanStats(in) finally in.close()
            // Adopt only after a record-count check (the TarShards.pack
            // stale-shard guard): by byte-determinism a prior commit of
            // THIS export holds exactly this group's record count, so a
            // mismatch means a STALE shard from a different export in a
            // non-clean directory — adopting it would ship a manifest
            // row describing someone else's bytes. Fail loudly instead.
            var expected = 0L
            while (it.hasNext) { it.next(); expected += 1 }
            require(n == expected,
              s"$path already exists with $n records but this export's " +
                s"shard $shard has $expected — stale shard from a " +
                "different export in a non-clean output directory; " +
                "delete it or export into a clean directory")
            Iterator((shard, path.getName, n, p, resumed))
          }
          if (resume && fs.exists(path)) statsRow(resumed = true)
          else if (fs.exists(path)) statsRow(resumed = false) // prior attempt committed
          else {
            val attempt = Option(org.apache.spark.TaskContext.get())
              .map(_.taskAttemptId()).getOrElse(0L)
            val tmp = new org.apache.hadoop.fs.Path(
              outDir, path.getName + s".tmp-$attempt")
            val rawOut = new BufferedOutputStream(fs.create(tmp, true))
            val out: OutputStream =
              if (gzip) new GZIPOutputStream(rawOut, 64 * 1024) else rawOut
            var n = 0L
            var payload = 0L
            try {
              it.foreach { e =>
                WarcCodec.writeRecord(out, e.warcType, e.recordId, e.targetUri,
                  e.contentType, e.payload, e.concurrentTo, e.refersTo,
                  e.truncated)
                n += 1
                payload += e.payload.length
              }
            } finally out.close() // GZIPOutputStream.close finishes + closes raw
            if (!fs.rename(tmp, path)) {
              require(fs.exists(path), s"commit rename failed for $path")
              fs.delete(tmp, false): Unit
            }
            fs.globStatus(new org.apache.hadoop.fs.Path(
              outDir, path.getName + ".tmp-*"))
              .foreach(st => fs.delete(st.getPath, false))
            Iterator((shard, path.getName, n, payload, false))
          }
      }
    // Eager + driver-held for the same reason as TarShards.pack: a lazy
    // manifest re-runs the packing stage under plans that sample input.
    spark.createDataset(packed.collect().toSeq)
      .toDF("shard", "file", "n_records", "payload_bytes", "resumed")
  }

  /** Fixed warcinfo payload for WET sidecars (byte-determinism again). */
  private val WetInfoPayload: Array[Byte] =
    ("software: graft-wet/1.0\r\nformat: WARC/1.0\r\n" +
      "conformsTo: ISO 28500\r\n").getBytes(StandardCharsets.UTF_8)

  /** WET sidecar export — the `conversion`-record specialization of
    * [[pack]] (Common Crawl's `.wet.gz` companions): one conversion
    * record per document whose payload is the EXTRACTED plain text
    * (`Content-Type: text/plain`), `WARC-Target-URI` preserved and
    * `WARC-Refers-To` naming the source response record, led by one
    * warcinfo record per shard, exactly as real WET files are laid out.
    * Files are `shard-%05d.wet[.gz]`; [[readRecords]] scans them back
    * (the glob covers `.wet`), closing the crawl loop's export side:
    * crawl → extract → curate → WET.
    *
    * `docs` columns: `doc_id` (long), `target_uri`, `refers_to`, `text`.
    * Same commit/resume protocol and scale shape as [[pack]] — one task
    * per shard, streaming write, attempt-unique tmp + rename.
    */
  def packWet(docs: DataFrame, outDir: String, nShards: Int,
      gzip: Boolean = true, resume: Boolean = false): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val spark = docs.sparkSession
    import spark.implicits._
    val conv = docs
      .select(col("doc_id").cast("long"), col("target_uri").cast("string"),
        col("refers_to").cast("string"), col("text").cast("string"))
      .as[(Long, String, String, String)]
      .map { case (id, uri, ref, text) =>
        // ord = id + 1 sorts conversion records AFTER the per-shard
        // warcinfo record (ord 0); a negative id would collide with or
        // sort before it, silently breaking the warcinfo-first layout
        require(id >= 0,
          s"packWet requires non-negative doc_id (got $id): record order " +
            "within a shard is ord = doc_id + 1 after the warcinfo record at 0")
        Entry(java.lang.Math.floorMod(id, nShards.toLong).toInt, id + 1,
          "conversion", Option(uri).getOrElse(""), s"<urn:graft:wet:$id>",
          "text/plain",
          Option(text).getOrElse("").getBytes(StandardCharsets.UTF_8),
          refersTo = Option(ref).getOrElse(""))
      }
    val info = spark.createDataset((0 until nShards).map { sh =>
      Entry(sh, 0L, "warcinfo", "", s"<urn:graft:wetinfo:$sh>",
        "application/warc-fields", WetInfoPayload)
    })
    pack(conv.union(info), outDir, gzip = gzip, resume = resume, baseExt = "wet")
  }

  /** Scan every `*.warc` / `*.warc.gz` under `dir`: one row per record
    * with the HTTP envelope of `response` records already split —
    * `(file, warc_type, record_id, target_uri, content_type,
    * payload_bytes, http_status, body)`. For non-HTTP records
    * `http_status` is null and `body` is the raw payload. Parallelism =
    * number of shard files (the Common Crawl unit of work); each task
    * streams one file.
    */
  def readRecords(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hadoopConf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    // binaryFile supplies the parallel FILE LISTING only (column pruning
    // keeps `content` out of the scan — check ReadSchema); each task then
    // STREAMS its shard through the record parser, so per-task memory is
    // one record (cap-bounded), not the whole compressed shard. This is
    // what makes a ~1 GB real Common Crawl shard readable without a
    // per-task gigabyte buffer, and it also lifts binaryFile's 2 GB
    // content ceiling off the shard size.
    spark.read.format("binaryFile")
      .load(shardGlob(dir))
      .select(col("path"))
      .as[String]
      .flatMap(recordRows(hadoopConf))
      .toDF(RecordColumns: _*)
  }

  /** STREAMING twin of [[readRecords]] — the continuous-ingestion front
    * door: a `binaryFile` file-source readStream over `dir` (new shard
    * files flow through as micro-batches, already-seen files tracked by
    * the checkpoint), same columns, same per-task scale shape. The
    * source scan lists PATHS only (`content` pruned — gated by
    * WarcShardsSpec's streaming plan check) and each task streams its
    * shard file through [[WarcCodec.parseStream]], so per-task memory is
    * one record (cap-bounded), never the compressed shard, and
    * binaryFile's 2 GB content ceiling does not bound the shard size —
    * the batch reader's contract, shared via one [[recordRows]] parse
    * closure so the two paths cannot drift.
    *
    * @param maxFilesPerTrigger micro-batch size in shard FILES (the
    *   Common Crawl unit of work); 0 = leave unset (source default:
    *   all available files in one batch)
    */
  def readRecordsStream(spark: org.apache.spark.sql.SparkSession, dir: String,
      maxFilesPerTrigger: Int = 0): DataFrame = {
    import spark.implicits._
    val hadoopConf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val reader = spark.readStream.format("binaryFile")
      // file-source streams need the schema up front; binaryFile's is
      // fixed (path, modificationTime, length, content)
      .schema("path STRING, modificationTime TIMESTAMP, length LONG, content BINARY")
    val configured =
      if (maxFilesPerTrigger > 0)
        reader.option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      else reader
    configured.load(shardGlob(dir))
      .select(col("path"))
      .as[String]
      .flatMap(recordRows(hadoopConf))
      .toDF(RecordColumns: _*)
  }

  private val RecordColumns = Seq("file", "warc_type", "record_id",
    "target_uri", "concurrent_to", "refers_to", "truncated",
    "content_type", "payload_bytes", "http_status", "http_location",
    "http_charset", "http_content_type", "http_etag",
    "http_last_modified", "http_retry_after", "http_content_encoding",
    "http_x_robots_tag", "body")

  /** Brace alternation, NOT "*.warc*": the loose glob would also match a
    * crashed attempt's ".warc.tmp-N" leftovers and fail the whole scan on
    * their truncated bytes.
    */
  private def shardGlob(dir: String): String =
    s"${dir.stripSuffix("/")}/{*.warc,*.warc.gz,*.wet,*.wet.gz}"

  /** One shard path → record rows, STREAMED: open the file's FS stream,
    * parse via [[WarcCodec.parseStream]] (per-call memory = one
    * cap-bounded record), split response records' HTTP envelope. The one
    * parse closure behind both [[readRecords]] and [[readRecordsStream]].
    */
  private def recordRows(
      hadoopConf: org.apache.spark.util.SerializableConfiguration)(path: String)
      : Iterator[(String, String, String, String, String, String,
        Option[String], String, Long, Option[Int], Option[String],
        Option[String], Option[String], Option[String], Option[String],
        Option[String], Option[String], Option[String],
        Array[Byte])] = {
    val file = path.substring(path.lastIndexOf('/') + 1)
    val p = new org.apache.hadoop.fs.Path(path)
    val in = p.getFileSystem(hadoopConf.value).open(p)
    // the stream outlives this call (lazy iterator): close with the
    // task (covers mid-iteration failure; FS stream close is
    // idempotent) AND at iterator exhaustion (a task over many small
    // shards must not hold every handle until task end)
    Option(org.apache.spark.TaskContext.get())
      .foreach(_.addTaskCompletionListener[Unit](_ => in.close()))
    WarcCodec.parseStream(in).map { r =>
      val http = WarcCodec.parseHttpEnvelope(r.payload)
      (file, r.warcType, r.recordId, r.targetUri, r.concurrentTo,
        r.refersTo, Some(r.truncated).filter(_.nonEmpty),
        r.contentType, r.payload.length.toLong,
        http.map(_.status),
        // absent headers are NULL columns, not "" (isNotNull filters
        // compose; "" would silently pass a startsWith test)
        http.map(_.location).filter(_.nonEmpty),
        http.map(_.charset).filter(_.nonEmpty),
        http.map(_.mediaType).filter(_.nonEmpty),
        http.map(_.etag).filter(_.nonEmpty),
        http.map(_.lastModified).filter(_.nonEmpty),
        http.map(_.retryAfter).filter(_.nonEmpty),
        http.map(_.contentEncoding).filter(_.nonEmpty),
        http.map(_.xRobotsTag).filter(_.nonEmpty),
        http.map(_.body).getOrElse(r.payload))
    } ++ { in.close(); Iterator.empty }
  }
}
