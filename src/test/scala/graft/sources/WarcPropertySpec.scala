package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

import graft.SparkSpec
import graft.sources.WarcShards.WarcCodec

/** Randomized round-trip properties for the WARC codec — the ingestion
  * front door's kernel, fuzzed the AhoCorasickPropertySpec way: random
  * record mixes (types, payload sizes incl. empty, unicode URIs, all
  * three HTTP wire shapes at random chunk sizes, plain and per-record
  * gzip layouts) must parse back byte-exact, and scanStats must agree
  * with the materializing parse on every stream.
  */
class WarcPropertySpec extends SparkSpec {

  private val rnd = new scala.util.Random(20260815L)

  private def randBytes(n: Int): Array[Byte] = {
    val b = new Array[Byte](n); rnd.nextBytes(b); b
  }

  test("randomized records round-trip byte-exact, plain and per-record gzip") {
    for (round <- 1 to 8) {
      val n = rnd.nextInt(12) + 1
      val recs = (0 until n).map { i =>
        val warcType = Seq("response", "request", "metadata", "resource",
          "conversion")(rnd.nextInt(5))
        val uri = if (rnd.nextBoolean()) s"http://ex.com/p$i?q=é世" else ""
        val payload = randBytes(rnd.nextInt(5000)) // 0..4999, empty legal
        (warcType, s"<urn:prop:$round:$i>", uri, payload)
      }
      val plain = new ByteArrayOutputStream()
      val gz = new ByteArrayOutputStream()
      recs.foreach { case (t, id, uri, p) =>
        WarcCodec.writeRecord(plain, t, id, uri, "application/octet-stream", p)
        val g = new java.util.zip.GZIPOutputStream(gz)
        WarcCodec.writeRecord(g, t, id, uri, "application/octet-stream", p)
        g.finish()
      }
      for ((bytes, layout) <- Seq((plain.toByteArray, "plain"), (gz.toByteArray, "gzip"))) {
        val back = WarcCodec.parse(bytes).toList
        assert(back.size == n, s"round $round $layout: ${back.size} != $n")
        back.zip(recs).foreach { case (r, (t, id, uri, p)) =>
          assert(r.warcType == t && r.recordId == id && r.targetUri == uri,
            s"round $round $layout: header drift on $id")
          assert(java.util.Arrays.equals(r.payload, p),
            s"round $round $layout: payload drift on $id")
        }
        // header-only scan agrees with the materializing parse
        val (sn, sb) = WarcCodec.scanStats(bytes)
        assert(sn == n && sb == recs.map(_._4.length.toLong).sum,
          s"round $round $layout: scanStats ($sn, $sb) disagrees")
      }
    }
  }

  test("randomized HTTP wire shapes decode to identical entity bytes") {
    for (round <- 1 to 20) {
      // printable-ish body so the failure message is readable; size 0 legal
      val body = (0 until rnd.nextInt(3000))
        .map(_ => (32 + rnd.nextInt(95)).toChar).mkString
        .getBytes(StandardCharsets.UTF_8)
      val ct = "text/html; charset=utf-8"
      val plain = WarcCodec.httpResponse(body, ct)
      val gzip = WarcCodec.httpResponseGzip(body, ct)
      val chunked = WarcCodec.httpResponseChunked(body, ct,
        chunkSize = rnd.nextInt(500) + 1)
      for ((wire, shape) <- Seq((plain, "content-length"), (gzip, "gzip"),
          (chunked, "chunked"))) {
        val parsed = WarcCodec.parseHttp(wire)
        assert(parsed.nonEmpty, s"round $round $shape: not parsed as HTTP")
        val (status, got) = parsed.get
        assert(status == 200)
        assert(java.util.Arrays.equals(got, body),
          s"round $round $shape: entity bytes drift (len ${got.length} vs ${body.length})")
      }
    }
  }
}
