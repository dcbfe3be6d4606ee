package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  // id 1 → audio (long text so chunking has material), id 2 → video,
  // id 3 → image (real JPEG container bytes, 3 % 6 != 0),
  // id 6 → image (real PNG container bytes, 6 % 6 == 0)
  private def media = Multimodal.mediaFromDocuments(
    Seq((1L, "x" * 600, 600L), (2L, "tiny", 4L), (3L, "hello world", 11L),
      (6L, "abcdef", 6L))
      .toDF("doc_id", "text", "n_chars"))

  test("media synthesis: kind cycles by id, audio/video payload is the UTF-8 text") {
    val rows = media.collect().map(r => r.id -> r).toMap
    assert(rows(1L).meta.kind == "audio")
    assert(rows(2L).meta.kind == "video")
    assert(rows(3L).meta.kind == "image")
    assert(new String(rows(2L).payload, "UTF-8") == "tiny")
    assert(rows(1L).payload.length == 600)
  }

  test("image rows carry real container bytes whose parsed header IS the metadata") {
    val rows = media.collect().map(r => r.id -> r).toMap
    // id 3: JPEG, width = 11 % 1000 + 1 = 12, height = 3 % 500 + 1 = 4
    val jm = ImageHeaders.decode(rows(3L).payload)
    assert(jm.contains(ImageHeaders.ImageMeta("jpeg", 12, 4, 3)))
    assert(rows(3L).meta.widthPx == 12 && rows(3L).meta.heightPx == 4)
    // id 6: PNG, width = 6 % 1000 + 1 = 7, height = 6 % 500 + 1 = 7
    val pm = ImageHeaders.decode(rows(6L).payload)
    assert(pm.contains(ImageHeaders.ImageMeta("png", 7, 7, 3)))
    assert(rows(6L).meta.widthPx == 7 && rows(6L).meta.heightPx == 7)
    // non-image rows don't parse as images and carry no dimensions
    assert(ImageHeaders.decode(rows(1L).payload).isEmpty)
    assert(rows(1L).meta.widthPx == 0 && rows(1L).meta.heightPx == 0)
  }

  test("golden real-world PNG literal decodes (1x1 RGBA, full IDAT/IEND file)") {
    // A complete, valid 70-byte 1x1 transparent PNG (bit depth 8, color
    // type 6 = truecolor+alpha) — produced by a real encoder, not by
    // ImageHeaders.pngBytes, so the parser is checked against the wild
    // format, trailing chunks and all.
    val golden = java.util.Base64.getDecoder.decode(
      "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mNkYPhfDwAChwGA60e6kgAAAABJRU5ErkJggg==")
    assert(golden.length == 70)
    assert(ImageHeaders.decode(golden).contains(ImageHeaders.ImageMeta("png", 1, 1, 4)))
  }

  test("hand-framed JPEG with APP0 before SOF0 decodes (marker walk skips segments)") {
    // SOI, APP0/JFIF (the segment real encoders emit first), SOF0
    // 640x480 3-component, EOI — framed by hand, independent of
    // ImageHeaders.jpegBytes.
    val out = new java.io.ByteArrayOutputStream()
    def w(bs: Int*): Unit = bs.foreach(out.write)
    w(0xff, 0xd8)                                     // SOI
    w(0xff, 0xe0, 0x00, 0x10)                         // APP0, len 16
    w('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0) // JFIF v1.1 payload
    w(0xff, 0xc0, 0x00, 0x11)                         // SOF0, len 17
    w(8)                                              // precision
    w(480 >> 8, 480 & 0xff, 640 >> 8, 640 & 0xff)     // height, width
    w(3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1)          // 3 components
    w(0xff, 0xd9)                                     // EOI
    assert(ImageHeaders.decode(out.toByteArray)
      .contains(ImageHeaders.ImageMeta("jpeg", 640, 480, 3)))
  }

  test("header builders round-trip through the parser; hostile bytes return None") {
    assert(ImageHeaders.decode(ImageHeaders.pngBytes(1920, 1080))
      .contains(ImageHeaders.ImageMeta("png", 1920, 1080, 3)))
    assert(ImageHeaders.decode(ImageHeaders.pngBytes(2, 3, colorType = 6))
      .contains(ImageHeaders.ImageMeta("png", 2, 3, 4)))
    assert(ImageHeaders.decode(ImageHeaders.jpegBytes(65535, 1, nComponents = 1))
      .contains(ImageHeaders.ImageMeta("jpeg", 65535, 1, 1)))
    assert(ImageHeaders.decode(Array.emptyByteArray).isEmpty)
    assert(ImageHeaders.decode("not an image at all".getBytes("UTF-8")).isEmpty)
    assert(ImageHeaders.decode(Array.fill[Byte](64)(0x42)).isEmpty)
    // truncated PNG signature-only and JPEG SOI-only inputs
    assert(ImageHeaders.decode(ImageHeaders.pngBytes(4, 4).take(10)).isEmpty)
    assert(ImageHeaders.decode(Array(0xff, 0xd8).map(_.toByte)).isEmpty)
  }

  test("feature extraction: byte counts exact, stub histogram sums to 1") {
    val feats = Multimodal.extractFeatures(media, targetPartitions = 2)
      .collect().map(f => f.id -> f).toMap
    assert(feats(1L).nBytes == 600)
    assert(feats(3L).nBytes == 23) // header-valid JPEG constant size
    assert(feats(6L).nBytes == 45) // header-valid PNG constant size
    assert(feats(1L).features.length == 8)
    assert(math.abs(feats(1L).features.sum - 1.0) < 1e-9)
    assert(math.abs(feats(6L).features.sum - 1.0) < 1e-9)
  }

  test("real PNG round trip: encode → ImageIO decode, exact pixels both parsers agree") {
    val png = Codecs.encodePng(5, 3, (x, y) => (x * 40 << 16) | (y * 80 << 8) | (x + y))
    val img = Codecs.decodeImage(png).get
    assert(img.getWidth == 5 && img.getHeight == 3)
    // our own header parser and the JDK codec agree on the container
    assert(ImageHeaders.decode(png).exists(m => m.widthPx == 5 && m.heightPx == 3))
    // exact per-pixel values survive the PNG round trip
    for (y <- 0 until 3; x <- 0 until 5)
      assert((img.getRGB(x, y) & 0xffffff) == ((x * 40 << 16) | (y * 80 << 8) | (x + y)))
    // integer-exact channel sums match the generating formula
    val (r, g, b) = Codecs.channelSums(img)
    assert(r == (0 until 3).map(_ => (0 until 5).map(_ * 40).sum).sum)
    assert(g == (0 until 3).map(y => y * 80 * 5).sum)
    assert(b == (for (y <- 0 until 3; x <- 0 until 5) yield x + y).sum)
  }

  test("golden real-world PNG decodes through the ImageIO codec path too") {
    val golden = java.util.Base64.getDecoder.decode(
      "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mNkYPhfDwAChwGA60e6kgAAAABJRU5ErkJggg==")
    val img = Codecs.decodeImage(golden).get
    assert(img.getWidth == 1 && img.getHeight == 1)
  }

  test("image features are REAL mean-RGB for decodable bytes, stub otherwise") {
    // constant-color 4x2: mean RGB is exactly the color / 255
    val png = Codecs.encodePng(4, 2, (_, _) => (200 << 16) | (100 << 8) | 50)
    val rows = Seq(
      Multimodal.MediaRecord(1L, Multimodal.MediaMeta("image", 4, 2, 0, 0L), png),
      // header-only container: ImageIO refuses (no IDAT) → stub fallback
      Multimodal.MediaRecord(2L, Multimodal.MediaMeta("image", 9, 9, 0, 0L),
        ImageHeaders.pngBytes(9, 9)))
    val feats = Multimodal.extractFeatures(rows.toDS()).collect().map(f => f.id -> f).toMap
    assert(feats(1L).features.toSeq == Seq(200.0 / 255, 100.0 / 255, 50.0 / 255))
    assert(feats(2L).features.length == 8) // stub histogram shape
    assert(math.abs(feats(2L).features.sum - 1.0) < 1e-9)
  }

  test("real WAV round trip: encode → javax.sound decode, exact samples") {
    val samples = Array[Short](0, 1000, -1000, 32767, -32768, 5, 0, -5)
    val wav = Codecs.encodeWavPcm16(16000, samples)
    assert(wav.length == 44 + samples.length * 2)
    val (rate, decoded) = Codecs.decodeWavPcm16(wav).get
    assert(rate == 16000)
    assert(decoded.toSeq == samples.toSeq)
    val (sumAbs, crossings) = Codecs.pcmStats(decoded)
    assert(sumAbs == 0L + 1000 + 1000 + 32767 + 32768 + 5 + 0 + 5)
    // strict product rule: (1000,-1000), (-1000,32767), (32767,-32768),
    // (-32768,5) cross; (0,1000), (5,0), (0,-5) do not
    assert(crossings == 4L)
    // non-audio bytes refuse instead of failing
    assert(Codecs.decodeWavPcm16("not audio".getBytes).isEmpty)
  }

  test("audio features are REAL PCM stats for WAV bytes, stub otherwise") {
    val samples = Array.tabulate(64)(i => if (i % 2 == 0) 16384 else -16384).map(_.toShort)
    val wav = Codecs.encodeWavPcm16(8000, samples)
    val rows = Seq(
      Multimodal.MediaRecord(1L, Multimodal.MediaMeta("audio", 0, 0, 8000, 0L), wav),
      Multimodal.MediaRecord(2L, Multimodal.MediaMeta("audio", 0, 0, 8000, 0L),
        "plain text payload".getBytes))
    val feats = Multimodal.extractFeatures(rows.toDS()).collect().map(f => f.id -> f).toMap
    // mean |amplitude| = 16384/32768 = 0.5; every adjacent pair crosses → 63/64
    assert(feats(1L).features.toSeq == Seq(0.5, 63.0 / 64))
    assert(feats(2L).features.length == 8) // stub histogram shape
    assert(math.abs(feats(2L).features.sum - 1.0) < 1e-9)
  }

  test("real animated-GIF round trip: encode → JDK decode, exact gray frames") {
    val gif = Codecs.encodeGifAnimated(4, 3, 3, (f, x, y) => (f * 50 + x * 10 + y) % 256)
    val frames = Codecs.decodeGifFrames(gif).get
    assert(frames.length == 3)
    assert(frames.forall(fr => fr.getWidth == 4 && fr.getHeight == 3))
    // lossless gray palette: every decoded pixel equals the formula
    for (f <- 0 until 3; y <- 0 until 3; x <- 0 until 4) {
      val g = frames(f).getRGB(x, y) & 0xff
      assert(g == (f * 50 + x * 10 + y) % 256, s"frame $f pixel ($x,$y)")
    }
    val (sumGray, motion) = Codecs.frameStats(frames)
    val expGray = (for (f <- 0 until 3; y <- 0 until 3; x <- 0 until 4)
      yield (f * 50 + x * 10 + y) % 256).sum
    assert(sumGray == expGray)
    // consecutive frames differ by exactly 50 per pixel here (no mod wrap)
    assert(motion == 2L * 12 * 50)
    assert(Codecs.decodeGifFrames("not a gif".getBytes).isEmpty)
  }

  test("video features are REAL frame stats for GIF bytes, stub otherwise") {
    // 2 frames, constant gray 100 then 150: mean gray 125/255, motion 50/255
    val gif = Codecs.encodeGifAnimated(5, 4, 2, (f, _, _) => 100 + f * 50)
    val rows = Seq(
      Multimodal.MediaRecord(1L, Multimodal.MediaMeta("video", 5, 4, 0, 0L), gif),
      Multimodal.MediaRecord(2L, Multimodal.MediaMeta("video", 0, 0, 0, 0L),
        "plain text payload".getBytes))
    val feats = Multimodal.extractFeatures(rows.toDS()).collect().map(f => f.id -> f).toMap
    assert(feats(1L).features.toSeq == Seq(125.0 / 255, 50.0 / 255))
    assert(feats(2L).features.length == 8) // stub histogram shape
  }

  test("decompression-bomb guard: declared pixel budget refuses before inflating") {
    val png = Codecs.encodePng(5, 3, (_, _) => 0x112233) // 15 px
    assert(Codecs.decodeImage(png).isDefined)
    assert(Codecs.decodeImage(png, maxPixels = 14).isEmpty)
    val gif = Codecs.encodeGifAnimated(4, 3, 2, (_, _, _) => 7) // 24 px declared
    assert(Codecs.decodeGifFrames(gif).isDefined)
    assert(Codecs.decodeGifFrames(gif, maxPixels = 23).isEmpty)
    // WAV needs no guard: PCM is stored uncompressed, so decode output is
    // bounded by the payload length itself.
  }

  test("frameStats computes real luminance for color frames, identity for gray") {
    // solid red 2x2: Rec.601 luma = 299*255/1000 = 76 per pixel
    val red = Codecs.decodeImage(Codecs.encodePng(2, 2, (_, _) => 0xff0000)).get
    assert(Codecs.frameStats(Seq(red))._1 == 4L * 76)
    // gray value v: weights sum to 1000, so luma == v exactly
    val gray = Codecs.decodeImage(Codecs.encodePng(2, 2, (_, _) => 0x7b7b7b)).get
    assert(Codecs.frameStats(Seq(gray))._1 == 4L * 0x7b)
  }

  test("mismatched frame dimensions degrade motion to the overlap, never throw") {
    val a = Codecs.decodeImage(Codecs.encodePng(4, 4, (_, _) => 0x0a0a0a)).get // gray 10
    val b = Codecs.decodeImage(Codecs.encodePng(2, 3, (_, _) => 0x141414)).get // gray 20
    val (sumGray, motion) = Codecs.frameStats(Seq(a, b))
    assert(sumGray == 16L * 10 + 6L * 20)
    assert(motion == 6L * 10) // 2x3 overlap, |20-10| per pixel
  }

  test("resize produces requested raster; constant color is preserved") {
    val img = Codecs.decodeImage(Codecs.encodePng(8, 8, (_, _) => 0x336699)).get
    val small = Codecs.resize(img, 3, 2)
    assert(small.getWidth == 3 && small.getHeight == 2)
    for (y <- 0 until 2; x <- 0 until 3)
      assert((small.getRGB(x, y) & 0xffffff) == 0x336699)
  }

  test("batched extraction equals per-record extraction (same features, batch shape)") {
    val perRecord = Multimodal.extractFeatures(media).collect()
      .map(f => f.id -> f.features.toSeq).toMap
    val batched = Multimodal.extractFeaturesBatched(media, batchSize = 2).collect()
      .map(f => f.id -> f.features.toSeq).toMap
    assert(batched == perRecord)
  }

  test("audio chunking: windows with overlap cover the payload") {
    // 600-byte payload; fake 1000 Hz * 2 B = 2 B/ms → 100 ms chunk = 200 B,
    // 50 ms overlap → stride 100 B → chunks at 0,100,...,400 = 5 windows
    val chunks = media.toDF()
      .filter(col("id") === 1L)
      .select(Multimodal.chunkAudio(col("payload"), lit(1000), chunkMs = 100,
        overlapMs = 50).as("c"))
      .select(size(col("c")).as("n"),
        element_at(col("c"), 1).as("first"))
      .head()
    assert(chunks.getInt(0) == 5)
    assert(chunks.getAs[Array[Byte]]("first").length == 200)
    // payload shorter than one chunk → no windows
    val none = media.toDF().filter(col("id") === 2L)
      .select(size(Multimodal.chunkAudio(col("payload"), lit(1000), 100, 50)).as("n"))
      .head().getInt(0)
    assert(none == 0)
  }

  test("frame sampling: stride-2 over 256-byte frames") {
    val n = media.toDF()
      .filter(col("id") === 1L) // 600 bytes → 2 frames → stride 2 keeps 1
      .select(size(Multimodal.sampleFrames(col("payload"), 256, 2)).as("n"))
      .head().getInt(0)
    assert(n == 1)
    val none = media.toDF()
      .filter(col("id") === 2L) // 4 bytes → no full frame
      .select(size(Multimodal.sampleFrames(col("payload"), 256, 2)).as("n"))
      .head().getInt(0)
    assert(none == 0)
  }
}
