package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

/** Real image codec — the JDK's bundled `javax.imageio` (PNG/JPEG/GIF/BMP),
  * no external libraries. This replaces the pixel-decode stub for image
  * payloads: [[Multimodal.extractFeatures]] routes image bytes through
  * [[decodeImage]] and only falls back to the synthetic byte histogram when
  * the payload is not a decodable image (e.g. the header-only container
  * bytes the q34/q35 corpus synthesizes, or a corrupt upload — a skip, not
  * a crash, per the reference's per-record isolation posture).
  *
  * Everything here is per-record, allocation-bounded, and executor-safe:
  * no AWT display resources (headless rasters only), no ImageIO disk cache
  * (`setUseCache(false)` — executors should not write temp files per
  * record), and readers are created per call, so no shared mutable state.
  */
object Codecs {

  ImageIO.setUseCache(false)

  /** Default decode ceiling: 32M pixels ≈ a 128 MB ARGB raster. A few KB
    * of compressed bytes can legally declare a multi-gigapixel image
    * (decompression bomb); on an executor that is an OOM, not an error
    * you can catch. The header carries the dimensions, so the bound is
    * checked BEFORE any pixel is inflated.
    */
  val DefaultMaxPixels: Long = 32L * 1024 * 1024

  /** Decode any ImageIO-supported container to a raster. None for bytes no
    * installed reader accepts (including truncated/header-only payloads)
    * and for images whose DECLARED dimensions exceed `maxPixels` — the
    * decompression-bomb guard reads only the header before deciding.
    */
  def decodeImage(bytes: Array[Byte], maxPixels: Long = DefaultMaxPixels): Option[BufferedImage] =
    try {
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
      val readers = ImageIO.getImageReaders(iis)
      if (!readers.hasNext) { iis.close(); None }
      else {
        val r = readers.next()
        try {
          r.setInput(iis)
          if (r.getWidth(0).toLong * r.getHeight(0) > maxPixels) None
          else Option(r.read(0))
        } finally {
          r.dispose()
          iis.close()
        }
      }
    } catch { case _: Exception => None }

  private def encodeRaster(
      width: Int, height: Int, rgbAt: (Int, Int) => Int, format: String): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        img.setRGB(x, y, rgbAt(x, y))
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, format, out)
    out.toByteArray
  }

  /** Encode a deterministic raster as a real PNG. `rgbAt(x, y)` returns
    * packed 0xRRGGBB. Used by the q77 round trip and specs; production
    * callers bring their own bytes.
    */
  def encodePng(width: Int, height: Int, rgbAt: (Int, Int) => Int): Array[Byte] =
    encodeRaster(width, height, rgbAt, "png")

  /** Encode the same deterministic raster as a real BMP — a genuinely
    * different container for the same pixels (both JDK-lossless), which
    * is what "re-encoded duplicate" means to a perceptual hash: the bytes
    * differ, the decoded raster (and so the fingerprint) must not.
    */
  def encodeBmp(width: Int, height: Int, rgbAt: (Int, Int) => Int): Array[Byte] =
    encodeRaster(width, height, rgbAt, "bmp")

  /** Per-channel pixel sums (R, G, B) — integer-exact, so an oracle can
    * recompute them with no floating-point tolerance at all.
    */
  def channelSums(img: BufferedImage): (Long, Long, Long) = {
    var (r, g, b) = (0L, 0L, 0L)
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val p = img.getRGB(x, y)
        r += (p >> 16) & 0xff
        g += (p >> 8) & 0xff
        b += p & 0xff
        x += 1
      }
      y += 1
    }
    (r, g, b)
  }

  /** Mean R/G/B in [0,1] — the decoded-image feature vector. */
  def meanRgb(img: BufferedImage): Array[Double] = {
    val (r, g, b) = channelSums(img)
    val n = img.getWidth.toLong * img.getHeight * 255L
    Array(r.toDouble / n, g.toDouble / n, b.toDouble / n)
  }

  /** Encode 16-bit signed mono PCM as a real RIFF/WAVE file. The WAV
    * container is a public format: RIFF header, `fmt ` chunk (PCM, mono,
    * 16-bit little-endian), `data` chunk. Used by the q78 round trip and
    * specs; production callers bring their own bytes.
    */
  def encodeWavPcm16(sampleRateHz: Int, samples: Array[Short]): Array[Byte] = {
    require(sampleRateHz > 0, s"bad sample rate $sampleRateHz")
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRateHz)
      .putInt(sampleRateHz * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Decode a WAV payload through the JDK's bundled `javax.sound.sampled`
    * codec. Some(sampleRateHz, samples) for 16-bit signed mono PCM; None
    * for anything an installed reader rejects (non-audio bytes, other
    * encodings) — fallback, not failure, mirroring [[decodeImage]].
    */
  def decodeWavPcm16(bytes: Array[Byte]): Option[(Int, Array[Short])] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.BufferedInputStream(new ByteArrayInputStream(bytes)))
      try {
        val fmt = in.getFormat
        val pcm16mono =
          fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
            fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1
        if (!pcm16mono) None
        else {
          val raw = in.readAllBytes()
          val order =
            if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
            else java.nio.ByteOrder.LITTLE_ENDIAN
          val shorts = new Array[Short](raw.length / 2)
          java.nio.ByteBuffer.wrap(raw).order(order).asShortBuffer().get(shorts)
          Some((fmt.getSampleRate.toInt, shorts))
        }
      } finally in.close()
    } catch { case _: Exception => None }

  /** Integer-exact PCM statistics: Σ|s| and strict zero crossings
    * (s(i-1)·s(i) < 0 — the strict product rule sidesteps sign-of-zero
    * ambiguity), so an oracle can recompute both with no tolerance.
    */
  def pcmStats(samples: Array[Short]): (Long, Long) = {
    var sumAbs = 0L
    var crossings = 0L
    var i = 0
    while (i < samples.length) {
      sumAbs += math.abs(samples(i).toLong)
      if (i > 0 && samples(i - 1).toLong * samples(i).toLong < 0L) crossings += 1
      i += 1
    }
    (sumAbs, crossings)
  }

  /** 256-level grayscale palette: GIF is an indexed-color format, so an
    * explicit identity gray palette makes the round trip LOSSLESS (the
    * default writer path would quantize RGB and break exact oracles).
    */
  private lazy val grayPalette: java.awt.image.IndexColorModel = {
    val g = Array.tabulate(256)(_.toByte)
    new java.awt.image.IndexColorModel(8, 256, g, g, g)
  }

  /** Encode frames as a real multi-image (animated) GIF via the JDK's
    * bundled GIF writer. `grayAt(frame, x, y)` returns 0..255. All frames
    * are full rasters at (0,0) — no partial-frame composition.
    */
  /** One GIF writer per executor thread: `ImageIO.getImageWritersBySuffix`
    * walks the (synchronized) global SPI registry, and writer instances
    * are stateful but reusable after `reset()` — per-record lookup was a
    * measured hot spot on decode-heavy corpora.
    */
  private val gifWriter = new ThreadLocal[javax.imageio.ImageWriter] {
    override def initialValue(): javax.imageio.ImageWriter =
      ImageIO.getImageWritersBySuffix("gif").next()
  }

  def encodeGifAnimated(width: Int, height: Int, frames: Int,
                        grayAt: (Int, Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0 && frames > 0, s"bad shape ${width}x$height x$frames")
    // GIF stores dimensions as u16: a 70000-wide raster would silently
    // wrap to 4464 in the descriptor and decode with the wrong shape.
    require(width <= 0xffff && height <= 0xffff,
      s"GIF dimensions are 16-bit; got ${width}x$height")
    val writer = gifWriter.get()
    val out = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(out)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      // All frames share dimensions and palette, so the per-image
      // metadata is built ONCE per file, not once per frame (the DOM
      // round trip below is the expensive part of an encode). The
      // writer's DEFAULT sequence metadata sets interlaceFlag=TRUE, and
      // the JDK's interlaced round trip scrambles rows on frames shorter
      // than the 8-row interlace stride — store progressive.
      var meta: javax.imageio.metadata.IIOMetadata = null
      for (f <- 0 until frames) {
        val img = new BufferedImage(width, height,
          BufferedImage.TYPE_BYTE_INDEXED, grayPalette)
        val raster = img.getRaster
        var y = 0
        while (y < height) {
          var x = 0
          while (x < width) {
            raster.setSample(x, y, 0, grayAt(f, x, y) & 0xff)
            x += 1
          }
          y += 1
        }
        if (meta == null) {
          meta = writer.getDefaultImageMetadata(
            new javax.imageio.ImageTypeSpecifier(img), writer.getDefaultWriteParam)
          val fmt = meta.getNativeMetadataFormatName
          val root = meta.getAsTree(fmt).asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
          val descs = root.getElementsByTagName("ImageDescriptor")
          if (descs.getLength > 0)
            descs.item(0).asInstanceOf[org.w3c.dom.Element]
              .setAttribute("interlaceFlag", "FALSE")
          meta.setFromTree(fmt, root)
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, meta), null)
      }
      writer.endWriteSequence()
    } finally {
      ios.close()
      writer.reset() // reusable; dispose() would kill the thread-local
    }
    out.toByteArray
  }

  /** Decode every frame of a GIF through the JDK reader. None for bytes no
    * GIF reader accepts and for files whose summed DECLARED frame area
    * exceeds `maxPixels` (the bomb guard, checked from headers before any
    * frame inflates). Frames are returned as stored; callers with wild
    * GIFs (partial frames, disposal methods) must compose — the engine's
    * synthesized corpora store full frames.
    */
  def decodeGifFrames(bytes: Array[Byte],
                      maxPixels: Long = DefaultMaxPixels): Option[IndexedSeq[BufferedImage]] =
    try {
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
      val readers = ImageIO.getImageReaders(iis)
      if (!readers.hasNext) { iis.close(); None }
      else {
        val r = readers.next()
        try {
          r.setInput(iis)
          val n = r.getNumImages(true)
          val declared = (0 until n).iterator
            .map(i => r.getWidth(i).toLong * r.getHeight(i)).sum
          if (n <= 0 || declared > maxPixels) None
          else Some((0 until n).map(r.read))
        } finally {
          r.dispose()
          iis.close()
        }
      }
    } catch { case _: Exception => None }

  /** Integer-exact frame statistics for a gray frame sequence: total
    * luminance Σgray over all frames and total motion Σ|Δgray| between
    * consecutive frames — both oracle-recomputable with zero tolerance.
    *
    * Wild GIFs may store PARTIAL frames (smaller rasters composited at an
    * offset); motion compares only the overlapping region of consecutive
    * frames, so mismatched dimensions degrade the statistic instead of
    * throwing inside an executor task.
    */
  def frameStats(frames: Seq[BufferedImage]): (Long, Long) = {
    // Integer Rec.601 luminance: (299R + 587G + 114B) / 1000. The weights
    // sum to exactly 1000, so for the gray frames this module encodes
    // (R = G = B = palette index) this IS the palette value, bit-exact —
    // while wild COLOR frames get real luminance instead of silently
    // reading the blue channel.
    def gray(img: BufferedImage, x: Int, y: Int): Long = {
      val p = img.getRGB(x, y)
      (299L * ((p >> 16) & 0xff) + 587L * ((p >> 8) & 0xff) + 114L * (p & 0xff)) / 1000L
    }
    var sumGray = 0L
    var motion = 0L
    for (f <- frames.indices) {
      val cur = frames(f)
      for (y <- 0 until cur.getHeight; x <- 0 until cur.getWidth)
        sumGray += gray(cur, x, y)
      if (f > 0) {
        val prev = frames(f - 1)
        val w = math.min(cur.getWidth, prev.getWidth)
        val h = math.min(cur.getHeight, prev.getHeight)
        for (y <- 0 until h; x <- 0 until w)
          motion += math.abs(gray(cur, x, y) - gray(prev, x, y))
      }
    }
    (sumGray, motion)
  }

  /** Raster resize (bilinear) — real pixels in, real pixels out. */
  def resize(img: BufferedImage, width: Int, height: Int): BufferedImage = {
    val out = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    val g = out.createGraphics()
    try {
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, width, height, null)
    } finally g.dispose()
    out
  }
}
