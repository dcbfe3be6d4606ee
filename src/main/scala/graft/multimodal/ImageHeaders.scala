package graft.multimodal

/** Real image-container header codecs — the non-stubbed half of the
  * multimodal decode story. Both formats are public specifications:
  *
  *  - PNG (RFC 2083 / W3C): 8-byte signature `89 50 4E 47 0D 0A 1A 0A`,
  *    then chunks of (length u32 BE, type 4 ASCII, data, CRC32 of
  *    type+data). The first chunk MUST be IHDR: width u32, height u32,
  *    bit depth u8, color type u8 (0 grey, 2 truecolor, 3 palette,
  *    4 grey+alpha, 6 truecolor+alpha), compression, filter, interlace.
  *  - JPEG/JFIF (ITU T.81): `FF D8` (SOI), then `FF xx` marker segments
  *    with u16 BE payload lengths (length includes itself); frame
  *    dimensions live in the first SOFn segment (C0-CF minus C4 DHT,
  *    C8 JPG, CC DAC): precision u8, height u16, width u16, component
  *    count u8.
  *
  * [[decode]] parses real files (MultimodalSpec proves it on a golden
  * real-world PNG literal); [[pngBytes]]/[[jpegBytes]] emit header-valid
  * byte structures (true CRCs, true marker framing, no pixel payload)
  * used to synthesize test media whose metadata must round-trip through
  * the parser. Pixel decoding stays out of scope — this container ships
  * no codecs — so feature extraction keeps its documented stub.
  */
object ImageHeaders {

  final case class ImageMeta(format: String, widthPx: Int, heightPx: Int, channels: Int)

  private val PngSig: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Sniff the container from magic bytes and parse its header. */
  def decode(bytes: Array[Byte]): Option[ImageMeta] =
    decodePng(bytes).orElse(decodeJpeg(bytes))

  /** Full 8-byte PNG signature check — the single owner of "is a PNG". */
  def isPng(b: Array[Byte]): Boolean =
    b.length >= 8 && (0 until 8).forall(i => b(i) == PngSig(i))

  /** JPEG SOI marker check — the single owner of "is a JPEG". */
  def isJpeg(b: Array[Byte]): Boolean =
    b.length >= 2 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8

  /** PNG: signature + IHDR (must be the first chunk, per spec). */
  def decodePng(b: Array[Byte]): Option[ImageMeta] = {
    if (b.length < 33) return None
    var i = 0
    while (i < 8) { if (b(i) != PngSig(i)) return None; i += 1 }
    if (be32(b, 8) != 13) return None // IHDR data length
    if (!(b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')) return None
    val w = be32(b, 16)
    val h = be32(b, 20)
    val channels = (b(25) & 0xff) match {
      case 0 => 1 // greyscale
      case 2 => 3 // truecolor
      case 3 => 1 // palette index
      case 4 => 2 // grey + alpha
      case 6 => 4 // truecolor + alpha
      case _ => return None
    }
    if (w <= 0 || h <= 0) None else Some(ImageMeta("png", w, h, channels))
  }

  /** JPEG: walk the marker stream from SOI to the first SOFn. Returns
    * None on framing loss, SOS/EOI before any frame header, or
    * truncation — never throws on hostile bytes.
    */
  def decodeJpeg(b: Array[Byte]): Option[ImageMeta] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
    var i = 2
    while (i + 1 < b.length) {
      if ((b(i) & 0xff) != 0xff) return None
      var m = b(i + 1) & 0xff
      while (m == 0xff && i + 2 < b.length) { i += 1; m = b(i + 1) & 0xff } // fill bytes
      if (m == 0xd9 || m == 0xda) return None // EOI / SOS before SOF
      if ((m >= 0xd0 && m <= 0xd7) || m == 0x01) { i += 2 } // standalone RSTn/TEM
      else {
        if (i + 3 >= b.length) return None
        val len = be16(b, i + 2)
        if (len < 2) return None
        val isSof = m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc
        if (isSof) {
          if (i + 9 >= b.length) return None
          val h = be16(b, i + 5)
          val w = be16(b, i + 7)
          val nComp = b(i + 9) & 0xff
          return if (w > 0 && h > 0) Some(ImageMeta("jpeg", w, h, nComp)) else None
        }
        i += 2 + len
      }
    }
    None
  }

  /** Header-valid PNG bytes: signature + IHDR + IEND, real CRC32s, no
    * pixel data (45 bytes total). colorType 2 = 8-bit truecolor (3
    * channels).
    */
  def pngBytes(width: Int, height: Int, colorType: Int = 2): Array[Byte] = {
    require(width > 0 && height > 0, "PNG dimensions must be positive")
    val ihdrData = new java.io.ByteArrayOutputStream()
    writeBe32(ihdrData, width)
    writeBe32(ihdrData, height)
    ihdrData.write(8)         // bit depth
    ihdrData.write(colorType)
    ihdrData.write(0); ihdrData.write(0); ihdrData.write(0) // compr/filter/interlace
    val out = new java.io.ByteArrayOutputStream()
    out.write(PngSig, 0, PngSig.length)
    writeChunk(out, "IHDR", ihdrData.toByteArray)
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Header-valid JPEG bytes: SOI + SOF0 (baseline, 8-bit, `nComponents`
    * components with standard 1x1 sampling) + EOI (23 bytes for 3
    * components). Dimensions are u16 per the format.
    */
  def jpegBytes(width: Int, height: Int, nComponents: Int = 3): Array[Byte] = {
    require(width > 0 && width <= 0xffff && height > 0 && height <= 0xffff,
      "JPEG dimensions must fit u16")
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8) // SOI
    out.write(0xff); out.write(0xc0) // SOF0
    val segLen = 8 + 3 * nComponents
    out.write(segLen >> 8); out.write(segLen & 0xff)
    out.write(8) // precision
    out.write(height >> 8); out.write(height & 0xff)
    out.write(width >> 8); out.write(width & 0xff)
    out.write(nComponents)
    var c = 1
    while (c <= nComponents) {
      out.write(c)    // component id
      out.write(0x11) // 1x1 sampling
      out.write(0)    // quant table id
      c += 1
    }
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) | ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  private def writeBe32(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write((v >>> 24) & 0xff); out.write((v >>> 16) & 0xff)
    out.write((v >>> 8) & 0xff); out.write(v & 0xff)
  }

  private def writeChunk(out: java.io.ByteArrayOutputStream, typ: String, data: Array[Byte]): Unit = {
    writeBe32(out, data.length)
    val typeBytes = typ.getBytes("US-ASCII")
    out.write(typeBytes, 0, 4)
    out.write(data, 0, data.length)
    val crc = new java.util.zip.CRC32()
    crc.update(typeBytes)
    crc.update(data)
    writeBe32(out, crc.getValue.toInt)
  }
}
