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

  /** Decode any ImageIO-supported container to a raster. None for bytes no
    * installed reader accepts (including truncated/header-only payloads).
    */
  def decodeImage(bytes: Array[Byte]): Option[BufferedImage] =
    try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
    catch { case _: Exception => None }

  /** Encode a deterministic raster as a real PNG. `rgbAt(x, y)` returns
    * packed 0xRRGGBB. Used by the q77 round trip and specs; production
    * callers bring their own bytes.
    */
  def encodePng(width: Int, height: Int, rgbAt: (Int, Int) => Int): Array[Byte] = {
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
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

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
