package graft.multimodal

import java.awt.image.BufferedImage

/** Perceptual image fingerprints — the composition point between the
  * multimodal pillar (real pixel decode, [[Codecs.decodeImage]]) and the
  * dedup pillar: a 64-bit dHash rides [[graft.dedup.SimHash.nearPairs]]'s
  * Hamming-band machinery unchanged (the chunk join never cares where the
  * 64 bits came from), which is how image near-dup inherits the proven
  * one-shuffle discovery path instead of growing a second one.
  *
  * dHash (difference hash): average luminance over a 9×8 grid, one bit
  * per horizontally-adjacent cell comparison. Resize-invariant by
  * construction — averaging first makes the fingerprint a function of the
  * IMAGE CONTENT at 9×8 resolution, not of the pixel count — and
  * container-invariant because it runs on the decoded raster (PNG vs BMP
  * vs JPEG-lossless of the same pixels hash identically).
  *
  * The box filter uses exact integer sums and the cell comparison
  * cross-multiplies instead of dividing, so there is no float rounding
  * anywhere: two rasters whose per-cell mean luminances are equal (e.g. a
  * grid-aligned upscale) produce bit-identical hashes.
  */
object PerceptualHash {

  /** 64-bit dHash of a decoded raster: 9 columns × 8 rows of mean
    * Rec.601 luminance (the [[Codecs]] integer convention), bit (r*8+c)
    * set when cell (c+1, r) is strictly brighter than cell (c, r).
    * Images smaller than the grid still hash (empty cells average 0).
    */
  def dHash(img: BufferedImage): Long = {
    val cols = 9
    val rows = 8
    val w = img.getWidth
    val h = img.getHeight
    // exact per-cell luminance sums + pixel counts
    val sums = Array.ofDim[Long](rows, cols)
    val counts = Array.ofDim[Long](rows, cols)
    var y = 0
    while (y < h) {
      val cy = math.min(y * rows / h, rows - 1)
      var x = 0
      while (x < w) {
        val cx = math.min(x * cols / w, cols - 1)
        val rgb = img.getRGB(x, y)
        val lum = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
          114 * (rgb & 0xff)) / 1000
        sums(cy)(cx) += lum
        counts(cy)(cx) += 1
        x += 1
      }
      y += 1
    }
    var bits = 0L
    var r = 0
    while (r < rows) {
      var c = 0
      while (c < cols - 1) {
        // mean(c+1) > mean(c) without division: cross-multiply the sums
        val na = math.max(counts(r)(c), 1L)
        val nb = math.max(counts(r)(c + 1), 1L)
        if (sums(r)(c + 1) * na > sums(r)(c) * nb)
          bits |= 1L << (r * 8 + c)
        c += 1
      }
      r += 1
    }
    bits
  }

  /** 64-bit perceptual fingerprint of a PCM clip — the audio analogue of
    * [[dHash]] (and the same downstream: the 64 bits ride
    * `SimHash.nearPairs` unchanged). The clip is cut into 65 equal-time
    * slices (index-proportional, so the fingerprint is a function of the
    * signal's SHAPE, not its sample count) and bit i compares mean
    * |amplitude| of slice i+1 against slice i — the sign-of-energy-delta
    * construction (Haitsma–Kalker '02 reduced to time-domain band 0).
    * Exact integer sums with cross-multiplied mean comparisons, so the
    * hash is bit-identical under exact volume scaling (every energy
    * scales by the same factor) and under slice-aligned resampling
    * (sample duplication / decimation that preserves per-slice means).
    */
  def audioHash(samples: Array[Short]): Long = {
    val slices = 65
    val n = samples.length
    if (n == 0) return 0L
    val sums = new Array[Long](slices)
    val counts = new Array[Long](slices)
    var i = 0
    while (i < n) {
      val s = math.min((i.toLong * slices / n).toInt, slices - 1)
      sums(s) += math.abs(samples(i).toLong)
      counts(s) += 1
      i += 1
    }
    var bits = 0L
    var b = 0
    while (b < 64) {
      val na = math.max(counts(b), 1L)
      val nb = math.max(counts(b + 1), 1L)
      if (sums(b + 1) * na > sums(b) * nb) bits |= 1L << b
      b += 1
    }
    bits
  }

  /** 64-bit perceptual fingerprint of a frame sequence: per-frame
    * [[dHash]] bits combined by STRICT per-bit majority vote (bit set
    * when more than half the frames set it) — temporal SimHash over the
    * spatial hashes. Inherits dHash's resize/re-encode invariance per
    * frame, and the strict-majority rule is invariant under uniform
    * frame duplication (slow motion: every count and the total scale
    * together), which is the temporal analogue of grid-aligned resize.
    */
  def videoHash(frames: Seq[java.awt.image.BufferedImage]): Long = {
    val n = frames.size
    if (n == 0) return 0L
    val counts = new Array[Int](64)
    frames.foreach { f =>
      val h = dHash(f)
      var b = 0
      while (b < 64) {
        if ((h >>> b & 1L) == 1L) counts(b) += 1
        b += 1
      }
    }
    var bits = 0L
    var b = 0
    while (b < 64) {
      if (2 * counts(b) > n) bits |= 1L << b
      b += 1
    }
    bits
  }

  /** Deterministic per-(image, cell) luminance for synthetic corpora:
    * splitmix64-style avalanche so distinct images land ~32 bits apart
    * (no accidental near-pairs) while every rendering of the SAME id —
    * any grid-aligned resolution, any lossless container — shares its
    * 9×8 cell structure exactly.
    */
  def cellPattern(id: Long, cx: Int, cy: Int): Int = {
    var z = id * 0x9e3779b97f4a7c15L + cx * 0xbf58476d1ce4e5b9L + cy * 0x94d049bb133111ebL
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    ((z ^ (z >>> 31)) & 0xffL).toInt
  }
}
