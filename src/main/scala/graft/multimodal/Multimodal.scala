package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: images/audio/video ride through the engine
  * as opaque `binary` payloads with a typed metadata struct, and
  * decode/feature-extract runs as partition-local batch functions.
  *
  * Container HEADER decoding is real — [[ImageHeaders]] parses PNG
  * signature+IHDR and JPEG SOFn markers from actual bytes — and IMAGE
  * pixel decoding is real too: [[Codecs]] runs the JDK's bundled ImageIO
  * (PNG/JPEG/GIF/BMP), so image features are mean-RGB over actual decoded
  * rasters (q77 pins this against a DuckDB recompute of the pixel
  * formula). Only AUDIO/VIDEO feature extraction remains a STUB — the JDK
  * ships no general audio/video codec and this container has none — with
  * the real contract around it: the schema, the partition-batched
  * execution shape (`mapPartitions` over an iterator, the Scala analogue
  * of `mapInPandas` batches), deterministic stand-in features, and the
  * repartition sizing so one task never holds more than a bounded number
  * of payloads in flight.
  */
object Multimodal {

  /** Typed media metadata — the non-opaque half of a media column. */
  final case class MediaMeta(
      kind: String, // image | audio | video | text
      widthPx: Int,
      heightPx: Int,
      sampleRateHz: Int,
      durationMs: Long)

  final case class MediaRecord(id: Long, meta: MediaMeta, payload: Array[Byte])

  /** Extracted feature row; `features` is the model-input vector. */
  final case class MediaFeatures(
      id: Long,
      kind: String,
      nBytes: Int,
      features: Array[Double])

  val mediaSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("kind", StringType, nullable = false),
      StructField("widthPx", IntegerType, nullable = false),
      StructField("heightPx", IntegerType, nullable = false),
      StructField("sampleRateHz", IntegerType, nullable = false),
      StructField("durationMs", LongType, nullable = false))), nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  /** Per-record feature function — every modality decodes through a REAL
    * JDK codec when the bytes allow it. IMAGE via [[Codecs.decodeImage]]
    * (ImageIO — PNG/JPEG/GIF/BMP) into mean-RGB; AUDIO via
    * [[Codecs.decodeWavPcm16]] (javax.sound.sampled — WAV/PCM) into
    * [mean |amplitude| in [0,1], zero-crossing rate]; VIDEO via
    * [[Codecs.decodeGifFrames]] (multi-frame GIF — the one video-shaped
    * container the JDK both reads and writes) into [mean gray in [0,1],
    * inter-frame motion rate]. Undecodable bytes (truncated containers,
    * corrupt uploads, codecs the JDK lacks — e.g. H.264) fall back to the
    * byte-histogram stand-in instead of failing the task — per-record
    * isolation, like the reference's per-file skips.
    */
  private def features(kind: String, payload: Array[Byte]): Array[Double] = kind match {
    case "image" =>
      // Tiny payloads that carry no pixel-data marker (PNG IDAT / JPEG
      // SOS) can never decode — skip straight to the stand-in instead of
      // paying reader setup + a thrown IIOException per record (the
      // header-only corpora q34/q35 synthesize are exactly this shape).
      // Payloads past the size cap skip the scan and just attempt decode.
      if (payload.length < 256 && !hasPixelDataMarker(payload)) decodeStub(payload)
      else Codecs.decodeImage(payload).map(Codecs.meanRgb).getOrElse(decodeStub(payload))
    case "audio" =>
      Codecs.decodeWavPcm16(payload).map { case (_, samples) =>
        val (sumAbs, crossings) = Codecs.pcmStats(samples)
        val n = math.max(samples.length, 1).toDouble
        Array(sumAbs / (n * 32768.0), crossings / n)
      }.getOrElse(decodeStub(payload))
    case "video" =>
      Codecs.decodeGifFrames(payload).map { frames =>
        val (sumGray, motion) = Codecs.frameStats(frames)
        val totalPx = frames.iterator.map(f => f.getWidth.toLong * f.getHeight).sum
        val deltaPx = totalPx - frames.head.getWidth.toLong * frames.head.getHeight
        Array(sumGray / (totalPx * 255.0),
          if (deltaPx > 0) motion / (deltaPx * 255.0) else 0.0)
      }.getOrElse(decodeStub(payload))
    case _ => decodeStub(payload)
  }

  /** True when a PNG payload contains an IDAT chunk or a JPEG payload a
    * SOS (start-of-scan) marker — the sections actual pixel data lives
    * in. Non-PNG/JPEG bytes return true (other containers are cheap for
    * the decoder itself to refuse).
    */
  private def hasPixelDataMarker(payload: Array[Byte]): Boolean =
    if (ImageHeaders.isPng(payload))
      payload.sliding(4).exists(w =>
        w.length == 4 && w(0) == 'I' && w(1) == 'D' && w(2) == 'A' && w(3) == 'T')
    else if (ImageHeaders.isJpeg(payload))
      payload.sliding(2).exists(w =>
        w.length == 2 && (w(0) & 0xff) == 0xff && (w(1) & 0xff) == 0xda)
    else true

  /** ??? in spirit for the NON-image modalities: where a real codec
    * (ffmpeg frame grab, fbank front-end) would run. STUB: a deterministic
    * 8-bin byte histogram, normalized — stands in for a decoded-then-pooled
    * feature vector and keeps every test reproducible.
    */
  private def decodeStub(payload: Array[Byte]): Array[Double] = {
    val hist = new Array[Double](8)
    var i = 0
    while (i < payload.length) {
      hist((payload(i) & 0xff) >> 5) += 1.0
      i += 1
    }
    val n = math.max(payload.length, 1).toDouble
    hist.map(_ / n)
  }

  /** Feature extraction over a media dataset: partition-local batches,
    * bounded in-flight payload count via repartition on id. The iterator
    * shape means payloads stream through one at a time — a task never
    * materializes its whole partition.
    */
  def extractFeatures(media: Dataset[MediaRecord], targetPartitions: Int = 0): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    val sized =
      if (targetPartitions > 0) media.repartition(targetPartitions, col("id"))
      else media
    sized.mapPartitions { it =>
      it.map { r =>
        MediaFeatures(r.id, r.meta.kind, r.payload.length, features(r.meta.kind, r.payload))
      }
    }
  }

  /** Feature extraction in FIXED-SIZE BATCHES — the execution shape real
    * model inference needs (a GPU encoder wants dozens-to-hundreds of
    * payloads per forward pass, not one). `grouped(batchSize)` hands the
    * stub whole batches while still streaming the partition iterator:
    * at most one batch of payloads is materialized per task at a time.
    * The stub applies the per-record decode; a real implementation
    * replaces exactly the inner function with a batched model call.
    */
  def extractFeaturesBatched(
      media: Dataset[MediaRecord],
      batchSize: Int = 64
  ): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // ??? in spirit: one batched model forward pass would run here.
        batch.map(r =>
          MediaFeatures(r.id, r.meta.kind, r.payload.length, features(r.meta.kind, r.payload)))
      }
    }
  }

  /** Audio chunking for audio-kind payloads: fixed-duration windows with
    * overlap, as binary slices (what a real feature front-end — fbank,
    * wav2vec windows — consumes). Byte math assumes 16-bit mono PCM at
    * `sampleRateHz`. Pure Column expression — no driver loop.
    */
  def chunkAudio(
      payload: org.apache.spark.sql.Column,
      sampleRateHz: org.apache.spark.sql.Column,
      chunkMs: Int,
      overlapMs: Int = 0
  ): org.apache.spark.sql.Column = {
    require(overlapMs < chunkMs, "overlap must be smaller than the chunk")
    // Whole SAMPLES first, bytes = samples × 2: truncating fractional
    // bytes-per-ms directly (e.g. 44100 Hz × 25 ms = 2205 B) yields odd
    // byte counts that split a 16-bit sample across the boundary and
    // byte-swap every window after the first.
    def samplesToBytes(ms: Int) =
      (floor(sampleRateHz * lit(ms) / 1000).cast("int") * 2).cast("int")
    val chunkBytes = samplesToBytes(chunkMs)
    val strideBytes = samplesToBytes(chunkMs - overlapMs)
    val nChunks = floor((length(payload) - chunkBytes).cast("double") / strideBytes).cast("int") + 1
    when(length(payload) >= chunkBytes,
      transform(
        sequence(lit(0), nChunks - 1),
        i => substring(payload, (i * strideBytes + 1).cast("int"), chunkBytes)))
      .otherwise(array().cast("array<binary>"))
  }

  /** Frame sampling for video-kind payloads: every `stride`-th fixed-size
    * chunk, as an array of binary slices (the plumbing a real frame
    * grabber would feed). Pure Column expression — no driver loop.
    */
  def sampleFrames(payload: org.apache.spark.sql.Column, frameBytes: Int, stride: Int): org.apache.spark.sql.Column = {
    val nFrames = floor(length(payload) / lit(frameBytes)).cast("int")
    when(nFrames > 0,
      transform(
        sequence(lit(0), nFrames - 1, lit(stride)),
        i => substring(payload, (i * frameBytes + 1).cast("int"), lit(frameBytes))))
      .otherwise(array().cast("array<binary>"))
  }

  /** Synthesize a media table from the documents table. Image-kind rows
    * (doc_id % 3 == 0) carry REAL container bytes — PNG for doc_id % 6
    * == 0, JPEG otherwise, built by [[ImageHeaders]] with true
    * signature/chunk/marker framing and dimensions derived from the doc
    * (width = n_chars % 1000 + 1, height = doc_id % 500 + 1) — and
    * their metadata comes from actually PARSING those bytes back
    * ([[ImageHeaders.decode]]), so a header-codec bug shows up as a
    * metadata mismatch, not a silently-copied constant. Audio/video
    * payloads stay UTF-8 text bytes (no real container), width/height 0.
    */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    import docs.sparkSession.implicits._
    docs
      .select(col("doc_id"), col("text"), col("n_chars").cast("long"))
      .as[(Long, String, Long)]
      .map { case (id, text, nChars) =>
        val kind = (id % 3) match {
          case 0 => "image"
          case 1 => "audio"
          case _ => "video"
        }
        val payload =
          if (kind == "image") {
            val w = (nChars % 1000 + 1).toInt
            val h = (id % 500 + 1).toInt
            if (id % 6 == 0) ImageHeaders.pngBytes(w, h)
            else ImageHeaders.jpegBytes(w, h)
          } else text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val (wPx, hPx) =
          if (kind == "image") {
            val m = ImageHeaders.decode(payload).getOrElse(throw new IllegalStateException(
              s"synthesized image payload failed to parse for id=$id"))
            (m.widthPx, m.heightPx)
          } else (0, 0)
        MediaRecord(id, MediaMeta(kind, wPx, hPx, 16000, nChars * 10), payload)
      }
  }
}
