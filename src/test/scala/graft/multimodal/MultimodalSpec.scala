package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Multimodal.mediaFromDocuments(
    Seq((1L, "hello world", 11L), (2L, "tiny", 4L), (3L, "x" * 600, 600L))
      .toDF("doc_id", "text", "n_chars"))

  test("media synthesis: kind cycles by id, payload is the UTF-8 text") {
    val rows = media.collect().map(r => r.id -> r).toMap
    assert(rows(1L).meta.kind == "audio")
    assert(rows(2L).meta.kind == "video")
    assert(rows(3L).meta.kind == "image")
    assert(new String(rows(1L).payload, "UTF-8") == "hello world")
  }

  test("feature extraction: byte counts exact, stub histogram sums to 1") {
    val feats = Multimodal.extractFeatures(media, targetPartitions = 2)
      .collect().map(f => f.id -> f).toMap
    assert(feats(1L).nBytes == 11)
    assert(feats(3L).nBytes == 600)
    assert(feats(1L).features.length == 8)
    assert(math.abs(feats(1L).features.sum - 1.0) < 1e-9)
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
      .filter(col("id") === 3L)
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
      .filter(col("id") === 3L) // 600 bytes → 2 frames → stride 2 keeps 1
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
