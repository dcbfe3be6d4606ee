package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Driver-contract queries for the multimodal plumbing, over a media table
  * synthesized deterministically from `documents` (payload = UTF-8 text
  * bytes). The schema/partitioning/batching is the real contract; only the
  * codec inside [[Multimodal.extractFeatures]] is stubbed.
  */
object MultimodalQueries {

  private def media(s: SparkSession, dir: String) =
    Multimodal.mediaFromDocuments(Tables.load(s, dir, "documents"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Metadata + payload accounting + frame-sampling plumbing, all
    // SQL-expressible: per media kind, payload byte totals and the frame
    // count a stride-2 sampler of 256-byte frames would produce.
    "q34_multimodal_meta" -> { (s, dir) =>
      media(s, dir).toDF()
        .withColumn("n_frames",
          size(Multimodal.sampleFrames(col("payload"), frameBytes = 256, stride = 2)))
        .groupBy(col("meta.kind").as("kind"))
        .agg(
          count(lit(1)).as("n_media"),
          sum(length(col("payload"))).as("total_bytes"),
          sum(col("n_frames")).as("total_frames"))
        .orderBy("kind")
    },

    // Feature extraction through the partition-batched decode stub. The
    // stub is a normalized byte histogram, so the contract IS
    // SQL-expressible: n_bytes = octet_length(payload) and feature_sum =
    // 1.0 for any non-empty payload (6-dp rounding absorbs fp summation
    // error) — a full DuckDB oracle over the mapPartitions path.
    "q35_multimodal_features" -> { (s, dir) =>
      import s.implicits._
      Multimodal.extractFeatures(media(s, dir), targetPartitions = 8)
        .toDF()
        .select(
          col("id"),
          col("kind"),
          col("nBytes").as("n_bytes"),
          round(aggregate(col("features"), lit(0.0), (a, x) => a + x), 6).as("feature_sum"))
        .orderBy("id")
    }
  )

  val oracles: Map[String, String] = Map(
    "q34_multimodal_meta" ->
      """WITH m AS (
        |  SELECT
        |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END kind,
        |    octet_length(encode(text)) nb
        |  FROM documents)
        |SELECT kind, count(*) AS n_media, sum(nb)::BIGINT AS total_bytes,
        |  sum(CASE WHEN nb >= 256 THEN (nb // 256 - 1) // 2 + 1 ELSE 0 END)::BIGINT AS total_frames
        |FROM m GROUP BY kind ORDER BY kind""".stripMargin,

    // The decode stub is a normalized byte histogram: its sum is exactly
    // 1.0 for non-empty payloads (0.0 for empty) and n_bytes is the
    // payload length — both computable by DuckDB from the same documents
    // table the media set is synthesized from.
    "q35_multimodal_features" ->
      """SELECT doc_id AS id,
        |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END kind,
        |  octet_length(encode(text))::INT AS n_bytes,
        |  round(CASE WHEN octet_length(encode(text)) > 0 THEN 1.0 ELSE 0.0 END, 6)::DOUBLE
        |    AS feature_sum
        |FROM documents ORDER BY id""".stripMargin
  )
}
