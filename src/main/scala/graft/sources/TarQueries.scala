package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-contract queries for the WebDataset/tar shard source
  * ([[TarShards]]).
  *
  * Both queries round-trip the `documents` table through real tar bytes:
  * pack into 8 ustar shards in a scratch dir, scan the shards back, and
  * project values the DuckDB oracle recomputes directly from `documents`
  * — so a framing bug anywhere in the codec (octal fields, checksum,
  * 512-padding, trailer) surfaces as a hash mismatch on the full text
  * payload, not just on counts. Scratch lifecycle follows the TxQueries
  * pattern: lease for the query body, eager `localCheckpoint` to decouple
  * the returned frame from the shard files, release.
  */
object TarQueries {

  private def packDocs(s: SparkSession, dir: String, lease: String,
      withCls: Boolean): Unit = {
    import s.implicits._
    val members = Tables.load(s, dir, "documents")
      .select(col("doc_id").cast("long"), col("text"), col("lang"), col("source"))
      .as[(Long, String, String, String)]
      .flatMap { case (id, text, lang, source) =>
        val base = TarShards.Member((id % 8).toInt, f"$id%012d.txt",
          text.getBytes(StandardCharsets.UTF_8))
        if (withCls)
          Seq(base, TarShards.Member((id % 8).toInt, f"$id%012d.cls",
            s"$lang|$source".getBytes(StandardCharsets.UTF_8)))
        else Seq(base)
      }
    // pack() is eager (its manifest is localCheckpoint(true)-frozen), so
    // the shards are fully committed when this returns.
    TarShards.pack(members, lease): Unit
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Pack → scan → byte-exact payload recovery, keyed by the member
    // name round-tripped through the 100-byte header field.
    "q192_tar_roundtrip" -> { (s, dir) =>
      val lease = graft.core.ScratchDirs.lease("graft-tar-rt-")
      try {
        packDocs(s, dir, lease, withCls = false)
        TarShards.readMembers(s, lease)
          .select(
            regexp_extract(col("name"), "^([0-9]+)\\.txt$", 1)
              .cast("long").as("doc_id"),
            length(col("content")).cast("long").as("n_bytes"),
            col("content").cast("string").as("text"))
          .orderBy(col("doc_id"))
          .localCheckpoint(true)
      } finally graft.core.ScratchDirs.release(lease)
    },

    // Two components per key (`.txt` payload + `.cls` metadata) fold
    // into one WebDataset sample row via the ext→bytes map.
    "q193_webdataset_samples" -> { (s, dir) =>
      val lease = graft.core.ScratchDirs.lease("graft-tar-wds-")
      try {
        packDocs(s, dir, lease, withCls = true)
        TarShards.samples(TarShards.readMembers(s, lease))
          .select(
            col("key").cast("long").as("doc_id"),
            size(col("components")).as("n_components"),
            length(element_at(col("components"), "txt")).cast("long").as("txt_bytes"),
            element_at(col("components"), "cls").cast("string").as("cls"))
          .orderBy(col("doc_id"))
          .localCheckpoint(true)
      } finally graft.core.ScratchDirs.release(lease)
    }
  )

  val oracles: Map[String, String] = Map(
    "q192_tar_roundtrip" ->
      """SELECT doc_id,
        |  CAST(strlen(text) AS BIGINT) AS n_bytes,
        |  text
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q193_webdataset_samples" ->
      """SELECT doc_id,
        |  2 AS n_components,
        |  CAST(strlen(text) AS BIGINT) AS txt_bytes,
        |  lang || '|' || source AS cls
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
