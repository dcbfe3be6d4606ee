package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — dataset versioning for training-data ops:
  * given two snapshots of an id-keyed corpus, classify every id as
  * `added` / `removed` / `changed` / `unchanged`. This is the audit step
  * between two crawl drops or curation runs ("what changed since the mix
  * we trained on?") and feeds incremental processing: only `added` +
  * `changed` need re-scoring/re-indexing (`IncrementalIngest`,
  * `SemDedup.probe`).
  *
  * Scale shape: each snapshot reduces to (id, 128-bit content
  * signature) at the scan — the full-outer equi-join on id shuffles 24
  * bytes per row, never document text. Content equality is a signature
  * PAIR (two independently-seeded xxhash64s, the `IncrementalIngest`
  * corpus-stage idiom): a collision — which would take ~2⁶⁴ documents by
  * the birthday bound — could only mis-read a changed document as
  * unchanged, and can never corrupt the added/removed classification
  * (those depend on id presence alone).
  */
object CorpusDiff {

  private def sig1(cols: Seq[Column]): Column = xxhash64(cols: _*)
  private def sig2(cols: Seq[Column]): Column =
    xxhash64(lit("graft-diff2") +: cols: _*)

  /** (idCol, status) over the union of both snapshots' ids, one row per
    * id. `contentCols` define document identity for the changed check.
    */
  def diff(
      oldDf: DataFrame,
      newDf: DataFrame,
      idCol: String,
      contentCols: Seq[String]
  ): DataFrame = {
    def sigs(df: DataFrame, p: String): DataFrame = {
      val cs = contentCols.map(df(_))
      df.select(col(idCol).as("id"),
        sig1(cs).as(s"${p}1"), sig2(cs).as(s"${p}2"))
    }
    sigs(oldDf, "o").join(sigs(newDf, "n"), Seq("id"), "full_outer")
      .select(
        col("id").as(idCol),
        when(col("o1").isNull, lit("added"))
          .when(col("n1").isNull, lit("removed"))
          .when(col("o1") =!= col("n1") || col("o2") =!= col("n2"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
  }
}
