package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Footer-level storage audit (q181): the stats must agree with the data
  * the files actually hold, across files and row groups, without ever
  * scanning a data page.
  */
class StorageAuditSpec extends SparkSpec {
  import spark.implicits._

  private def fixture(dir: String): String = {
    val df = (1L to 1000L).map { i =>
      (i, if (i % 5 == 0) null else s"name_$i", i.toDouble / 7.0)
    }.toDF("id", "name", "score")
    val path = s"$dir/audit.parquet"
    df.repartition(3).write.mode("overwrite").parquet(path)
    path
  }

  test("footer stats agree with the data: values, nulls, files; bytes are real") {
    val dir = java.nio.file.Files.createTempDirectory("graft-audit-").toString
    try {
      val path = fixture(dir)
      val stats = StorageAudit.footerStats(spark, path).collect()
      val byCol = stats.groupBy(_.getString(2))
      assert(byCol.keySet == Set("id", "name", "score"))
      byCol.foreach { case (c, rows) =>
        assert(rows.map(_.getLong(3)).sum == 1000L, s"$c value count")
        val nulls = rows.map(_.getLong(4)).sum
        assert(nulls == (if (c == "name") 200L else 0L), s"$c null count $nulls")
        assert(rows.forall(_.getLong(5) > 0L), s"$c compressed bytes")
        assert(rows.forall(_.getLong(6) > 0L), s"$c uncompressed bytes")
      }
      assert(stats.map(_.getString(0)).distinct.length == 3, "one entry set per file")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("columnSummary rolls up per column and computes the ratio") {
    val dir = java.nio.file.Files.createTempDirectory("graft-audit-").toString
    try {
      val path = fixture(dir)
      val sum = StorageAudit.columnSummary(spark, path)
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(3), r.getLong(4), r.getDouble(7))).toMap
      assert(sum.keySet == Set("id", "name", "score"))
      sum.foreach { case (c, (nFiles, nValues, nNulls, ratio)) =>
        assert(nFiles == 3L, s"$c files")
        assert(nValues == 1000L, s"$c values")
        assert(ratio > 0.0, s"$c ratio")
        assert(nNulls == (if (c == "name") 200L else 0L))
      }
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("audit of a single file and refusal of an empty directory") {
    val dir = java.nio.file.Files.createTempDirectory("graft-audit-").toString
    try {
      val path = fixture(dir)
      val one = new java.io.File(path).listFiles()
        .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
        .head.getAbsolutePath
      val stats = StorageAudit.footerStats(spark, one).collect()
      assert(stats.nonEmpty && stats.map(_.getString(0)).distinct.length == 1)
      val empty = java.nio.file.Files.createDirectory(
        java.nio.file.Paths.get(dir, "empty")).toString
      assertThrows[IllegalArgumentException](StorageAudit.footerStats(spark, empty))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }
}
