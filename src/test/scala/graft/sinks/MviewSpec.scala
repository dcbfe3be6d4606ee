package graft.sinks

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** The incremental-view contract beyond q168's fixed 3-batch split:
  * any batching folds to the same view as a full recompute, empty
  * deltas are no-ops, new-key groups appear, and double measures are
  * rejected instead of silently truncated.
  */
class MviewSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("v", LongType)))

  private def frame(rows: (Long, Long)*) =
    spark.createDataFrame(
      java.util.List.of(rows.map(r => Row(r._1, r._2)): _*), schema)

  private def withView(body: String => Unit): Unit = {
    val dir = graft.core.ScratchDirs.lease("graft-mview-spec")
    try body(dir) finally graft.core.ScratchDirs.release(dir)
  }

  private def snapshot(dir: String): Seq[(Long, Long, Long)] =
    Mview.read(spark, dir).orderBy("k").collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Long]("n_rows"),
        r.getAs[Long]("sum_v"))).toSeq

  test("any batching equals the full recompute") {
    val rows = (1L to 60L).map(i => (i % 7, i * 11))
    // uneven 3-way split on a different axis than the group key
    val parts = Seq(
      rows.filter(_._2 % 5 == 0), rows.filter(_._2 % 5 == 1),
      rows.filterNot(r => r._2 % 5 == 0 || r._2 % 5 == 1))
    withView { dir =>
      Mview.init(spark, dir, frame(parts.head: _*), Seq("k"), Seq("v"))
      parts.tail.foreach(p =>
        Mview.increment(spark, dir, frame(p: _*), Seq("k"), Seq("v")))
      val expected = rows.groupBy(_._1).map { case (k, rs) =>
        (k, rs.size.toLong, rs.map(_._2).sum)
      }.toSeq.sortBy(_._1)
      assert(snapshot(dir) == expected)
    }
  }

  test("an empty delta changes nothing; a new key inserts") {
    withView { dir =>
      Mview.init(spark, dir, frame(1L -> 10L), Seq("k"), Seq("v"))
      val before = snapshot(dir)
      val stats = Mview.increment(spark, dir, frame().limit(0), Seq("k"), Seq("v"))
      assert(stats.updated == 0L && stats.inserted == 0L)
      assert(snapshot(dir) == before)
      Mview.increment(spark, dir, frame(2L -> 5L), Seq("k"), Seq("v"))
      assert(snapshot(dir) == Seq((1L, 1L, 10L), (2L, 1L, 5L)))
    }
  }

  test("double measures are rejected, not truncated") {
    withView { dir =>
      val doubles = frame(1L -> 10L).withColumn("v", col("v") + lit(0.5))
      assertThrows[IllegalArgumentException] {
        Mview.init(spark, dir, doubles, Seq("k"), Seq("v"))
      }
    }
  }
}
