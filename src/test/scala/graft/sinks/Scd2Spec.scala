package graft.sinks

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Edge semantics of the SCD2 merge that the q164 oracle's dense
  * 3-snapshot replay never exercises: partial batches, null attribute
  * transitions, bookkeeping-column rejection, and no-op batches
  * committing no spurious versions.
  */
class Scd2Spec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("attr", StringType)))

  private def frame(rows: (Long, String)*) =
    spark.createDataFrame(
      java.util.List.of(rows.map(r => Row(r._1, r._2)): _*), schema)

  private def withTable(body: String => Unit): Unit = {
    val dir = graft.core.ScratchDirs.lease("graft-scd2-spec")
    try body(dir) finally graft.core.ScratchDirs.release(dir)
  }

  test("partial batches leave absent keys untouched; unchanged keys keep valid_from") {
    withTable { dir =>
      Scd2.init(spark, dir, frame(1L -> "a", 2L -> "b"), batchId = 1L)
      // key 1 changes, key 2 absent (no delete semantics), key 3 new
      val stats = Scd2.merge(spark, dir, frame(1L -> "a2", 3L -> "c"),
        Seq("k"), batchId = 2L)
      assert(stats.updated == 1L && stats.inserted == 2L, stats.toString)
      val rows = TxTable.read(spark, dir).orderBy("k", "valid_from").collect()
        .map(r => (r.getAs[Long]("k"), r.getAs[String]("attr"),
          r.getAs[Long]("valid_from"), Option(r.getAs[java.lang.Long]("valid_to")),
          r.getAs[Boolean]("is_current")))
      assert(rows.toSeq == Seq(
        (1L, "a", 1L, Some(java.lang.Long.valueOf(2L)), false),
        (1L, "a2", 2L, None, true),
        (2L, "b", 1L, None, true), // absent from batch 2: untouched
        (3L, "c", 2L, None, true)))
    }
  }

  test("a no-op batch commits no new versions for its keys") {
    withTable { dir =>
      Scd2.init(spark, dir, frame(1L -> "a"), batchId = 1L)
      val stats = Scd2.merge(spark, dir, frame(1L -> "a"), Seq("k"), batchId = 2L)
      assert(stats.updated == 0L && stats.inserted == 0L, stats.toString)
      assert(TxTable.read(spark, dir).count() == 1L)
    }
  }

  test("null attribute values compare null-safely") {
    withTable { dir =>
      Scd2.init(spark, dir, frame(1L -> null, 2L -> "b"), batchId = 1L)
      // 1: null -> null is UNCHANGED; 2: "b" -> null is a change
      val stats = Scd2.merge(spark, dir, frame(1L -> null, 2L -> null),
        Seq("k"), batchId = 2L)
      assert(stats.updated == 1L && stats.inserted == 1L, stats.toString)
      val open = TxTable.read(spark, dir).filter(col("is_current"))
        .orderBy("k").collect()
      assert(open.map(_.getAs[Long]("valid_from")).toSeq == Seq(1L, 2L))
    }
  }

  test("a batch carrying bookkeeping columns is rejected") {
    withTable { dir =>
      Scd2.init(spark, dir, frame(1L -> "a"), batchId = 1L)
      val bad = frame(1L -> "x").withColumn("is_current", lit(true))
      assertThrows[IllegalArgumentException] {
        Scd2.merge(spark, dir, bad, Seq("k"), batchId = 2L)
      }
    }
  }

  test("asOf picks the version valid at each fact's stamp, null before birth") {
    withTable { dir =>
      Scd2.init(spark, dir, frame(1L -> "a"), batchId = 2L)
      Scd2.merge(spark, dir, frame(1L -> "b"), Seq("k"), batchId = 5L)
      val facts = spark.createDataFrame(
        java.util.List.of(
          Row(1L, 1L), // before first version → null
          Row(1L, 2L), // at valid_from → "a"
          Row(1L, 4L), // inside [2,5) → "a"
          Row(1L, 5L), // at the change → "b"
          Row(2L, 3L)  // unknown key → null
        ),
        StructType(Seq(StructField("k", LongType), StructField("at", LongType))))
      val out = Scd2.asOf(facts, TxTable.read(spark, dir), Seq("k"), "at")
        .orderBy("k", "at").collect()
        .map(r => (r.getAs[Long]("k"), r.getAs[Long]("at"),
          Option(r.getAs[String]("attr"))))
      assert(out.toSeq == Seq(
        (1L, 1L, None), (1L, 2L, Some("a")), (1L, 4L, Some("a")),
        (1L, 5L, Some("b")), (2L, 3L, None)))
      // equi-join with a residual interval predicate — never a cartesian
      val p = Scd2.asOf(facts, TxTable.read(spark, dir), Seq("k"), "at")
        .queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
    }
  }

  test("exactly one current row per key after repeated change batches") {
    withTable { dir =>
      Scd2.init(spark, dir, frame(1L -> "a", 2L -> "b"), batchId = 1L)
      for (b <- 2L to 5L)
        Scd2.merge(spark, dir, frame(1L -> s"a$b", 2L -> "b"), Seq("k"), batchId = b)
      val t = TxTable.read(spark, dir)
      val current = t.filter(col("is_current")).groupBy("k").count()
      assert(current.filter(col("count") =!= 1).isEmpty)
      // key 1 has 5 versions chaining 1->2->3->4->5; key 2 has one row
      assert(t.filter(col("k") === 1L).count() == 5L)
      assert(t.filter(col("k") === 2L).count() == 1L)
      val closed = t.filter(col("k") === 1L && !col("is_current"))
        .orderBy("valid_from").collect()
      closed.foreach(r =>
        assert(r.getAs[Long]("valid_to") == r.getAs[Long]("valid_from") + 1L))
    }
  }
}
