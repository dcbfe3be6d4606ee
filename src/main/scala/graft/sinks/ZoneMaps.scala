package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Zone-map (file min/max statistics) diagnostic: measures how much
  * data-skipping a physical layout actually buys for a predicate
  * workload, BEFORE rewriting a 100 TB table — the planning tool behind
  * the "should we OPTIMIZE ZORDER BY?" decision.
  *
  * The model: a layout is a total order; file i of F holds the rows with
  * exact ranks in the i-th F-quantile (`((rank-1)·F) div N`, the
  * QuantileBucket integer-bucket rule, so file sizes differ by ≤ 1 row —
  * exactly what a size-targeted table rewrite produces). Zone stats are
  * per-file min/max of each predicate column; a range predicate skips a
  * file when its interval misses the file's [min, max]. Everything is
  * integer or same-order double arithmetic, so the whole diagnostic —
  * layout, zones, workload, scan counts — replays hash-exact in SQL.
  *
  * Rank assignment is the two-pass no-SinglePartition machinery of
  * [[graft.operators.QuantileBucket.bucketed]] generalized to a
  * multi-column sort (range-repartition + in-partition sort + partition
  * offsets), never a global window.
  */
object ZoneMaps {

  /** Append `file` ∈ [0, f) under the total order `sortCols` (which must
    * be total enough that ties are payload-identical — interchangeable
    * rows may split across a file boundary, but per-file min/max stats
    * are then unaffected).
    */
  def fileAssign(df: DataFrame, sortCols: Seq[Column], f: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val p = spark.sparkContext.defaultParallelism
    val ranged = df.repartitionByRange(p, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .localCheckpoint()
      .withColumn("pid", spark_partition_id())
    val counts = ranged.groupBy(col("pid")).count().collect()
    val perPartition = Array.fill(p)(0L)
    counts.foreach(r => perPartition(r.getInt(0)) = r.getLong(1))
    val n = perPartition.sum
    require(n > 0, "cannot lay out an empty frame")
    val offsets = perPartition.scanLeft(0L)(_ + _)
    val offsetsDf = offsets.zipWithIndex
      .map { case (off, pid) => (pid, off) }.toSeq.toDF("pid", "off")
    ranged.join(broadcast(offsetsDf), "pid")
      .withColumn("rank",
        (row_number().over(Window.partitionBy(col("pid")).orderBy(sortCols: _*))
          + col("off")).cast("long"))
      .withColumn("file", expr(s"((rank - 1) * $f) div $n"))
      .drop("pid", "off", "rank")
  }

  /** The ZOrder.cluster normalization + Morton interleave as one column
    * (bounds passed in so the oracle can embed the same literals).
    */
  def zColumn(cols: Seq[(Column, Long, Long)], bits: Int): Column = {
    val maxVal = (1L << bits) - 1
    val normalized = cols.map { case (c, lo, hi) =>
      val span = if (hi > lo) (hi - lo).toDouble else 1.0
      least(lit(maxVal),
        floor((c.cast("double") - lit(lo.toDouble)) / lit(span) * maxVal).cast("long"))
    }
    ZOrder.zValue(normalized, bits)
  }

  /** Equal-width integer range workload over [lo, hi]: predicate i of p
    * covers [lo + i·w, lo + (i+1)·w) with w = (hi - lo + 1) div p, the
    * last predicate absorbing the remainder.
    */
  def workload(spark: org.apache.spark.sql.SparkSession,
               dim: String, lo: Long, hi: Long, p: Int): DataFrame = {
    import spark.implicits._
    val w = math.max(1L, (hi - lo + 1) / p)
    (0 until p).map { i =>
      val plo = lo + i * w
      val phi = if (i == p - 1) hi else lo + (i + 1) * w - 1
      (dim, i, plo, phi)
    }.toDF("pred_dim", "pred_id", "pred_lo", "pred_hi")
  }

  /** Full diagnostic: two layouts (linear by (a, b); z-order by the
    * Morton value of both) × a p-predicate equal-width workload per
    * column → one row per (layout, pred_dim) with the total and average
    * fraction of files a zone-map-aware scan reads.
    */
  def diagnostic(df: DataFrame, colA: String, colB: String,
                 files: Int, preds: Int, bits: Int = 12): DataFrame = {
    val spark = df.sparkSession
    val b = df.agg(
      min(col(colA)).cast("long").as("loA"), max(col(colA)).cast("long").as("hiA"),
      min(col(colB)).cast("long").as("loB"), max(col(colB)).cast("long").as("hiB")
    ).head()
    val (loA, hiA, loB, hiB) =
      (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))

    val base = df.select(col(colA).cast("long").as("a"), col(colB).cast("long").as("b"))
    val layouts = Seq(
      "linear" -> base,
      "zorder" -> base.withColumn("z",
        zColumn(Seq((col("a"), loA, hiA), (col("b"), loB, hiB)), bits)))
    val zones = layouts.map { case (name, d) =>
      val sortCols =
        if (name == "linear") Seq(col("a"), col("b"))
        else Seq(col("z"), col("a"), col("b"))
      fileAssign(d, sortCols, files)
        .groupBy(col("file"))
        .agg(min(col("a")).as("min_a"), max(col("a")).as("max_a"),
          min(col("b")).as("min_b"), max(col("b")).as("max_b"))
        .withColumn("layout", lit(name))
    }.reduce(_.unionByName(_))

    val wl = workload(spark, "a", loA, hiA, preds)
      .unionByName(workload(spark, "b", loB, hiB, preds))
    val scanned = zones.join(broadcast(wl),
      (col("pred_dim") === "a" && col("pred_lo") <= col("max_a") &&
        col("pred_hi") >= col("min_a")) ||
        (col("pred_dim") === "b" && col("pred_lo") <= col("max_b") &&
          col("pred_hi") >= col("min_b")))
    scanned.groupBy(col("layout"), col("pred_dim"))
      .agg(count(lit(1)).as("files_scanned"))
      .withColumn("n_files", lit(files.toLong))
      .withColumn("n_predicates", lit(preds.toLong))
      .withColumn("scan_frac",
        round(col("files_scanned") / (col("n_files") * col("n_predicates")), 4))
      .orderBy("layout", "pred_dim")
  }

  /** DuckDB replay of [[diagnostic]] over `lineitem(l_partkey,
    * l_suppkey)`: same normalization arithmetic (double ops in the same
    * order), same Morton interleave (generated bit expression), same
    * exact-rank file rule, workload, and overlap counts.
    */
  def diagnosticOracle(files: Int, preds: Int, bits: Int = 12): String = {
    val maxVal = (1L << bits) - 1
    def z(na: String, nb: String): String = {
      val pieces = for {
        (c, d) <- Seq(na -> 0, nb -> 1)
        j <- 0 until bits
      } yield s"((($c >> $j) & 1) << ${j * 2 + d})"
      pieces.mkString(" | ")
    }
    s"""WITH base AS (
       |  SELECT l_partkey::BIGINT AS a, l_suppkey::BIGINT AS b FROM lineitem),
       |bounds AS (
       |  SELECT min(a) AS loa, max(a) AS hia, min(b) AS lob, max(b) AS hib,
       |    count(*) AS n,
       |    CASE WHEN max(a) > min(a) THEN (max(a) - min(a))::DOUBLE ELSE 1.0 END AS spana,
       |    CASE WHEN max(b) > min(b) THEN (max(b) - min(b))::DOUBLE ELSE 1.0 END AS spanb
       |  FROM base),
       |zval AS (
       |  SELECT a, b,
       |    (${z("na", "nb")})::BIGINT AS z
       |  FROM (
       |    SELECT a, b,
       |      least($maxVal, floor(((a::DOUBLE - loa::DOUBLE) / spana) * $maxVal)::BIGINT) AS na,
       |      least($maxVal, floor(((b::DOUBLE - lob::DOUBLE) / spanb) * $maxVal)::BIGINT) AS nb
       |    FROM base, bounds)),
       |lin AS (
       |  SELECT a, b, ((row_number() OVER (ORDER BY a, b) - 1) * $files) // n AS file
       |  FROM base, bounds),
       |zo AS (
       |  SELECT a, b, ((row_number() OVER (ORDER BY z, a, b) - 1) * $files) // n AS file
       |  FROM zval, bounds),
       |zones AS (
       |  SELECT 'linear' AS layout, file, min(a) AS min_a, max(a) AS max_a,
       |    min(b) AS min_b, max(b) AS max_b FROM lin GROUP BY 2
       |  UNION ALL
       |  SELECT 'zorder', file, min(a), max(a), min(b), max(b) FROM zo GROUP BY 2),
       |wl AS (
       |  SELECT 'a' AS pred_dim, i AS pred_id,
       |    loa + i * greatest(1, (hia - loa + 1) // $preds) AS pred_lo,
       |    CASE WHEN i = $preds - 1 THEN hia
       |      ELSE loa + (i + 1) * greatest(1, (hia - loa + 1) // $preds) - 1 END AS pred_hi
       |  FROM range($preds) t(i), bounds
       |  UNION ALL
       |  SELECT 'b', i,
       |    lob + i * greatest(1, (hib - lob + 1) // $preds),
       |    CASE WHEN i = $preds - 1 THEN hib
       |      ELSE lob + (i + 1) * greatest(1, (hib - lob + 1) // $preds) - 1 END
       |  FROM range($preds) t(i), bounds)
       |SELECT layout, pred_dim, count(*)::BIGINT AS files_scanned,
       |  $files::BIGINT AS n_files, $preds::BIGINT AS n_predicates,
       |  round(count(*) / ($files::BIGINT * $preds::BIGINT), 4) AS scan_frac
       |FROM zones JOIN wl ON
       |  (pred_dim = 'a' AND pred_lo <= max_a AND pred_hi >= min_a) OR
       |  (pred_dim = 'b' AND pred_lo <= max_b AND pred_hi >= min_b)
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }
}
