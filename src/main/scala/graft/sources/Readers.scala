package graft.sources

import scala.collection.mutable.ArrayBuffer
import scala.util.{Failure, Success, Try}

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.{FileFormat, SourceSpec}

/** Source layer: format dispatch, single-file reads, prefix sweeps.
  *
  * Reference semantics (extractor.py):
  *   - extension dispatch, case-insensitive, unsupported rejected (:165-184)
  *   - single file parse with inferred schema (:89-99)
  *   - batch = list prefix, skip per-file failures, outer-align columns by
  *     name and concatenate (:104-140 — `pd.concat` fills missing columns
  *     with null, hence `unionByName(allowMissingColumns = true)`)
  *   - empty source → empty table (:120-134)
  *
  * Scale notes: [[single]] and [[batch]] preserve the reference's per-file
  * isolation (each file gets its own scan node, failures skipped). For
  * large uniform datasets use [[uniform]], which hands the whole glob to one
  * FileSourceScan so Spark parallelizes listing/splitting and can prune
  * partitions — per-file plans do not scale to 100k-file inputs.
  */
object Readers {

  /** Read one file, dispatching on extension (S1-S5). `tolerant` extends
    * per-file isolation to EXECUTION time: footer-valid files with
    * corrupt data pages are skipped at scan instead of failing the job
    * (plan-time Try alone only covers schema reads).
    *
    * `maxFileSizeMb` enforces the reference's `max_file_size_mb` key
    * (config.yaml:79) — which the reference DEFINES but never checks
    * anywhere in code; enforcement is our extension. When set, an
    * oversized input fails HERE with a clear message instead of
    * mid-scan. The [[Pipeline]] driver wires it from
    * `etl.extract.max_file_size_mb` (default 0 = off); direct library
    * callers opt in.
    */
  def single(spark: SparkSession, path: String, tolerant: Boolean = false,
             maxFileSizeMb: Option[Long] = None): DataFrame = {
    val fmt = FileFormat
      .fromPath(path)
      .getOrElse(throw new IllegalArgumentException(s"Unsupported file format: $path"))
    maxFileSizeMb.foreach { mb =>
      val p = new Path(path)
      val len = p.getFileSystem(spark.sparkContext.hadoopConfiguration).getFileStatus(p).getLen
      if (len > mb * 1024L * 1024L)
        throw new IllegalArgumentException(
          s"File exceeds max_file_size_mb=$mb: $path ($len bytes)")
    }
    uniform(spark, fmt, Seq(path), tolerant = tolerant)
  }

  /** One scan over many same-format files — the 100 TB path. Pass an
    * explicit schema to skip inference (inference reads every file twice).
    */
  def uniform(spark: SparkSession, format: FileFormat, paths: Seq[String],
              schema: Option[org.apache.spark.sql.types.StructType] = None,
              tolerant: Boolean = false): DataFrame = {
    val reader =
      if (tolerant) spark.read.option("ignoreCorruptFiles", "true")
      else spark.read
    val withSchema = schema.fold(reader)(reader.schema)
    format match {
      case FileFormat.Csv =>
        val r = withSchema.option("header", "true")
        (if (schema.isEmpty) r.option("inferSchema", "true") else r).csv(paths: _*)
      case FileFormat.Json    => withSchema.json(paths: _*)
      case FileFormat.Parquet => withSchema.parquet(paths: _*)
      case FileFormat.Orc     => withSchema.orc(paths: _*)
    }
  }

  /** List supported files under a directory, recursively (S6).
    * Hadoop FS speaks file://, s3a://, hdfs:// alike.
    */
  def listSupported(spark: SparkSession, dir: String): Seq[String] =
    listWithSizes(spark, dir).map(_._1)

  /** Same listing, keeping the byte size the FS already returned — one
    * metadata round-trip per file total; batch's log line and size guard
    * both read from it instead of re-statting.
    */
  private def listWithSizes(spark: SparkSession, dir: String): Seq[(String, Long)] = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) return Seq.empty
    val out = ArrayBuffer.empty[(String, Long)]
    val it = fs.listFiles(path, true)
    while (it.hasNext) {
      val status = it.next()
      val p = status.getPath.toString
      if (status.isFile && FileFormat.fromPath(p).isDefined) out += (p -> status.getLen)
    }
    out.sortBy(_._1).toSeq
  }

  /** Batch extract (S7-S8): every supported file under `dir`, per-file
    * failure isolation, outer column alignment. Empty/all-failed → empty
    * DataFrame.
    */
  def batch(spark: SparkSession, dir: String,
            maxFileSizeMb: Option[Long] = None): DataFrame = {
    val frames = listWithSizes(spark, dir).flatMap { case (p, len) =>
      // Per-file visibility at PLAN time (name + size, from the listing —
      // no extra stat) — the scalable counterpart of the reference's
      // per-file row log (extractor.py:100-101): a row count here would
      // force one Spark job per file before the pipeline even starts;
      // stage-level row accounting arrives with TransformStats instead.
      log.info(s"batch extract: $p ($len bytes)")
      if (maxFileSizeMb.exists(mb => len > mb * 1024L * 1024L)) {
        log.warn(s"skipping oversize file $p: $len bytes > " +
          s"max_file_size_mb=${maxFileSizeMb.get}")
        None
      } else Try(single(spark, p, tolerant = true)) match {
        case Success(df) => Some(df)
        case Failure(e) =>
          log.warn(s"skipping unreadable file $p: ${e.getMessage}")
          None
      }
    }
    if (frames.isEmpty) spark.emptyDataFrame
    else {
      // pd.concat upcasts type-conflicting columns to object; the Spark
      // analogue is casting INCOMPATIBLY-conflicted columns to string
      // before the union. All-numeric conflicts (int vs bigint vs double)
      // are left for unionByName's native widening — pandas widens those
      // too, and a string cast would corrupt numerics. Grouping is
      // case-insensitive to match unionByName's resolution.
      val conflicted = frames
        .flatMap(_.schema.fields)
        .groupBy(_.name.toLowerCase)
        .collect { case (_, fs)
          if fs.map(_.dataType).distinct.length > 1 &&
            !fs.forall(_.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType]) =>
          fs.map(_.name).toSet
        }
        .flatten.toSet
      val aligned =
        if (conflicted.isEmpty) frames
        else frames.map { f =>
          conflicted.intersect(f.columns.toSet).foldLeft(f) { (d, c) =>
            d.withColumn(c, org.apache.spark.sql.functions.col(c).cast("string"))
          }
        }
      aligned.reduce(_.unionByName(_, allowMissingColumns = true))
    }
  }

  /** Source router (S9). */
  def extract(spark: SparkSession, spec: SourceSpec,
              maxFileSizeMb: Option[Long] = None): DataFrame = spec match {
    case SourceSpec.SingleFile(path) => single(spark, path, maxFileSizeMb = maxFileSizeMb)
    case SourceSpec.Batch(dir)       => batch(spark, dir, maxFileSizeMb)
    case s: SourceSpec.Scheduled     => batch(spark, s.pendingDir, maxFileSizeMb)
  }

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)
}
