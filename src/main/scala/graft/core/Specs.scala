package graft.core

/** Source-routing ADT.
  *
  * The reference routes `{type: s3|direct}` to a single object, `batch` to a
  * prefix sweep, and `scheduled` to the `pending/` prefix
  * (extractor.py:42-69, lambda_handler.py:155-197). Here the trigger-event
  * parsing collapses into a typed spec; paths are any Hadoop-FS URI
  * (file://, s3a://, hdfs://) so the same engine runs locally and on a
  * cluster unchanged.
  */
sealed trait SourceSpec
object SourceSpec {

  /** One concrete file (reference "s3"/"direct" events). */
  final case class SingleFile(path: String) extends SourceSpec

  /** Every supported file under a directory/prefix (reference "batch"). */
  final case class Batch(dir: String) extends SourceSpec

  /** The pending/ prefix sweep (reference "scheduled", extractor.py:64-67). */
  final case class Scheduled(baseDir: String) extends SourceSpec {
    def pendingDir: String = s"${baseDir.stripSuffix("/")}/pending"
  }

  /** Parse a trigger event (as loose key-value pairs) into a spec —
    * the Spark-native equivalent of lambda_handler.py:155-197.
    */
  def fromEvent(event: Map[String, String]): SourceSpec =
    event.get("type") match {
      case Some("scheduled")             => Scheduled(event("base_dir"))
      case Some("batch")                 => Batch(event("dir"))
      case _ if event.contains("path")   => SingleFile(event("path"))
      case _ if event.contains("dir")    => Batch(event("dir"))
      case other                         => throw new IllegalArgumentException(s"unroutable event: $event ($other)")
    }
}

/** Sink description: where and how to write (loader.py:39-59). */
final case class SinkSpec(
    dir: String,
    format: FileFormat = FileFormat.Parquet,
    compression: String = "snappy",
    /** true: partition by the derived _year/_month/_day data columns;
      * false: reference-parity wall-clock path processed/year=Y/month=M/day=D
      * (loader.py:77-96, config.yaml:91-93). */
    partitionOnData: Boolean = false
)

/** Supported file formats: the reference's three (extractor.py:28,
  * loader.py:120-127) plus ORC (engine extension — the other columnar
  * format Spark ships natively).
  */
sealed abstract class FileFormat(val name: String)
object FileFormat {
  case object Csv extends FileFormat("csv")
  case object Json extends FileFormat("json")
  case object Parquet extends FileFormat("parquet")
  case object Orc extends FileFormat("orc")

  val all: Seq[FileFormat] = Seq(Csv, Json, Parquet, Orc)

  /** Extension dispatch, case-insensitive; None for unsupported
    * (extractor.py:165-184: .csv/.json/.jsonl/.parquet; +.orc).
    */
  def fromPath(path: String): Option[FileFormat] = {
    val lower = path.toLowerCase
    if (lower.endsWith(".csv")) Some(Csv)
    else if (lower.endsWith(".json") || lower.endsWith(".jsonl")) Some(Json)
    else if (lower.endsWith(".parquet")) Some(Parquet)
    else if (lower.endsWith(".orc")) Some(Orc)
    else None
  }

  def fromName(name: String): FileFormat = name.toLowerCase match {
    case "csv"     => Csv
    case "json"    => Json
    case "jsonl"   => Json
    case "parquet" => Parquet
    case "orc"     => Orc
    case other     => throw new IllegalArgumentException(s"Unsupported format: $other")
  }
}
