package graft.meta

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

/** Notification port — the SNS publish surface (aws_clients.py:120-153).
  *
  * Contract preserved: subjects truncate to 100 chars (SNS limit,
  * aws_clients.py:146) and a notifier failure NEVER fails the job
  * (aws_clients.py:148-153) — `notify` returns false instead of throwing.
  */
trait Notifier {
  protected def publish(subject: String, message: String): Unit

  final def notify(subject: String, message: String): Boolean =
    try {
      publish(subject.take(100), message)
      true
    } catch {
      case _: Exception => false
    }
}

/** Log-only notifier (the local default, like run_local's LocalStack SNS). */
object LogNotifier extends Notifier {
  private val log = org.slf4j.LoggerFactory.getLogger(getClass)
  protected def publish(subject: String, message: String): Unit =
    log.info(s"[notify] $subject: $message")
}

/** Appends notifications to a local file — durable local equivalent of an
  * SNS topic, useful in tests.
  */
final class FileNotifier(path: String) extends Notifier {
  protected def publish(subject: String, message: String): Unit = {
    val p = Paths.get(path)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    Files.write(p, s"$subject\t$message\n".getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }
}

/** Metrics port (aws_clients.py:167-201, CloudWatch put_metric_data).
  * Namespace semantics preserved (config.yaml:99: ETL/Pipeline). Like
  * [[Notifier]], sink failures must never fail the job — the final
  * `putMetric` enforces the swallow (aws_clients.py:196-201).
  */
trait MetricsSink {
  protected def emit(name: String, value: Double, unit: String,
                     dimensions: Map[String, String]): Unit

  final def putMetric(name: String, value: Double, unit: String = "Count",
                      dimensions: Map[String, String] = Map.empty): Boolean =
    try { emit(name, value, unit, dimensions); true }
    catch { case _: Exception => false }
}

/** Log-backed sink; namespace and dimension shaping mirror the CloudWatch
  * client (aws_clients.py:183-196: namespace from
  * `monitoring.cloudwatch.metric_namespace`, dimensions as Name=Value
  * pairs on the datum).
  */
class LogMetricsSink(config: graft.core.EngineConfig) extends MetricsSink {
  private val log = org.slf4j.LoggerFactory.getLogger(getClass)
  private val namespace =
    config.getString("monitoring.cloudwatch.metric_namespace", "ETL/Pipeline")
  protected def emit(name: String, value: Double, unit: String,
                     dimensions: Map[String, String]): Unit = {
    val dims = dimensions.toSeq.sortBy(_._1)
      .map { case (k, v) => s"$k=$v" }.mkString("[", ",", "]")
    log.info(s"[metric] $namespace $name=$value $unit $dims")
  }
}

object LogMetricsSink extends LogMetricsSink(graft.core.EngineConfig.default)
