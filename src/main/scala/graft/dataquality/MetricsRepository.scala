package graft.dataquality

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import java.sql.Timestamp

import graft.storage.{AuditTableInfo, Storage}

/** Metric history persisted in an audit table, with anomaly detection
  * against the previous run — the reference stores Deequ metrics the same
  * way (waimak-deequ/.../StorageLayerMetricsRepository.scala:20-49); here
  * metrics are plain (label, metric, value) rows and anomaly = relative
  * change beyond a threshold.
  */
class MetricsRepository(spark: SparkSession, basePath: String,
    tableName: String = "dq_metrics") {

  import spark.implicits._

  private def table() = Storage.getOrCreateTable(spark, basePath,
    AuditTableInfo(tableName, Seq("label", "metric"), Map.empty, retainHistory = true))

  /** Append one run's metrics (keyed by label+metric; history retained). */
  def save(runTs: Timestamp, metrics: Map[(String, String), Double]): Unit = {
    val df = metrics.toSeq
      .map { case ((label, metric), v) => (label, metric, v) }
      .toDF("label", "metric", "value")
      .coalesce(1)
    table().append(df, None, runTs)
  }

  /** Latest value per (label, metric) at or before `ts`. */
  def latest(ts: Timestamp): Map[(String, String), Double] =
    table().snapshot(ts).map(
      _.select("label", "metric", "value").as[(String, String, Double)]
        .collect().map { case (l, m, v) => (l, m) -> v }.toMap)
      .getOrElse(Map.empty)

  /** Compare a new run against the stored history: alerts for metrics whose
    * relative change exceeds `maxRelativeChange`. */
  def anomalies(runTs: Timestamp, current: Map[(String, String), Double],
      maxRelativeChange: Double): Seq[DataQualityAlert] = {
    val previous = latest(new Timestamp(runTs.getTime - 1))
    current.toSeq.flatMap { case (key @ (label, metric), now) =>
      previous.get(key).flatMap { before =>
        val change =
          if (before == 0.0) { if (now == 0.0) 0.0 else Double.MaxValue }
          else math.abs(now - before) / math.abs(before)
        if (change > maxRelativeChange)
          Some(DataQualityAlert(
            f"Metric $metric on $label moved from $before%.4f to $now%.4f " +
              f"(relative change ${math.min(change, 9999)}%.4f > $maxRelativeChange%.4f)",
            AlertImportance.Warning))
        else None
      }
    }
  }
}
