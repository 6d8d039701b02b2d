package graft.dataquality

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.dataflow._
import graft.dataflow.spark.{SparkAction, SparkDataFlow, SparkFlowContext}

/** Data-quality checks wired into the flow as label interceptors.
  *
  * Reference semantics (waimak-dataquality/.../DataQualityMetadataExtension.scala:15-93):
  * checks registered per label merge monoidally, run right after the label is
  * produced, and dispatch alerts filtered by importance to pluggable
  * handlers. Prefab checks are plain DataFrame aggregations — no external
  * dependency (reference uses Deequ; zero-egress build reimplements them).
  */
sealed trait AlertImportance { def rank: Int }
object AlertImportance {
  case object Information extends AlertImportance { val rank = 0 }
  case object Good extends AlertImportance { val rank = 1 }
  case object Warning extends AlertImportance { val rank = 2 }
  case object Critical extends AlertImportance { val rank = 3 }
}

final case class DataQualityAlert(message: String, importance: AlertImportance)

trait DataQualityAlertHandler {
  /** Alerts below this importance are ignored. */
  def alertOn: AlertImportance = AlertImportance.Information
  def handleAlert(alert: DataQualityAlert): Unit
  final def dispatch(alert: DataQualityAlert): Unit =
    if (alert.importance.rank >= alertOn.rank) handleAlert(alert)
}

/** Throws on the first critical alert (fails the flow action). */
class ExceptionQualityAlert(override val alertOn: AlertImportance = AlertImportance.Critical)
  extends DataQualityAlertHandler {
  def handleAlert(alert: DataQualityAlert): Unit =
    throw new DataQualityException(alert.message)
}

/** Collects alerts in memory — logging/testing. */
class RecordingAlertHandler(override val alertOn: AlertImportance = AlertImportance.Information)
  extends DataQualityAlertHandler {
  private val buf = scala.collection.mutable.ArrayBuffer[DataQualityAlert]()
  def handleAlert(alert: DataQualityAlert): Unit = buf.synchronized { buf += alert }
  def alerts: Seq[DataQualityAlert] = buf.synchronized(buf.toSeq)
}

/** Appends alerts to a directory as one small file per alert (Hadoop FS
  * API, so local paths, HDFS and object stores all work; a single
  * appendable file would need FS append support, which local and object
  * stores lack). The offline-friendly alert channel: a notifier tails the
  * directory. File name carries timestamp + importance; body is the
  * alert message. Reference shape: email/Slack handlers
  * (waimak-dataquality/.../SlackQualityAlert.scala:39-54) — same trait,
  * different transport. */
class FileAlertHandler(hadoopConf: org.apache.hadoop.conf.Configuration,
    dir: String,
    override val alertOn: AlertImportance = AlertImportance.Warning)
  extends DataQualityAlertHandler {
  private val seq = new java.util.concurrent.atomic.AtomicLong(0L)
  def handleAlert(alert: DataQualityAlert): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir,
      f"alert-${System.currentTimeMillis()}%013d-${seq.getAndIncrement()}%04d-${alert.importance.toString.toLowerCase}.txt")
    val fs = p.getFileSystem(hadoopConf)
    val out = fs.create(p, false)
    try out.write(alert.message.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }
}

class DataQualityException(message: String) extends RuntimeException(message)

/** A check over a produced dataset yielding alerts. Checks on the same label
  * merge (`++`). */
trait DataQualityCheck {
  /** Registration-time validation (reference DataQualityCheck.validateCheck):
    * a structurally invalid check — e.g. anomaly checks without a metrics
    * repository — must fail when ADDED to the flow, not midway through a run. */
  def validateCheck: scala.util.Try[Unit] = scala.util.Success(())
  def getAlerts(label: String, ds: DataFrame): Seq[DataQualityAlert]
  def ++(other: DataQualityCheck): DataQualityCheck = {
    val self = this
    new DataQualityCheck {
      // a merged check is only as valid as its parts: without this, merging a
      // structurally invalid check (e.g. anomaly checks without a repository)
      // would inherit the default Success and bypass registration-time
      // validation, resurfacing as the mid-run failure it exists to prevent
      override def validateCheck: scala.util.Try[Unit] =
        self.validateCheck.flatMap(_ => other.validateCheck)
      def getAlerts(label: String, ds: DataFrame): Seq[DataQualityAlert] =
        self.getAlerts(label, ds) ++ other.getAlerts(label, ds)
    }
  }
}

/** Generic check from a metric function + alert function. */
final case class SimpleDatasetCheck[T](
    metric: DataFrame => T,
    alert: (T, String) => Seq[DataQualityAlert]) extends DataQualityCheck {
  def getAlerts(label: String, ds: DataFrame): Seq[DataQualityAlert] =
    alert(metric(ds), label)
}

/** Prefab checks as single-pass DataFrame aggregations
  * (reference prefabchecks/CompletenessCheck.scala etc.). */
object PrefabChecks {

  /** Fraction of non-null values in `column` must be >= warning/critical. */
  def completenessCheck(column: String, warnBelow: Double = 1.0,
      criticalBelow: Double = 0.0): DataQualityCheck =
    SimpleDatasetCheck[(Long, Long)](
      df => {
        val r = df.agg(count(lit(1)), count(col(column))).head()
        (r.getLong(0), r.getLong(1))
      },
      { case ((total, nonNull), label) =>
        val completeness = if (total == 0) 1.0 else nonNull.toDouble / total
        if (completeness < criticalBelow)
          Seq(DataQualityAlert(
            f"Completeness of $column on $label is $completeness%.4f " +
              f"(critical threshold $criticalBelow%.4f)", AlertImportance.Critical))
        else if (completeness < warnBelow)
          Seq(DataQualityAlert(
            f"Completeness of $column on $label is $completeness%.4f " +
              f"(warning threshold $warnBelow%.4f)", AlertImportance.Warning))
        else Seq.empty
      })

  /** Columns (as a compound key) must be unique. The key is wrapped in a
    * struct so NULL-bearing keys still count as distinct tuples —
    * `countDistinct(cols...)` silently drops any row with a null column and
    * would report phantom duplicates. */
  def uniquenessCheck(columns: Seq[String], warnDuplicates: Long = 0): DataQualityCheck =
    SimpleDatasetCheck[Long](
      df => {
        val r = df.agg(count(lit(1)),
          countDistinct(struct(columns.map(col): _*))).head()
        r.getLong(0) - r.getLong(1)
      },
      (dups, label) =>
        if (dups > warnDuplicates)
          Seq(DataQualityAlert(
            s"${columns.mkString(",")} on $label has $dups duplicate rows",
            AlertImportance.Warning))
        else Seq.empty)

  /** Newest timestamp in `column` must be within `maxAgeMs` of `nowMs`. */
  def recentTimestampCheck(column: String, nowMs: Long, maxAgeMs: Long): DataQualityCheck =
    SimpleDatasetCheck[Option[java.sql.Timestamp]](
      df => Option(df.agg(max(col(column))).head().getTimestamp(0)),
      (maxTs, label) => maxTs match {
        case Some(ts) if nowMs - ts.getTime <= maxAgeMs => Seq.empty
        case Some(ts) => Seq(DataQualityAlert(
          s"Newest $column on $label is $ts, older than ${maxAgeMs}ms",
          AlertImportance.Critical))
        case None => Seq(DataQualityAlert(
          s"No rows to check recency of $column on $label", AlertImportance.Critical))
      })

  /** Arbitrary SQL over the dataset (referenced as table `dataset`); every
    * returned row becomes a warning. Only the standalone identifier
    * `dataset` is rewritten (word-boundary match — `dataset_id` and other
    * identifiers survive); the view name is sanitised so any label works. */
  def genericSQLCheck(sql: String): DataQualityCheck =
    new DataQualityCheck {
      def getAlerts(label: String, ds: DataFrame): Seq[DataQualityAlert] = {
        val safeLabel = label.replaceAll("[^A-Za-z0-9_]", "_")
        val view = s"dq_${safeLabel}_${Integer.toHexString(sql.hashCode)}"
        ds.createOrReplaceTempView(view)
        ds.sparkSession.sql(sql.replaceAll("\\bdataset\\b", view)).collect()
          .map(r => DataQualityAlert(s"SQL check on $label: ${r.mkString(", ")}",
            AlertImportance.Warning)).toSeq
      }
    }
}

object DataQualityActions {

  implicit class DataQualityOps(val flow: SparkDataFlow) extends AnyVal {

    /** Run `check` on `label` as soon as it is produced; alerts go to the
      * handlers. Implemented as an in-place interceptor so downstream
      * consumers only see a checked dataset. */
    def addDataQualityCheck(label: String, check: DataQualityCheck,
        handlers: DataQualityAlertHandler*): SparkDataFlow = {
      check.validateCheck.get // invalid composition fails at registration
      flow.interceptPostOutput(label) { original =>
        new SparkAction(original.inputLabels, original.outputLabels,
          s"dataQuality:${original.actionName}", original.requiresAllInputs) ({ (entities, ctx) =>
          val results = original.performAction(entities, ctx).get
          // materialize before checking: each check aggregation is its own
          // Spark job, and the downstream consumer re-reads the label too —
          // without this, every one re-executes the full upstream lineage
          // (reference caches the label ahead of checks the same way,
          // DataQualityMetadataExtension.scala:15-45). Materialize rather
          // than persist: its blocks free on GC, so long-running sessions
          // checking many labels don't accumulate cache entries forever
          val checkedResults = original.outputLabels.zip(results).map {
            case (l, Some(ds: Dataset[_])) if l == label =>
              val cached = graft.operators.Materialize(ds.toDF())
              check.getAlerts(l, cached).foreach(a => handlers.foreach(_.dispatch(a)))
              Some(cached)
            case (_, r) => r
          }
          checkedResults
        })
      }
    }
  }
}
