package graft.dataquality.deequ

import org.apache.spark.sql.DataFrame

import java.time.Instant

import scala.util.{Failure, Success, Try}

import graft.dataquality._

/** Vendor-neutral Deequ adapter seam.
  *
  * The reference's Deequ integration (waimak-deequ/.../DeequCheck.scala:23-94)
  * exposes a COMPOSITION surface: a check is a function transforming a
  * `VerificationRunBuilder`, anomaly checks transform a
  * `VerificationRunBuilderWithRepository`, checks merge monoidally
  * (`checks andThen other.checks`), and a metadata record supplies the
  * metrics-repository builder plus the run's result-key timestamp
  * (DeequMetadata.scala:10-23). This file reproduces that surface with the
  * vendor types abstracted behind [[DeequVerificationRunner]]: when the Deequ
  * jar is on the classpath, a ~20-line runner binds `B` to
  * `VerificationRunBuilder`, `R` to `VerificationRunBuilderWithRepository`
  * and `P` to `MetricsRepository`; offline (this build — zero egress, vendor
  * jar unavailable), a fake runner exercises every composition and anomaly
  * path in the spec. The check logic itself — merge semantics, validation,
  * repository attachment order, result-to-alert mapping — is all here and
  * fully tested either way.
  */

/** Deequ's CheckStatus, vendor-free. */
sealed trait DeequStatus
object DeequStatus {
  case object Success extends DeequStatus
  case object Warning extends DeequStatus
  case object Error extends DeequStatus
}

/** One constraint's outcome (Deequ ConstraintResult shape). */
final case class DeequConstraintResult(
    constraint: String,
    status: DeequStatus,
    message: Option[String] = None)

/** One check's outcome: its level-derived status + its constraints. */
final case class DeequCheckResult(
    status: DeequStatus,
    constraintResults: Seq[DeequConstraintResult])

/** VerificationResult shape: overall status + per-check results. */
final case class DeequVerificationOutcome(
    status: DeequStatus,
    checkResults: Seq[DeequCheckResult])

/** The vendor boundary. `B` = plain run builder, `R` = run builder with a
  * repository attached, `P` = metrics repository. */
trait DeequVerificationRunner[B, R, P] {
  /** `VerificationSuite().onData(df)` */
  def onData(data: DataFrame): B
  /** `builder.useRepository(repo).saveOrAppendResult(ResultKey(millis))` */
  def useRepository(builder: B, repository: P, resultKeyMillis: Long): R
  /** `builder.run()` on whichever builder form the check ended with. */
  def run(builder: Either[B, R]): DeequVerificationOutcome
}

/** Reference DeequMetadata.scala:10-23: where anomaly metrics live (built
  * per label) and the timestamp keying this run's stored metrics. */
final case class DeequMetadata[P](
    repoBuilder: String => P,
    metricsDateTime: Instant)

/** The reference's DeequCheck, vendor-abstracted. Same three fields, same
  * merge law, same validation, same alert mapping. */
final case class DeequCheck[B, R, P](
    checks: B => B = identity[B] _,
    metricsRepositoryChecks: Option[R => R] = None,
    maybeMetadata: Option[DeequMetadata[P]] = None)(
    implicit runner: DeequVerificationRunner[B, R, P])
  extends DataQualityCheck {

  /** Anomaly checks demand a repository — rejected at flow-registration time
    * (reference DeequCheck.validateCheck). */
  override def validateCheck: Try[Unit] = (metricsRepositoryChecks, maybeMetadata) match {
    case (Some(_), None) => Failure(new DataQualityException(
      "Anomaly checks were specified but no metrics repository was set, or " +
        "the repository was set after anomaly checks were defined. Set a " +
        "repository (setDeequMetricsRepository) before adding checks that need it."))
    case _ => Success(())
  }

  /** Monoidal merge: builder transforms compose, repository checks compose
    * when both exist, first metadata wins (reference DeequCheck.++). */
  def ++(other: DeequCheck[B, R, P]): DeequCheck[B, R, P] =
    DeequCheck(
      checks andThen other.checks,
      (metricsRepositoryChecks, other.metricsRepositoryChecks) match {
        case (Some(a), Some(b)) => Some(a andThen b)
        case (a, b) => a.orElse(b)
      },
      maybeMetadata.orElse(other.maybeMetadata))

  def getResult(label: String, data: DataFrame): DeequVerificationOutcome = {
    if (metricsRepositoryChecks.isDefined && maybeMetadata.isEmpty)
      throw new DataQualityException(
        s"Error checking metrics for [$label]: a metrics repository must be " +
          "defined when using anomaly metrics")
    val withChecks = checks(runner.onData(data))
    maybeMetadata match {
      case Some(m) =>
        val withRepo = runner.useRepository(withChecks, m.repoBuilder(label),
          m.metricsDateTime.toEpochMilli)
        runner.run(Right(metricsRepositoryChecks.map(_.apply(withRepo)).getOrElse(withRepo)))
      case None => runner.run(Left(withChecks))
    }
  }

  def getAlerts(label: String, ds: DataFrame): Seq[DataQualityAlert] = {
    val outcome = getResult(label, ds)
    outcome.status match {
      case DeequStatus.Success => Nil
      case _ => outcome.checkResults.flatMap(result =>
        result.constraintResults
          .filter(_.status != DeequStatus.Success)
          .map(constraintResultToAlert(label, _, alertImportance(result.status))))
    }
  }

  private def constraintResultToAlert(label: String, cr: DeequConstraintResult,
      importance: AlertImportance): DataQualityAlert =
    DataQualityAlert(
      s"""${importance.toString} alert for label $label
         | ${cr.constraint} : ${cr.message.getOrElse("")}""".stripMargin,
      importance)

  private def alertImportance(status: DeequStatus): AlertImportance = status match {
    case DeequStatus.Success => AlertImportance.Good
    case DeequStatus.Warning => AlertImportance.Warning
    case DeequStatus.Error => AlertImportance.Critical
  }
}
