package com.amazon.deequ

import org.apache.spark.sql.DataFrame

/** TEST-ONLY structural stand-in for the public Deequ API
  * (github.com/awslabs/deequ, Apache-2.0) with the exact package, class and
  * method names `graft.dataquality.deequ.ReflectiveDeequRunner` binds to —
  * so the spec executes the real reflective binding (constructor lookup,
  * method dispatch, ResultKey construction, result-shape navigation) rather
  * than mocking around it. Behaviour is a tiny deterministic subset: a
  * Check carries (constraint-name, rowCount-predicate) pairs evaluated
  * against one `data.count()`; check status = Success when all constraints
  * hold, else Warning/Error by the check's level — mirroring how Deequ
  * derives CheckStatus from ConstraintStatus + CheckLevel.
  */
case class VerificationSuite() {
  def onData(data: DataFrame): VerificationRunBuilder =
    new VerificationRunBuilder(data, Vector.empty)
}

/** (description, constraints, warning-level?) — the slice of Deequ's Check
  * the runner's result mapping observes. */
class Check(val description: String,
    val constraints: Seq[(String, Long => Boolean)],
    val isWarning: Boolean = false) {
  override def toString: String = s"Check($description)"
}

object CheckStatus extends Enumeration { val Success, Warning, Error = Value }
object ConstraintStatus extends Enumeration { val Success, Failure = Value }

final case class ConstraintResult(constraint: String,
    status: ConstraintStatus.Value, message: Option[String] = None)

final case class CheckResult(check: Check, status: CheckStatus.Value,
    constraintResults: Seq[ConstraintResult])

final case class VerificationResult(status: CheckStatus.Value,
    checkResults: Map[Check, CheckResult])

class VerificationRunBuilder(val data: DataFrame, val checks: Vector[Check]) {

  def addCheck(check: Check): VerificationRunBuilder =
    new VerificationRunBuilder(data, checks :+ check)

  def useRepository(repo: repository.MetricsRepository): VerificationRunBuilderWithRepository =
    new VerificationRunBuilderWithRepository(data, checks, repo, None)

  def run(): VerificationResult = VerificationRunBuilder.evaluate(data, checks)
}

object VerificationRunBuilder {
  private[deequ] def evaluate(data: DataFrame, checks: Seq[Check]): VerificationResult = {
    val n = data.count()
    val results = checks.map { ch =>
      val crs = ch.constraints.map { case (name, pred) =>
        if (pred(n)) ConstraintResult(name, ConstraintStatus.Success)
        else ConstraintResult(name, ConstraintStatus.Failure,
          Some(s"Value: $n does not meet the constraint requirement"))
      }
      val st =
        if (crs.forall(_.status == ConstraintStatus.Success)) CheckStatus.Success
        else if (ch.isWarning) CheckStatus.Warning
        else CheckStatus.Error
      ch -> CheckResult(ch, st, crs)
    }.toMap
    val overall =
      if (results.isEmpty || results.values.forall(_.status == CheckStatus.Success))
        CheckStatus.Success
      else if (results.values.exists(_.status == CheckStatus.Error)) CheckStatus.Error
      else CheckStatus.Warning
    VerificationResult(overall, results)
  }
}

class VerificationRunBuilderWithRepository(data: DataFrame, checks: Vector[Check],
    val repo: repository.MetricsRepository, val resultKey: Option[repository.ResultKey],
    val anomalyChecks: Vector[Check] = Vector.empty)
  extends VerificationRunBuilder(data, checks) {

  def saveOrAppendResult(key: repository.ResultKey): VerificationRunBuilderWithRepository =
    new VerificationRunBuilderWithRepository(data, checks, repo, Some(key), anomalyChecks)

  def addAnomalyCheck(check: Check): VerificationRunBuilderWithRepository =
    new VerificationRunBuilderWithRepository(data, checks, repo, resultKey,
      anomalyChecks :+ check)

  override def run(): VerificationResult = {
    val result = VerificationRunBuilder.evaluate(data, checks ++ anomalyChecks)
    resultKey.foreach(k => repo.save(k, result))
    result
  }
}
