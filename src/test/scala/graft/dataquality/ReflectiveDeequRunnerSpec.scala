package graft.dataquality

import com.amazon.deequ.{Check, VerificationRunBuilder, VerificationRunBuilderWithRepository}
import com.amazon.deequ.repository.InMemoryMetricsRepository

import java.time.Instant

import graft.SparkTestBase
import graft.dataquality.deequ._

/** Executes the REAL reflective Deequ binding against the structurally
  * faithful test mirror of the vendor API (src/test/scala/com/amazon/deequ):
  * constructor lookup, virtual method dispatch, ResultKey construction and
  * result-shape navigation all run for real — only Deequ's internals are
  * substituted. Reference behaviour: waimak-deequ/.../DeequCheck.scala:23-94. */
class ReflectiveDeequRunnerSpec extends SparkTestBase {

  private implicit lazy val runner: DeequVerificationRunner[AnyRef, AnyRef, AnyRef] =
    ReflectiveDeequRunner()

  private def addCheck(ch: Check): AnyRef => AnyRef =
    b => b.asInstanceOf[VerificationRunBuilder].addCheck(ch)

  private def df = {
    import spark.implicits._
    Seq(1, 2, 3).toDF("v")
  }

  describe("ReflectiveDeequRunner") {

    it("probes the classpath") {
      assert(ReflectiveDeequRunner.isAvailable())
      val empty = new java.net.URLClassLoader(Array.empty, null)
      assert(!ReflectiveDeequRunner.isAvailable(empty))
      val ex = intercept[DataQualityException] { ReflectiveDeequRunner(empty) }
      assert(ex.getMessage.contains("not on the classpath"))
    }

    it("passing checks produce no alerts") {
      val check = DeequCheck[AnyRef, AnyRef, AnyRef](
        checks = addCheck(new Check("size", Seq("size >= 3" -> (_ >= 3L)))))
      assert(check.getAlerts("docs", df).isEmpty)
    }

    it("failing error-level checks map to Critical alerts with the message") {
      val check = DeequCheck[AnyRef, AnyRef, AnyRef](
        checks = addCheck(new Check("size",
          Seq("size >= 100" -> (_ >= 100L), "size >= 1" -> (_ >= 1L)))))
      val alerts = check.getAlerts("docs", df)
      assert(alerts.size == 1) // only the failing constraint alerts
      assert(alerts.head.importance == AlertImportance.Critical)
      assert(alerts.head.message.contains("size >= 100"))
      assert(alerts.head.message.contains("does not meet"))
    }

    it("warning-level checks map to Warning alerts") {
      val check = DeequCheck[AnyRef, AnyRef, AnyRef](
        checks = addCheck(new Check("size",
          Seq("size >= 100" -> (_ >= 100L)), isWarning = true)))
      val alerts = check.getAlerts("docs", df)
      assert(alerts.size == 1)
      assert(alerts.head.importance == AlertImportance.Warning)
    }

    it("merged checks compose through one builder chain") {
      val a = DeequCheck[AnyRef, AnyRef, AnyRef](
        checks = addCheck(new Check("a", Seq("a pass" -> (_ > 0L)))))
      val b = DeequCheck[AnyRef, AnyRef, AnyRef](
        checks = addCheck(new Check("b", Seq("b fail" -> (_ < 0L)))))
      val alerts = (a ++ b).getAlerts("docs", df)
      assert(alerts.size == 1)
      assert(alerts.head.message.contains("b fail"))
    }

    it("anomaly checks run through useRepository + saveOrAppendResult with the metadata key") {
      val repo = new InMemoryMetricsRepository
      val at = Instant.parse("2024-06-01T00:00:00Z")
      val check = DeequCheck[AnyRef, AnyRef, AnyRef](
        checks = addCheck(new Check("size", Seq("size >= 1" -> (_ >= 1L)))),
        metricsRepositoryChecks = Some(r =>
          r.asInstanceOf[VerificationRunBuilderWithRepository]
            .addAnomalyCheck(new Check("anomaly", Seq("stable" -> (_ <= 2L))))),
        maybeMetadata = Some(DeequMetadata[AnyRef](_ => repo, at)))
      val alerts = check.getAlerts("docs", df)
      assert(alerts.size == 1) // the anomaly constraint fails (3 > 2)
      assert(alerts.head.message.contains("stable"))
      // the reflective ResultKey carried the metadata instant into the repo
      assert(repo.saved.size == 1)
      assert(repo.saved.head._1.dataSetDate == at.toEpochMilli)
      assert(repo.saved.head._1.tags.isEmpty)
    }

    it("version-drift canary: the full required surface resolves in one probe") {
      // DeequApiSurface is the single source of truth for every bound
      // name/arity; an upgrade that drifts ANY of them must fail here (and
      // in ReflectiveDeequRunner.apply) with a readable list, never as a
      // NoSuchMethodException inside a running flow
      val drift = DeequApiSurface.missing(getClass.getClassLoader)
      assert(drift.isEmpty, s"API drift: ${drift.mkString("; ")}")
    }

    it("version-drift canary: a mismatched classpath reports readable reasons") {
      val empty = new java.net.URLClassLoader(Array.empty, null)
      val drift = DeequApiSurface.missing(empty)
      assert(drift.exists(_.contains("VerificationSuite: class not found")))
      assert(drift.exists(_.contains("ResultKey: class not found")))
      assert(drift.exists(_.contains("CheckResult")))
      assert(drift.exists(_.contains("ConstraintResult")))
    }

    it("repository-only runs (no anomaly checks) still save under the key") {
      val repo = new InMemoryMetricsRepository
      val at = Instant.parse("2024-07-01T00:00:00Z")
      val check = DeequCheck[AnyRef, AnyRef, AnyRef](
        checks = addCheck(new Check("size", Seq("size >= 1" -> (_ >= 1L)))),
        maybeMetadata = Some(DeequMetadata[AnyRef](_ => repo, at)))
      assert(check.getAlerts("docs", df).isEmpty)
      assert(repo.saved.map(_._1.dataSetDate) == Seq(at.toEpochMilli))
    }
  }
}
