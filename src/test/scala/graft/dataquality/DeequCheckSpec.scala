package graft.dataquality

import org.apache.spark.sql.DataFrame
import org.scalatest.matchers.should.Matchers

import java.time.Instant

import graft.SparkTestBase
import graft.dataquality.deequ._

/** Exercises the Deequ adapter seam through a fake runner: the composition
  * surface (builder-transforming checks, monoidal ++, metadata precedence),
  * registration-time validation, the anomaly path through a metrics
  * repository, and result-to-alert mapping — everything the reference's
  * DeequCheck.scala:23-94 does except the vendor call itself, which the
  * runner abstracts. */
class DeequCheckSpec extends SparkTestBase with Matchers {

  import spark.implicits._

  /** Fake vendor model: a "builder" is the data plus named row-count
    * constraints; attaching a repository enables anomaly constraints that
    * see previously stored metrics. */
  case class FakeBuilder(data: DataFrame,
      constraints: Vector[(String, Long => Boolean)] = Vector.empty)
  class FakeRepo {
    var history: Vector[(Long, Long)] = Vector.empty // (resultKey, rowCount)
  }
  case class FakeRepoBuilder(base: FakeBuilder, repo: FakeRepo, key: Long,
      anomaly: Vector[(String, (Vector[Long], Long) => Boolean)] = Vector.empty)

  class FakeRunner extends DeequVerificationRunner[FakeBuilder, FakeRepoBuilder, FakeRepo] {
    var repoAttachedTo: Option[FakeRepo] = None
    def onData(data: DataFrame): FakeBuilder = FakeBuilder(data)
    def useRepository(b: FakeBuilder, repository: FakeRepo, resultKeyMillis: Long): FakeRepoBuilder = {
      repoAttachedTo = Some(repository)
      FakeRepoBuilder(b, repository, resultKeyMillis)
    }
    def run(builder: Either[FakeBuilder, FakeRepoBuilder]): DeequVerificationOutcome = {
      val (base, anomalyResults) = builder match {
        case Left(b) => (b, Vector.empty[DeequConstraintResult])
        case Right(rb) =>
          val n = rb.base.data.count()
          val past = rb.repo.history.map(_._2)
          val rs = rb.anomaly.map { case (name, ok) =>
            DeequConstraintResult(name,
              if (ok(past, n)) DeequStatus.Success else DeequStatus.Error,
              Some(s"past=${past.mkString(",")} current=$n"))
          }
          rb.repo.history :+= (rb.key, n) // saveOrAppendResult
          (rb.base, rs)
      }
      val n = base.data.count()
      val plain = base.constraints.map { case (name, ok) =>
        DeequConstraintResult(name,
          if (ok(n)) DeequStatus.Success else DeequStatus.Error, Some(s"n=$n"))
      }
      val all = plain ++ anomalyResults
      val status = if (all.forall(_.status == DeequStatus.Success)) DeequStatus.Success
        else DeequStatus.Error
      DeequVerificationOutcome(status, Seq(DeequCheckResult(status, all)))
    }
  }

  private def sized(name: String, ok: Long => Boolean)(b: FakeBuilder): FakeBuilder =
    b.copy(constraints = b.constraints :+ (name, ok))

  private val df3 = Seq(1, 2, 3).toDF("v")

  it("composes checks monoidally and maps failed constraints to critical alerts") {
    implicit val runner: FakeRunner = new FakeRunner
    val atLeast2 = DeequCheck[FakeBuilder, FakeRepoBuilder, FakeRepo](
      checks = sized("size>=2", _ >= 2))
    val atMost2 = DeequCheck[FakeBuilder, FakeRepoBuilder, FakeRepo](
      checks = sized("size<=2", _ <= 2))
    val merged = atLeast2 ++ atMost2

    merged.validateCheck.isSuccess shouldBe true
    val alerts = merged.getAlerts("lbl", df3)
    // size>=2 passes (no alert); size<=2 fails on 3 rows -> one critical
    alerts.map(_.importance) shouldBe Seq(AlertImportance.Critical)
    alerts.head.message should include("lbl")
    alerts.head.message should include("size<=2")
    // both constraints genuinely ran through ONE composed builder
    val outcome = merged.getResult("lbl", df3)
    outcome.checkResults.head.constraintResults.map(_.constraint) shouldBe
      Seq("size>=2", "size<=2")
  }

  it("a fully passing suite yields no alerts") {
    implicit val runner: FakeRunner = new FakeRunner
    DeequCheck[FakeBuilder, FakeRepoBuilder, FakeRepo](
      checks = sized("size>=1", _ >= 1)).getAlerts("lbl", df3) shouldBe Nil
  }

  it("rejects anomaly checks without a repository at registration time") {
    implicit val runner: FakeRunner = new FakeRunner
    val anomalyOnly = DeequCheck[FakeBuilder, FakeRepoBuilder, FakeRepo](
      metricsRepositoryChecks = Some(identity[FakeRepoBuilder] _))
    val failure = anomalyOnly.validateCheck
    failure.isFailure shouldBe true
    intercept[DataQualityException](failure.get).getMessage should
      include("no metrics repository")
    // merging in metadata repairs it (metadata-after-checks order works)
    val repo = new FakeRepo
    val withMeta = anomalyOnly ++ DeequCheck[FakeBuilder, FakeRepoBuilder, FakeRepo](
      maybeMetadata = Some(DeequMetadata(_ => repo, Instant.ofEpochMilli(1000L))))
    withMeta.validateCheck.isSuccess shouldBe true
  }

  it("runs anomaly checks against the repository's history and appends this run") {
    implicit val runner: FakeRunner = new FakeRunner
    val repo = new FakeRepo
    repo.history = Vector((1L, 3L)) // previous run saw 3 rows
    // anomaly: current count must be within 2x the last stored metric
    val check = DeequCheck[FakeBuilder, FakeRepoBuilder, FakeRepo](
      metricsRepositoryChecks = Some((rb: FakeRepoBuilder) =>
        rb.copy(anomaly = rb.anomaly :+ ("no-2x-jump",
          (past: Vector[Long], n: Long) => past.lastOption.forall(p => n <= 2 * p)))),
      maybeMetadata = Some(DeequMetadata(_ => repo, Instant.ofEpochMilli(2000L))))

    val big = (1 to 10).toDF("v") // 10 > 2*3 -> anomaly
    val alerts = check.getAlerts("tbl", big)
    alerts.map(_.importance) shouldBe Seq(AlertImportance.Critical)
    alerts.head.message should include("no-2x-jump")
    // the repository was attached (useRepository called) and this run's
    // metric appended under the metadata's result key
    runner.repoAttachedTo shouldBe Some(repo)
    repo.history shouldBe Vector((1L, 3L), (2000L, 10L))
    // a healthy next run against the updated history passes
    check.getAlerts("tbl", (1 to 12).toDF("v")) shouldBe Nil // 12 <= 2*10
  }

  it("metadata-only checks still run plain constraints through the repository path") {
    implicit val runner: FakeRunner = new FakeRunner
    val repo = new FakeRepo
    val check = DeequCheck[FakeBuilder, FakeRepoBuilder, FakeRepo](
      checks = sized("size>=1", _ >= 1),
      maybeMetadata = Some(DeequMetadata(_ => repo, Instant.ofEpochMilli(5L))))
    check.getAlerts("lbl", df3) shouldBe Nil
    repo.history shouldBe Vector((5L, 3L)) // metrics recorded even with no anomaly checks
  }

  it("++ keeps the FIRST metadata and composes repository checks") {
    implicit val runner: FakeRunner = new FakeRunner
    val repoA = new FakeRepo; val repoB = new FakeRepo
    val a = DeequCheck[FakeBuilder, FakeRepoBuilder, FakeRepo](
      maybeMetadata = Some(DeequMetadata(_ => repoA, Instant.ofEpochMilli(1L))))
    val b = DeequCheck[FakeBuilder, FakeRepoBuilder, FakeRepo](
      metricsRepositoryChecks = Some((rb: FakeRepoBuilder) =>
        rb.copy(anomaly = rb.anomaly :+ ("always-ok",
          (_: Vector[Long], _: Long) => true))),
      maybeMetadata = Some(DeequMetadata(_ => repoB, Instant.ofEpochMilli(2L))))
    (a ++ b).getAlerts("lbl", df3) shouldBe Nil
    runner.repoAttachedTo shouldBe Some(repoA) // first metadata wins
    repoB.history shouldBe Vector.empty
  }

  it("wires into the flow: registration validates, alerts dispatch to handlers") {
    import graft.dataflow.spark.Graft
    import graft.dataflow.spark.actions._
    import graft.dataquality.DataQualityActions._
    implicit val runner: FakeRunner = new FakeRunner
    val handler = new RecordingAlertHandler()
    val flow = Graft.sparkFlow(spark)
      .addInput("src", Some(df3))
      .transform("src")("out")(identity(_))
      .addDataQualityCheck("out", DeequCheck[FakeBuilder, FakeRepoBuilder, FakeRepo](
        checks = sized("empty", _ == 0)), handler)
    Graft.sparkExecutor(4).execute(flow)
    handler.alerts.map(_.importance) shouldBe Seq(AlertImportance.Critical)

    // invalid composition is rejected AT REGISTRATION, before any execution
    intercept[DataQualityException] {
      Graft.sparkFlow(spark)
        .addInput("src", Some(df3))
        .transform("src")("out")(identity(_))
        .addDataQualityCheck("out", DeequCheck[FakeBuilder, FakeRepoBuilder, FakeRepo](
          metricsRepositoryChecks = Some(identity[FakeRepoBuilder] _)), handler)
    }
  }
}
