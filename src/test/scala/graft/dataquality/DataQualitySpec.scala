package graft.dataquality

import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase
import graft.dataflow.FlowException
import graft.dataflow.spark.Graft
import graft.dataflow.spark.actions._
import graft.dataquality.DataQualityActions._

class DataQualitySpec extends SparkTestBase with Matchers {

  import spark.implicits._

  private def executor = Graft.sparkExecutor(4)

  it("completeness check warns below the threshold") {
    val handler = new RecordingAlertHandler()
    val df = Seq((Some(1), "a"), (None, "b"), (Some(3), "c")).toDF("maybe", "v")
    val flow = Graft.sparkFlow(spark)
      .addInput("src", Some(df))
      .transform("src")("checked")(identity(_))
      .addDataQualityCheck("checked",
        PrefabChecks.completenessCheck("maybe", warnBelow = 0.9), handler)
    executor.execute(flow)
    handler.alerts.map(_.importance) shouldBe Seq(AlertImportance.Warning)
    handler.alerts.head.message should include("Completeness of maybe")
  }

  it("uniqueness check counts duplicate keys") {
    val handler = new RecordingAlertHandler()
    val df = Seq((1, "a"), (1, "b"), (2, "c")).toDF("id", "v")
    val flow = Graft.sparkFlow(spark)
      .addInput("src", Some(df))
      .transform("src")("out")(identity(_))
      .addDataQualityCheck("out", PrefabChecks.uniquenessCheck(Seq("id")), handler)
    executor.execute(flow)
    handler.alerts.head.message should include("1 duplicate")
  }

  it("exception handler fails the flow on critical alerts") {
    val df = Seq((1, "a")).toDF("id", "v")
    val flow = Graft.sparkFlow(spark)
      .addInput("src", Some(df))
      .transform("src")("out")(identity(_))
      .addDataQualityCheck("out",
        PrefabChecks.recentTimestampCheck("missing_ts_col", 0L, 0L),
        new ExceptionQualityAlert())
    // the check itself errors on the missing column -> flow fails
    intercept[Exception] { executor.execute(flow) }
  }

  it("checks merge monoidally") {
    val handler = new RecordingAlertHandler()
    val check = PrefabChecks.completenessCheck("maybe", warnBelow = 0.9) ++
      PrefabChecks.uniquenessCheck(Seq("id"))
    val df = Seq((Some(1), 1), (None, 1)).toDF("maybe", "id")
    val flow = Graft.sparkFlow(spark)
      .addInput("src", Some(df))
      .transform("src")("out")(identity(_))
      .addDataQualityCheck("out", check, handler)
    executor.execute(flow)
    handler.alerts.size shouldBe 2
  }

  it("importance filtering suppresses low-rank alerts") {
    val handler = new RecordingAlertHandler(AlertImportance.Critical)
    val df = Seq((Some(1), "a"), (None, "b")).toDF("maybe", "v")
    val flow = Graft.sparkFlow(spark)
      .addInput("src", Some(df))
      .transform("src")("out")(identity(_))
      .addDataQualityCheck("out",
        PrefabChecks.completenessCheck("maybe", warnBelow = 0.9), handler)
    executor.execute(flow)
    handler.alerts shouldBe empty
  }

  it("file alert handler writes one readable file per alert") {
    val dir = s"$tmpDir/alerts"
    val handler = new FileAlertHandler(
      spark.sparkContext.hadoopConfiguration, dir, AlertImportance.Warning)
    handler.dispatch(DataQualityAlert("completeness low", AlertImportance.Critical))
    handler.dispatch(DataQualityAlert("all good", AlertImportance.Information)) // filtered
    handler.dispatch(DataQualityAlert("rows dropped", AlertImportance.Warning))
    val files = new java.io.File(dir).listFiles()
      .filterNot(_.getName.startsWith(".")) // hadoop local-FS .crc sidecars
      .sortBy(_.getName)
    files.length shouldBe 2
    files.map(_.getName).count(_.contains("critical")) shouldBe 1
    val body = new String(java.nio.file.Files.readAllBytes(
      files.find(_.getName.contains("critical")).get.toPath))
    body shouldBe "completeness low"
  }

  it("slack handler formats the webhook payload with severity colors") {
    val sent = scala.collection.mutable.ArrayBuffer[String]()
    val handler = new SlackQualityAlert(sent += _, AlertImportance.Warning)
    handler.dispatch(DataQualityAlert("""null rate "high"""", AlertImportance.Critical))
    handler.dispatch(DataQualityAlert("fyi", AlertImportance.Information)) // filtered
    handler.dispatch(DataQualityAlert("late data", AlertImportance.Warning))
    sent.toSeq shouldBe Seq(
      """{"attachments":[{"title":"null rate \"high\"","color":"danger"}]}""",
      """{"attachments":[{"title":"late data","color":"warning"}]}""")
    SlackQualityAlert.color(AlertImportance.Good) shouldBe "good"
    SlackQualityAlert.color(AlertImportance.Information) shouldBe "#439FE0"
  }

  it("email handler builds subject/body and smtp properties; auth demands credentials") {
    val sent = scala.collection.mutable.ArrayBuffer[EmailMessage]()
    val settings = SmtpSettings(host = "mail.local", port = 2525,
      to = Seq("oncall@local"), from = Some("graft@local"),
      auth = true, user = Some("u"), pass = Some("p"))
    val handler = new EmailQualityAlert(settings, sent += _, AlertImportance.Critical)
    handler.dispatch(DataQualityAlert("uniqueness broken", AlertImportance.Critical))
    handler.dispatch(DataQualityAlert("meh", AlertImportance.Warning)) // filtered
    sent.map(_.subject) shouldBe Seq("Data Quality Alert: Critical")
    sent.head.body shouldBe "uniqueness broken"
    sent.head.settings.properties("mail.smtp.host") shouldBe "mail.local"
    sent.head.settings.properties("mail.smtp.port") shouldBe "2525"
    sent.head.settings.properties("mail.smtp.starttls.enable") shouldBe "true"
    intercept[IllegalArgumentException] {
      SmtpSettings(host = "h", auth = true) // no user/pass
    }.getMessage should include("auth=true")
  }
}
