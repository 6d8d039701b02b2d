package graft.dataquality

/** Outbound alert channels with INJECTABLE transports: the payload
  * formatting (the part worth testing) is pure, and the wire call is a
  * plain function — production wires a real HTTP/SMTP client, tests a
  * recording stub. Mirrors the reference's Slack/email alerters
  * (waimak-dataquality/.../SlackQualityAlert.scala:24-55,
  * EmailQualityAlert.scala:23-58) minus their vendored HTTP/javax.mail
  * stacks, which a zero-egress build cannot exercise anyway.
  */
object SlackQualityAlert {

  /** Slack attachment colors per importance (reference
    * SlackQualityAlert.scala:70-84). */
  def color(importance: AlertImportance): String = importance match {
    case AlertImportance.Critical => "danger"
    case AlertImportance.Warning => "warning"
    case AlertImportance.Good => "good"
    case AlertImportance.Information => "#439FE0"
  }

  private def jsonEscape(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** The webhook payload: one attachment carrying the message + severity
    * color — byte-compatible with the reference's circe encoding of
    * `SlackMessage(attachments = [SlackAttachment(title, color)])`. */
  def payload(alert: DataQualityAlert): String =
    s"""{"attachments":[{"title":"${jsonEscape(alert.message)}","color":"${color(alert.importance)}"}]}"""

  /** Default transport: POST via the JDK's own HTTP client (no vendor dep).
    * Non-2xx responses raise, so the flow surfaces delivery failures. */
  def httpTransport(webhookUrl: String): String => Unit = { json =>
    val client = java.net.http.HttpClient.newHttpClient()
    val req = java.net.http.HttpRequest.newBuilder()
      .uri(java.net.URI.create(webhookUrl))
      .header("Content-Type", "application/json")
      .POST(java.net.http.HttpRequest.BodyPublishers.ofString(json))
      .build()
    val resp = client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new DataQualityException(
        s"Slack webhook returned HTTP ${resp.statusCode()}")
  }
}

/** Slack channel alerter: formats the webhook JSON and hands it to the
  * transport. */
class SlackQualityAlert(transport: String => Unit,
    override val alertOn: AlertImportance = AlertImportance.Information)
  extends DataQualityAlertHandler {
  def handleAlert(alert: DataQualityAlert): Unit =
    transport(SlackQualityAlert.payload(alert))
}

/** SMTP connection settings (reference EmailQualityAlert.scala:88-140's
  * SMTPEmailSettings, minus the javax.mail Session: properties come out as
  * a plain map for whatever mail client the deployment wires in). */
final case class SmtpSettings(
    host: String,
    port: Int = 25,
    to: Seq[String] = Seq.empty,
    cc: Seq[String] = Seq.empty,
    bcc: Seq[String] = Seq.empty,
    from: Option[String] = None,
    auth: Boolean = false,
    starttls: Boolean = true,
    ssl: Boolean = false,
    user: Option[String] = None,
    pass: Option[String] = None,
    connectionTimeoutMs: Long = 1000,
    timeoutMs: Long = 1000) {

  if (auth)
    require(user.nonEmpty && pass.nonEmpty,
      "Both user and pass must be specified when using auth=true")

  /** javax.mail-compatible smtp properties (reference
    * EmailQualityAlert.scala:104-113). */
  def properties: Map[String, String] = Map(
    "mail.transport.protocol" -> "smtp",
    "mail.smtp.host" -> host,
    "mail.smtp.port" -> port.toString,
    "mail.smtp.auth" -> auth.toString,
    "mail.smtp.starttls.enable" -> starttls.toString,
    "mail.smtp.ssl.enable" -> ssl.toString,
    "mail.smtp.connectiontimeout" -> connectionTimeoutMs.toString,
    "mail.smtp.timeout" -> timeoutMs.toString)
}

/** A fully-formatted outbound mail, ready for any SMTP client. */
final case class EmailMessage(
    settings: SmtpSettings,
    subject: String,
    body: String)

/** Email alerter: builds the subject/body the reference builds
  * (`"Data Quality Alert: <importance>"` + the alert message) and hands the
  * message to the transport. */
class EmailQualityAlert(settings: SmtpSettings,
    transport: EmailMessage => Unit,
    override val alertOn: AlertImportance = AlertImportance.Information)
  extends DataQualityAlertHandler {

  def handleAlert(alert: DataQualityAlert): Unit =
    transport(EmailMessage(settings,
      subject = s"Data Quality Alert: ${alert.importance}",
      body = alert.message))
}
