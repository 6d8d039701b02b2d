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
    /** Opportunistic TLS upgrade, like javax.mail's
      * `mail.smtp.starttls.enable`: upgrade when the server advertises
      * STARTTLS, proceed in cleartext when it doesn't. Set
      * [[starttlsRequired]] to refuse the cleartext fallback. */
    starttls: Boolean = true,
    ssl: Boolean = false,
    user: Option[String] = None,
    pass: Option[String] = None,
    connectionTimeoutMs: Long = 1000,
    timeoutMs: Long = 1000,
    /** javax.mail's `mail.smtp.starttls.required`: fail delivery instead
      * of silently downgrading (credentials + alert body in cleartext)
      * when the server does not advertise STARTTLS. */
    starttlsRequired: Boolean = false,
    /** javax.mail's `mail.smtp.ssl.checkserveridentity`: verify the
      * server certificate's hostname against [[host]] during the TLS
      * handshake (defaults ON — chain validation alone lets any
      * CA-signed cert MITM the session). Disable only for self-signed
      * test fixtures. */
    sslCheckServerIdentity: Boolean = true) {

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
    "mail.smtp.starttls.required" -> starttlsRequired.toString,
    "mail.smtp.ssl.enable" -> ssl.toString,
    "mail.smtp.ssl.checkserveridentity" -> sslCheckServerIdentity.toString,
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

object EmailQualityAlert {

  /** Default transport: a dependency-free SMTP client over the JDK socket
    * stack (RFC 5321) — EHLO, STARTTLS upgrade when the server advertises
    * it and `settings.starttls` asks for it (opportunistic, like
    * javax.mail's starttls.enable; set `settings.starttlsRequired` to fail
    * instead of falling back to cleartext; implicit TLS via
    * `settings.ssl`), AUTH LOGIN, MAIL FROM, one RCPT per to/cc/bcc,
    * dot-stuffed DATA with From/To/Cc/Subject headers (Bcc is delivered
    * via RCPT only, never a header), QUIT. Any unexpected reply class
    * raises [[DataQualityException]] so the flow surfaces delivery
    * failures. Gives the reference's EmailQualityAlert.scala:23-58
    * behaviour without its javax.mail stack. */
  def smtpTransport: EmailMessage => Unit = { msg =>
    val s = msg.settings
    val recipients = s.to ++ s.cc ++ s.bcc
    if (recipients.isEmpty)
      throw new DataQualityException("Email alert has no recipients (to/cc/bcc all empty)")
    val from = s.from.getOrElse("data-quality-alerts@localhost")

    val raw = new java.net.Socket()
    raw.connect(new java.net.InetSocketAddress(s.host, s.port),
      s.connectionTimeoutMs.toInt)
    raw.setSoTimeout(s.timeoutMs.toInt)
    // Chain validation alone is not enough: without endpoint identification
    // an active MITM can present ANY valid CA-signed cert and read AUTH
    // LOGIN credentials. "HTTPS" enables RFC 2818-style hostname matching
    // against s.host (javax.mail's mail.smtp.ssl.checkserveridentity twin);
    // settings.sslCheckServerIdentity=false opts out for self-signed labs.
    def tlsWrap(sock: java.net.Socket): java.net.Socket = {
      val ssl = javax.net.ssl.SSLSocketFactory.getDefault
        .asInstanceOf[javax.net.ssl.SSLSocketFactory]
        .createSocket(sock, s.host, s.port, true)
        .asInstanceOf[javax.net.ssl.SSLSocket]
      if (s.sslCheckServerIdentity) {
        val params = ssl.getSSLParameters
        params.setEndpointIdentificationAlgorithm("HTTPS")
        ssl.setSSLParameters(params)
      }
      ssl.startHandshake()
      ssl
    }
    var sock: java.net.Socket = if (s.ssl) tlsWrap(raw) else raw
    try {
      var in = new java.io.BufferedReader(
        new java.io.InputStreamReader(sock.getInputStream, "UTF-8"))
      var out = new java.io.BufferedWriter(
        new java.io.OutputStreamWriter(sock.getOutputStream, "UTF-8"))

      // one SMTP reply, following "250-..." continuation lines to the end
      def reply(): (Int, Seq[String]) = {
        val lines = scala.collection.mutable.Buffer[String]()
        var line = in.readLine()
        while (line != null && line.length >= 4 && line.charAt(3) == '-') {
          lines += line; line = in.readLine()
        }
        if (line == null)
          throw new DataQualityException("SMTP server closed the connection mid-reply")
        lines += line
        // a malformed reply (non-SMTP service on the port) must surface as
        // the module's documented failure type, not NumberFormatException
        val code = scala.util.Try(line.take(3).toInt).getOrElse(
          throw new DataQualityException(
            s"Malformed SMTP reply (is ${s.host}:${s.port} an SMTP server?): '$line'"))
        (code, lines.toSeq)
      }
      def send(cmd: String, expectClass: Int): Seq[String] = {
        out.write(cmd); out.write("\r\n"); out.flush()
        val (code, lines) = reply()
        if (code / 100 != expectClass)
          throw new DataQualityException(s"SMTP [$cmd] failed: ${lines.last}")
        lines
      }

      val (greet, greetLines) = reply()
      if (greet / 100 != 2)
        throw new DataQualityException(s"SMTP greeting failed: ${greetLines.last}")
      val helo = s"EHLO ${java.net.InetAddress.getLocalHost.getHostName}"
      var caps = send(helo, 2)
      val advertisesTls = caps.exists(_.toUpperCase.contains("STARTTLS"))
      if (s.starttlsRequired && !s.ssl && !advertisesTls)
        throw new DataQualityException(
          s"STARTTLS required but ${s.host}:${s.port} does not advertise it — " +
            "refusing to send credentials/content in cleartext")
      if (s.starttls && !s.ssl && advertisesTls) {
        send("STARTTLS", 2)
        sock = tlsWrap(sock)
        in = new java.io.BufferedReader(
          new java.io.InputStreamReader(sock.getInputStream, "UTF-8"))
        out = new java.io.BufferedWriter(
          new java.io.OutputStreamWriter(sock.getOutputStream, "UTF-8"))
        caps = send(helo, 2) // capabilities reset after the TLS upgrade
      }
      if (s.auth) {
        val b64 = java.util.Base64.getEncoder
        def enc(v: String) = b64.encodeToString(v.getBytes("UTF-8"))
        send("AUTH LOGIN", 3)
        send(enc(s.user.get), 3)
        send(enc(s.pass.get), 2) // 235 authentication successful
      }
      send(s"MAIL FROM:<$from>", 2)
      recipients.foreach(r => send(s"RCPT TO:<$r>", 2))
      send("DATA", 3) // 354 start mail input
      val headers =
        Seq(s"From: $from") ++
          (if (s.to.nonEmpty) Seq(s"To: ${s.to.mkString(", ")}") else Nil) ++
          (if (s.cc.nonEmpty) Seq(s"Cc: ${s.cc.mkString(", ")}") else Nil) ++
          Seq(s"Subject: ${msg.subject}",
            "MIME-Version: 1.0",
            "Content-Type: text/plain; charset=UTF-8")
      // dot-stuffing: a body line starting with '.' doubles it (RFC 5321
      // §4.5.2). Split on \r?\n so a CRLF-terminated body doesn't emit
      // bare-CR "\r\r\n" lines (RFC 5321 §2.3.8 forbids bare CR).
      val body = msg.body.split("\r?\n", -1).toSeq
        .map(l => if (l.startsWith(".")) "." + l else l)
      out.write((headers ++ Seq("") ++ body).mkString("\r\n"))
      out.write("\r\n.\r\n"); out.flush()
      val (accepted, accLines) = reply()
      if (accepted / 100 != 2)
        throw new DataQualityException(s"SMTP message rejected: ${accLines.last}")
      send("QUIT", 2) // 221 closing
    } finally {
      scala.util.Try(sock.close()); scala.util.Try(raw.close())
    }
  }
}
