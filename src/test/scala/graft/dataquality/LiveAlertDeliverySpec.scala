package graft.dataquality

import org.scalatest.matchers.should.Matchers
import org.scalatest.funspec.AnyFunSpec

import java.io.{BufferedReader, BufferedWriter, InputStreamReader, OutputStreamWriter}
import java.net.{InetAddress, InetSocketAddress, ServerSocket}

import scala.collection.mutable

/** LIVE delivery of both alert channels over real sockets: an in-process
  * SMTP server receives an actual RFC 5321 session from
  * [[EmailQualityAlert.smtpTransport]], and an in-process HTTP server
  * receives an actual webhook POST from [[SlackQualityAlert.httpTransport]].
  * Closes the last "formats payloads but has never sent one" gap — the
  * wire protocol itself is exercised, not a recording stub. (No Spark
  * session needed — pure JVM networking.) */
class LiveAlertDeliverySpec extends AnyFunSpec with Matchers {

  /** Minimal single-connection SMTP server recording the client's dialogue.
    * `advertiseAuth` adds AUTH LOGIN to the EHLO capabilities;
    * `rejectRcpt` replies 550 to every RCPT. Never advertises STARTTLS, so
    * the client's plain path runs (the upgrade branch only fires on an
    * advertised capability). */
  private class FakeSmtp(advertiseAuth: Boolean = false,
      rejectRcpt: Boolean = false) {
    val server = new ServerSocket(0, 1, InetAddress.getLoopbackAddress)
    val commands = mutable.Buffer[String]()
    val data = mutable.Buffer[String]()
    val thread = new Thread(() => {
      val sock = server.accept()
      val in = new BufferedReader(new InputStreamReader(sock.getInputStream, "UTF-8"))
      val out = new BufferedWriter(new OutputStreamWriter(sock.getOutputStream, "UTF-8"))
      def w(s: String): Unit = { out.write(s + "\r\n"); out.flush() }
      w("220 fake.local ESMTP")
      var inData = false
      var authState = 0 // 1 = awaiting base64 user, 2 = awaiting base64 pass
      var line = in.readLine()
      var open = true
      while (open && line != null) {
        if (inData) {
          if (line == ".") { inData = false; w("250 2.0.0 queued") }
          else data += line
        } else {
          commands += line
          val u = line.toUpperCase
          if (u.startsWith("EHLO")) {
            if (advertiseAuth) out.write("250-fake.local\r\n250-AUTH LOGIN\r\n")
            else out.write("250-fake.local\r\n")
            w("250 OK")
          }
          else if (u == "AUTH LOGIN") { authState = 1; w("334 VXNlcm5hbWU6") }
          else if (authState == 1) { authState = 2; w("334 UGFzc3dvcmQ6") }
          else if (authState == 2) { authState = 0; w("235 2.7.0 accepted") }
          else if (u.startsWith("MAIL")) w("250 2.1.0 ok")
          else if (u.startsWith("RCPT"))
            if (rejectRcpt) w("550 5.1.1 no such user") else w("250 2.1.5 ok")
          else if (u == "DATA") { inData = true; w("354 go ahead") }
          else if (u == "QUIT") { w("221 bye"); open = false }
          else w("250 ok")
        }
        if (open) line = in.readLine()
      }
      sock.close()
    })
    thread.setDaemon(true); thread.start()
    def port: Int = server.getLocalPort
    def close(): Unit = { thread.join(5000); server.close() }
  }

  describe("EmailQualityAlert over a real SMTP session") {

    it("delivers MAIL/RCPT/DATA with headers, bcc off-header, and dot-stuffing") {
      val smtp = new FakeSmtp()
      val settings = SmtpSettings(host = "127.0.0.1", port = smtp.port,
        to = Seq("oncall@example.org", "data@example.org"),
        cc = Seq("lead@example.org"), bcc = Seq("audit@example.org"),
        from = Some("alerts@example.org"))
      val handler = new EmailQualityAlert(settings,
        EmailQualityAlert.smtpTransport, AlertImportance.Warning)
      handler.handleAlert(DataQualityAlert(
        "nulls in key column\n.leading dot line", AlertImportance.Critical))
      smtp.close()

      smtp.commands.count(_.toUpperCase.startsWith("RCPT TO:")) shouldBe 4
      smtp.commands should contain("MAIL FROM:<alerts@example.org>")
      smtp.commands should contain("RCPT TO:<audit@example.org>")
      smtp.data should contain("Subject: Data Quality Alert: Critical")
      smtp.data should contain("To: oncall@example.org, data@example.org")
      smtp.data should contain("Cc: lead@example.org")
      smtp.data.exists(_.contains("audit@example.org")) shouldBe false // bcc
      smtp.data should contain("nulls in key column")
      smtp.data should contain("..leading dot line") // stuffed on the wire
    }

    it("raises a DataQualityException when the server rejects a recipient") {
      val smtp = new FakeSmtp(rejectRcpt = true)
      val settings = SmtpSettings(host = "127.0.0.1", port = smtp.port,
        to = Seq("nobody@example.org"))
      val ex = intercept[DataQualityException] {
        EmailQualityAlert.smtpTransport(
          EmailMessage(settings, "s", "b"))
      }
      ex.getMessage should include("550")
      smtp.server.close()
    }

    it("authenticates with AUTH LOGIN when asked") {
      val smtp = new FakeSmtp(advertiseAuth = true)
      val settings = SmtpSettings(host = "127.0.0.1", port = smtp.port,
        to = Seq("x@example.org"), auth = true,
        user = Some("bot"), pass = Some("hunter2"))
      EmailQualityAlert.smtpTransport(EmailMessage(settings, "s", "b"))
      smtp.close()
      val b64 = java.util.Base64.getEncoder
      smtp.commands should contain("AUTH LOGIN")
      smtp.commands should contain(b64.encodeToString("bot".getBytes("UTF-8")))
      smtp.commands should contain(b64.encodeToString("hunter2".getBytes("UTF-8")))
    }

    it("refuses a message with no recipients before touching the network") {
      val settings = SmtpSettings(host = "127.0.0.1", port = 1)
      val ex = intercept[DataQualityException] {
        EmailQualityAlert.smtpTransport(EmailMessage(settings, "s", "b"))
      }
      ex.getMessage should include("no recipients")
    }
  }

  describe("SlackQualityAlert over a real HTTP POST") {

    it("POSTs the webhook JSON with the right content type") {
      val received = mutable.Buffer[(String, String)]() // (content-type, body)
      val http = com.sun.net.httpserver.HttpServer.create(
        new InetSocketAddress(InetAddress.getLoopbackAddress, 0), 0)
      http.createContext("/hook", exchange => {
        val body = new String(exchange.getRequestBody.readAllBytes(), "UTF-8")
        received += ((exchange.getRequestHeaders.getFirst("Content-Type"), body))
        exchange.sendResponseHeaders(200, 2)
        exchange.getResponseBody.write("ok".getBytes); exchange.close()
      })
      http.start()
      try {
        val url = s"http://127.0.0.1:${http.getAddress.getPort}/hook"
        val handler = new SlackQualityAlert(
          SlackQualityAlert.httpTransport(url), AlertImportance.Warning)
        handler.handleAlert(DataQualityAlert("late \"events\"", AlertImportance.Warning))
        received should have size 1
        received.head._1 shouldBe "application/json"
        received.head._2 shouldBe
          """{"attachments":[{"title":"late \"events\"","color":"warning"}]}"""
      } finally http.stop(0)
    }

    it("raises on a non-2xx webhook response") {
      val http = com.sun.net.httpserver.HttpServer.create(
        new InetSocketAddress(InetAddress.getLoopbackAddress, 0), 0)
      http.createContext("/hook", exchange => {
        exchange.sendResponseHeaders(500, -1); exchange.close()
      })
      http.start()
      try {
        val url = s"http://127.0.0.1:${http.getAddress.getPort}/hook"
        val ex = intercept[DataQualityException] {
          SlackQualityAlert.httpTransport(url)("{}")
        }
        ex.getMessage should include("500")
      } finally http.stop(0)
    }
  }
}
