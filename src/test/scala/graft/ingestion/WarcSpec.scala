package graft.ingestion

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

class WarcSpec extends SparkTestBase with Matchers {

  import spark.implicits._

  private def parse(payloads: (Long, Array[Byte])*) =
    Warc.warcRecords(payloads.toDF("doc_id", "content"), "doc_id", "content")
      .collect().groupBy(_.id)

  it("round-trips multi-record payloads byte-exactly, including multi-byte UTF-8 bodies") {
    // Content-Length counts BYTES: 'héllo — κείμενο 🙂' is longer in bytes
    // than chars; a char-sliced parser corrupts every record after it
    val uni = "héllo — κείμενο 🙂"
    val bytes = Warc.warcBytes(Seq(
      ("warcinfo", "", "engine=graft"),
      ("response", "https://example.org/a", uni),
      ("response", "https://example.org/b", "plain ascii after unicode")))
    val got = parse(1L -> bytes)(1L).sortBy(_.recIdx)
    got.map(_.warcType).toSeq shouldBe Seq("warcinfo", "response", "response")
    got(1).body shouldBe uni
    got(1).contentLength shouldBe uni.getBytes("UTF-8").length.toLong
    got(1).targetUri shouldBe "https://example.org/a"
    got(2).body shouldBe "plain ascii after unicode"
    got(0).targetUri shouldBe ""
  }

  it("quarantines malformed payloads instead of failing the job") {
    val truncated = {
      // Content-Length larger than the remaining bytes
      val b = Warc.warcBytes(Seq(("response", "https://x", "full body")))
      b.take(b.length - 6)
    }
    val got = parse(
      1L -> "not a warc at all".getBytes("UTF-8"),
      2L -> truncated,
      3L -> null,
      4L -> Warc.warcBytes(Seq(("response", "https://ok", "fine"))))
    got(1L).map(r => (r.recIdx, r.warcType)).toSeq shouldBe Seq((-1, "bad"))
    got(2L).map(r => (r.recIdx, r.warcType)).toSeq shouldBe Seq((-1, "bad"))
    got(3L).map(r => (r.recIdx, r.warcType)).toSeq shouldBe Seq((-1, "bad"))
    got(4L).head.body shouldBe "fine"
  }

  it("keeps the parsed prefix when a later record is truncated") {
    val twoThenChopped = {
      val good = Warc.warcBytes(Seq(
        ("warcinfo", "", "engine=graft"),
        ("response", "https://example.org/a", "first body")))
      val tail = Warc.warcBytes(Seq(("response", "https://example.org/b", "never finishes")))
      good ++ tail.take(tail.length - 10) // chop mid-body
    }
    val got = parse(1L -> twoThenChopped)(1L).sortBy(_.recIdx)
    // the two complete records survive; one quarantine row marks the cut
    got.map(r => (r.recIdx, r.warcType)).toSeq shouldBe
      Seq((-1, "bad"), (0, "warcinfo"), (1, "response"))
    got.find(_.recIdx == 1).get.body shouldBe "first body"
  }

  it("a negative Content-Length quarantines instead of crashing the task") {
    val raw = ("WARC/1.0\r\n" +
      "WARC-Type: response\r\n" +
      "Content-Length: -5\r\n\r\n" +
      "body\r\n\r\n").getBytes("ISO-8859-1")
    val got = parse(1L -> raw)(1L)
    got.map(r => (r.recIdx, r.warcType)).toSeq shouldBe Seq((-1, "bad"))
  }

  it("header names match case-insensitively and values trim (real crawls vary)") {
    val raw = ("WARC/1.0\r\n" +
      "warc-type:   metadata\r\n" +
      "CONTENT-LENGTH: 3\r\n\r\n" +
      "abc\r\n\r\n").getBytes("ISO-8859-1")
    val got = parse(1L -> raw)(1L)
    got.head.warcType shouldBe "metadata"
    got.head.body shouldBe "abc"
  }
}
