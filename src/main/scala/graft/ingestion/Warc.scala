package graft.ingestion

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** REAL WARC (ISO 28500) record parsing — the container format web-crawl
  * corpora actually arrive in (Common Crawl et al. publish WARC; the
  * public spec is at iipc.github.io/warc-specifications).
  *
  * Parsing is BYTE-exact: headers end at the first CRLFCRLF, the body is
  * exactly `Content-Length` BYTES (never characters — a multi-byte UTF-8
  * body sliced by chars would corrupt every record after it), and each
  * record is terminated by CRLFCRLF before the next `WARC/` version line.
  * Runs in the same per-partition kernel seam as the media decodes
  * ([[Multimodal.MediaKernel]]), so a 100 TB crawl ingests as: binary
  * payload column → [[warcRecords]] → text pipeline. Payloads are usually
  * gzip/zstd members — chain [[Multimodal.decompressTextKernel]]'s codec
  * sniff upstream.
  */
object Warc {

  /** One parsed record. `recIdx` is the record's position in its payload.
    * A malformed payload yields its successfully parsed record PREFIX (if
    * any) plus one (-1, "bad", ...) quarantine row marking the truncation —
    * corrupt crawl segments are routine and must never kill the job nor
    * discard the good records ahead of the corruption. */
  final case class WarcRecord(id: Long, recIdx: Int, warcType: String,
      targetUri: String, contentLength: Long, body: String)

  private def bad(id: Long) =
    Seq(WarcRecord(id, -1, "bad", "", 0L, null))

  /** Index of the first CRLFCRLF at/after `from`, or -1. */
  private def crlfcrlf(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n')
        return i
      i += 1
    }
    -1
  }

  def warcRecordsKernel(charset: String = "UTF-8"): Multimodal.MediaKernel[Seq[WarcRecord]] = () => {
    (id: Long, bytesOrNull: Array[Byte]) => {
      if (bytesOrNull == null || bytesOrNull.isEmpty) bad(id)
      else {
        val b = bytesOrNull
        val out = scala.collection.mutable.ArrayBuffer.empty[WarcRecord]
        var pos = 0
        var broken = false
        while (!broken && pos < b.length) {
          // skip inter-record CRLFs
          while (pos + 1 < b.length && b(pos) == '\r' && b(pos + 1) == '\n') pos += 2
          if (pos >= b.length) () // clean end
          else {
            val headerEnd = crlfcrlf(b, pos)
            val versioned = pos + 5 <= b.length &&
              new String(b, pos, 5, "ISO-8859-1") == "WARC/"
            if (!versioned || headerEnd < 0) broken = true
            else {
              // header block: version line + "Name: value" lines (8859-1 —
              // WARC headers are octets; URIs are ASCII-safe)
              val lines = new String(b, pos, headerEnd - pos, "ISO-8859-1")
                .split("\r\n")
              def header(name: String): Option[String] = lines.collectFirst {
                case l if l.regionMatches(true, 0, name + ":", 0, name.length + 1) =>
                  l.substring(name.length + 1).trim
              }
              header("Content-Length").flatMap(v =>
                scala.util.Try(v.toLong).toOption) match {
                case None => broken = true
                // negative length = corrupt header; without this guard the
                // new String(..., -n, ...) below throws instead of
                // quarantining (review finding, round 10)
                case Some(len) if len < 0 => broken = true
                case Some(len) if headerEnd + 4 + len > b.length => broken = true
                case Some(len) =>
                  val bodyStart = headerEnd + 4
                  out += WarcRecord(id, out.length,
                    header("WARC-Type").getOrElse(""),
                    header("WARC-Target-URI").getOrElse(""),
                    len,
                    new String(b, bodyStart, len.toInt, charset))
                  // the record's CRLFCRLF terminator (and any padding) is
                  // consumed by the next iteration's skip; junk that is
                  // neither CRLF nor a WARC/ version line breaks there
                  pos = bodyStart + len.toInt
              }
            }
          }
        }
        // keep the parsed PREFIX when a later record is truncated (routine
        // in real crawl data — chopped transfers): the valid records stay,
        // plus one quarantine row marking where parsing stopped. All-or-
        // nothing here silently amplified one bad tail record into losing
        // the whole multi-record payload (review finding, round 10).
        if (broken) out.toSeq ++ bad(id)
        else if (out.isEmpty) bad(id)
        else out.toSeq
      }
    }
  }

  /** Parsed records for a (id, content) frame —
    * (doc_id, rec_idx, warc_type, target_uri, content_length, body). */
  def warcRecords(df: DataFrame, idCol: String, contentCol: String): Dataset[WarcRecord] =
    Multimodal.decodePartitionedFlat(df, idCol, contentCol, warcRecordsKernel())(
      org.apache.spark.sql.Encoders.product[WarcRecord])

  /** REAL WARC synthesis: spec-compliant records (version line, headers,
    * CRLFCRLF, Content-Length-measured body, CRLFCRLF terminator) — the
    * fixture/egress twin of the parser. */
  def warcBytes(records: Seq[(String, String, String)],
      charset: String = "UTF-8"): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    records.foreach { case (warcType, uri, body) =>
      val bodyBytes = body.getBytes(charset)
      val headers = new StringBuilder()
        .append("WARC/1.0\r\n")
        .append(s"WARC-Type: $warcType\r\n")
      if (uri.nonEmpty) headers.append(s"WARC-Target-URI: $uri\r\n")
      headers.append(s"Content-Length: ${bodyBytes.length}\r\n\r\n")
      out.write(headers.toString.getBytes("ISO-8859-1"))
      out.write(bodyBytes)
      out.write("\r\n\r\n".getBytes("ISO-8859-1"))
    }
    out.toByteArray
  }
}
