package graft.corpus

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPOutputStream

import graft.model.RawPage

/** WARC/1.0 archive writer (ISO 28500 subset) for exercising
  * [[graft.sources.Warc]] with genuine archive bytes: `response` records
  * with a full HTTP envelope (optionally chunked transfer encoding),
  * `conversion` records for text layers, interleaved `request`/`warcinfo`
  * records (which a reader must skip), and the Common Crawl gzip layout —
  * one gzip member per record, concatenated.
  */
object WarcGen {

  private def iso(ts: java.sql.Timestamp): String =
    java.time.Instant.ofEpochMilli(ts.getTime).toString

  private def record(
      out: ByteArrayOutputStream,
      warcType: String,
      uri: String,
      date: String,
      contentType: String,
      payload: Array[Byte]): Unit = {
    val h = new StringBuilder
    h.append("WARC/1.0\r\n")
    h.append(s"WARC-Type: $warcType\r\n")
    if (uri.nonEmpty) h.append(s"WARC-Target-URI: $uri\r\n")
    h.append(s"WARC-Date: $date\r\n")
    h.append(s"WARC-Record-ID: <urn:uuid:${uri.hashCode.toHexString}-$warcType>\r\n")
    h.append(s"Content-Type: $contentType\r\n")
    h.append(s"Content-Length: ${payload.length}\r\n")
    h.append("\r\n")
    out.write(h.toString.getBytes(StandardCharsets.US_ASCII))
    out.write(payload)
    out.write("\r\n\r\n".getBytes(StandardCharsets.US_ASCII))
  }

  private def httpEnvelope(body: Array[Byte], chunked: Boolean): Array[Byte] = {
    val out = new ByteArrayOutputStream(body.length + 256)
    def ascii(s: String): Unit = out.write(s.getBytes(StandardCharsets.US_ASCII))
    ascii("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=UTF-8\r\n")
    if (chunked) {
      ascii("Transfer-Encoding: chunked\r\n\r\n")
      // two chunks to exercise the de-chunker; a zero-length chunk is the
      // TERMINATOR in chunked encoding, so the first chunk is only emitted
      // when it is non-empty (a 1-byte body must not round-trip as empty)
      val mid = body.length / 2
      if (mid > 0) {
        ascii(Integer.toHexString(mid) + "\r\n")
        out.write(body, 0, mid); ascii("\r\n")
      }
      if (body.length - mid > 0) {
        ascii(Integer.toHexString(body.length - mid) + "\r\n")
        out.write(body, mid, body.length - mid); ascii("\r\n")
      }
      ascii("0\r\n\r\n")
    } else {
      ascii(s"Content-Length: ${body.length}\r\n\r\n")
      out.write(body)
    }
    out.toByteArray
  }

  /** One record serialized alone (for per-member gzip). `withRequest`
    * also emits the paired `request` record a real crawl writes.
    */
  private def pageRecords(
      row: RawPage,
      chunked: Boolean,
      withRequest: Boolean): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val date = iso(row.warc_ts)
    if (withRequest)
      record(out, "request", row.url, date, "application/http; msgtype=request",
        s"GET ${row.url} HTTP/1.1\r\nHost: example\r\n\r\n".getBytes(StandardCharsets.US_ASCII))
    if (row.html != null)
      record(out, "response", row.url, date, "application/http; msgtype=response",
        httpEnvelope(row.html, chunked))
    else
      record(out, "conversion", row.url, date, "text/plain",
        Option(row.text).getOrElse("").getBytes(StandardCharsets.UTF_8))
    out.toByteArray
  }

  /** Serialize rows as one archive. `gzip = true` uses the Common Crawl
    * layout (one gzip member per record-group, concatenated).
    */
  def archive(
      rows: Seq[RawPage],
      gzip: Boolean = false,
      chunked: Boolean = false,
      withRequests: Boolean = true,
      warcinfo: Boolean = true): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def member(bytes: Array[Byte]): Unit =
      if (!gzip) out.write(bytes)
      else {
        val gz = new GZIPOutputStream(out)
        gz.write(bytes); gz.finish(); gz.close()
      }
    if (warcinfo) {
      val w = new ByteArrayOutputStream()
      record(w, "warcinfo", "", "2026-01-01T00:00:00Z", "application/warc-fields",
        "software: graft-warcgen\r\n".getBytes(StandardCharsets.US_ASCII))
      member(w.toByteArray)
    }
    rows.foreach(r => member(pageRecords(r, chunked, withRequests)))
    out.toByteArray
  }
}
