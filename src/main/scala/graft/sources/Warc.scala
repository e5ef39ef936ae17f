package graft.sources

import java.io.{BufferedInputStream, EOFException, InputStream}
import java.nio.charset.StandardCharsets
import java.sql.Timestamp
import java.util.zip.GZIPInputStream

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.model.RawPage

/** WARC (ISO 28500) source — the container Common Crawl actually ships, so
  * a crawl pipeline can start from raw `.warc` / `.warc.gz` files instead
  * of assuming the page table already exists.
  *
  * Supported: WARC/1.0 and /1.1 records (version line, named headers,
  * Content-Length-framed payload, CRLF record separators); `response`
  * records carry an HTTP response whose body becomes the page payload
  * (status line + headers are stripped; chunked transfer encoding is
  * de-chunked); `conversion` records are taken as already-extracted text;
  * all other record types (request, metadata, warcinfo, revisit) are
  * skipped. Gzip inputs use the Common Crawl layout — one gzip member per
  * record, concatenated — which `GZIPInputStream` reads transparently as a
  * multi-member stream. Malformed records are CONTAINED: parsing resumes
  * at the next `WARC/` magic; `toTable` totals contained errors in a
  * `warc_parse_errors` accumulator and logs a per-file line, so one
  * truncated record cannot poison a 1 GB archive NOR vanish silently (the
  * same B4/B8 lenient discipline as the extraction kernels). Only
  * successful captures (2xx, or envelope-less payloads) become rows —
  * crawls are full of redirect stubs and error pages whose bodies are not
  * the page at that url.
  *
  * Scale shape: `toTable` reads via `sparkContext.binaryFiles`, which
  * hands each archive to ONE task as a STREAM (`PortableDataStream`) —
  * records are decoded incrementally, never a whole decompressed archive
  * in memory. This is the north star's sanctioned "forced binary-parse
  * inner loop" RDD use; everything downstream is the normal DataFrame
  * pipeline. Parallelism = number of archive files (Common Crawl segments
  * are ~1 GB each, thousands per crawl — ample), and the output is
  * url-hash-keyed by the extraction job exactly like table input.
  */
object Warc {

  final case class WarcRecord(
      warcType: String,
      targetUri: String,
      date: Timestamp,
      contentType: String,
      payload: Array[Byte])

  final case class ParseResult(records: Vector[WarcRecord], errors: Int)

  private val WarcMagic = "WARC/".getBytes(StandardCharsets.US_ASCII)

  /** Reads exactly `n` bytes or throws EOF — payloads are length-framed. */
  private def readFully(in: InputStream, n: Int): Array[Byte] = {
    val out = new Array[Byte](n)
    var done = 0
    while (done < n) {
      val r = in.read(out, done, n - done)
      if (r < 0) throw new EOFException(s"warc payload truncated at $done/$n")
      done += r
    }
    out
  }

  /** One header line up to LF (CR stripped); None at EOF. */
  private def readLine(in: InputStream): Option[String] = {
    val sb = new java.lang.StringBuilder(96)
    var b = in.read()
    if (b < 0) return None
    while (b >= 0 && b != '\n') {
      if (b != '\r') sb.append(b.toChar)
      b = in.read()
    }
    Some(sb.toString)
  }

  /** ISO-8601 WARC-Date -> Timestamp (epoch millis; no wall clock). */
  private def parseDate(s: String): Timestamp =
    try new Timestamp(java.time.Instant.parse(s.trim).toEpochMilli)
    catch { case _: Exception => new Timestamp(0L) }

  /** Strip the HTTP envelope from a `response` payload: status line +
    * headers end at the first blank line; a `Transfer-Encoding: chunked`
    * body is de-chunked (length-prefixed hex chunks).
    */
  private def httpBody(payload: Array[Byte],
      onError: () => Unit = () => ()): Array[Byte] = {
    // find CRLFCRLF (tolerate LFLF)
    var i = 0
    var headerEnd = -1
    while (headerEnd < 0 && i < payload.length - 1) {
      if (payload(i) == '\n' &&
        (i + 1 < payload.length && payload(i + 1) == '\n')) headerEnd = i + 2
      else if (payload(i) == '\n' && i + 2 < payload.length &&
        payload(i + 1) == '\r' && payload(i + 2) == '\n') headerEnd = i + 3
      i += 1
    }
    if (headerEnd < 0) return payload // no envelope: raw body
    val head = new String(payload, 0, headerEnd, StandardCharsets.ISO_8859_1)
    val body = java.util.Arrays.copyOfRange(payload, headerEnd, payload.length)
    // order matters: chunk sizes count WIRE bytes, so de-chunk the raw
    // body first, then normalize the charset of the assembled content
    transcode(head, dechunk(head, body, onError))
  }

  /** Charset normalization: the pipeline consumes UTF-8 text; a real crawl
    * is full of latin-1 / windows-1252 / shift_jis captures whose bytes
    * would otherwise decode as replacement chars. The envelope's
    * Content-Type charset is the declared source encoding; transcoding
    * failures (bad charset name, broken bytes) keep the raw body — the
    * quality gate downstream is the judge of garbled content.
    */
  private def transcode(head: String, body: Array[Byte]): Array[Byte] = {
    val m = java.util.regex.Pattern
      .compile("(?i)content-type:\\s*text/[^\n]*charset=\"?([A-Za-z0-9_.:\\-]+)")
      .matcher(head)
    // only text/* media types are transcoded, and never a payload whose
    // magic says binary — crawls are full of mislabeled responses (a PDF
    // served as text/html; charset=...) and re-encoding binary bytes
    // through a charset would corrupt them
    if (!m.find() || looksBinary(body)) body
    else {
      val cs = m.group(1)
      if (cs.equalsIgnoreCase("utf-8") || cs.equalsIgnoreCase("utf8")) body
      else
        try new String(body, java.nio.charset.Charset.forName(cs))
          .getBytes(StandardCharsets.UTF_8)
        catch { case _: Exception => body }
    }
  }

  /** Conservative binary sniff: known magics the pipeline routes on. */
  private def looksBinary(b: Array[Byte]): Boolean =
    (b.length >= 4 && b(0) == '%' && b(1) == 'P' && b(2) == 'D' && b(3) == 'F') ||
      (b.length >= 2 && (b(0) & 0xff) == 0x1f && (b(1) & 0xff) == 0x8b) ||
      (b.length >= 4 && (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G')

  /** Tolerant match for the chunked transfer coding: real crawls carry
    * `Transfer-Encoding:chunked` (no space) and extra whitespace variants,
    * consistent with the tolerant charset regex in `transcode`.
    */
  private val ChunkedRe =
    java.util.regex.Pattern.compile("(?i)transfer-encoding:\\s*chunked")

  private def dechunk(head: String, body: Array[Byte],
      onError: () => Unit = () => ()): Array[Byte] = {
    if (!ChunkedRe.matcher(head).find()) body
    else {
      // de-chunk: hex length CRLF data CRLF ... 0 CRLF CRLF. A hostile or
      // broken server can emit arbitrary chunk-size lines. Outcomes:
      //  - 0-terminator seen            -> assembled content (success)
      //  - truncated capture AFTER at least one framed chunk (data cut
      //    mid-chunk, or the next size line missing/unterminated) ->
      //    assembled prefix incl. any partial final-chunk data, counted
      //  - framing failure BEFORE anything framed (invalid or absent
      //    first size line) -> the RAW body (never a partially-dechunked
      //    buffer) and the error is counted
      try {
        val out = new java.io.ByteArrayOutputStream(body.length)
        var p = 0
        var chunks = 0
        while (true) {
          var lineEnd = p
          while (lineEnd < body.length && body(lineEnd) != '\n') lineEnd += 1
          if (lineEnd >= body.length) {
            // size line itself missing/unterminated: truncated capture if
            // at least one chunk framed correctly, else the framing never
            // held and the raw body is the honest payload
            if (chunks == 0) { onError(); return body }
            onError()
            return out.toByteArray
          }
          val lenStr = new String(body, p, lineEnd - p, StandardCharsets.US_ASCII)
            .trim.takeWhile(c => Character.digit(c, 16) >= 0)
          // Long parse: a size line above Int.MaxValue is invalid framing
          val lenL = if (lenStr.isEmpty || lenStr.length > 15) -1L
            else java.lang.Long.parseLong(lenStr, 16)
          if (lenL == 0L) return out.toByteArray // 0-terminator: success
          if (lenL < 0L) {
            // invalid size line: mid-stream it follows correctly framed
            // chunks (corruption — keep the assembled prefix); on the
            // FIRST line the framing never held (raw body back)
            onError()
            return if (chunks == 0) body else out.toByteArray
          }
          val start = lineEnd + 1
          if (lenL > (body.length - start).toLong) {
            // declared size overruns the capture: truncated final chunk —
            // keep what framed plus the cut chunk's partial data
            onError()
            if (start < body.length) out.write(body, start, body.length - start)
            return out.toByteArray
          }
          val len = lenL.toInt
          out.write(body, start, len)
          chunks += 1
          p = start + len
          // skip trailing CRLF
          if (p < body.length && body(p) == '\r') p += 1
          if (p < body.length && body(p) == '\n') p += 1
        }
        body // unreachable
      } catch { case _: Exception => onError(); body }
    }
  }

  /** HTTP status of a response payload; -1 when no parsable status line. */
  private def httpStatus(payload: Array[Byte]): Int = {
    var e = 0
    while (e < payload.length && e < 64 && payload(e) != '\n') e += 1
    val line = new String(payload, 0, e, StandardCharsets.ISO_8859_1)
    if (!line.startsWith("HTTP/")) return -1
    val parts = line.split(" ")
    if (parts.length < 2) return -1
    try parts(1).trim.toInt
    catch { case _: NumberFormatException => -1 }
  }

  /** LAZY record iterator over a (possibly multi-member-gzip) WARC stream:
    * one record is decoded per `next()`, so a 1 GB archive never
    * materializes in task memory. Contained errors: on any malformed
    * record the stream resyncs at the next `WARC/` magic and `onError` is
    * invoked. The caller owns closing `raw` once the iterator is drained.
    */
  def recordIterator(raw: InputStream, onError: () => Unit = () => ()): Iterator[WarcRecord] =
    new Iterator[WarcRecord] {
      private val in0 = new BufferedInputStream(raw, 1 << 16)
      private val in: InputStream = {
        in0.mark(2)
        val m1 = in0.read(); val m2 = in0.read()
        in0.reset()
        new BufferedInputStream(
          if (m1 == 0x1f && m2 == 0x8b) new GZIPInputStream(in0, 1 << 16) else in0,
          1 << 16)
      }

      private def resync(): Boolean = {
        // scan forward for the next "WARC/" magic
        var matched = 0
        var b = in.read()
        while (b >= 0) {
          if (b == WarcMagic(matched)) {
            matched += 1
            if (matched == WarcMagic.length) return true
          } else matched = if (b == WarcMagic(0)) 1 else 0
          b = in.read()
        }
        false
      }

      private var atRecord: Boolean = {
        val first = readLine(in)
        if (first.exists(_.startsWith("WARC/"))) true
        else if (first.isDefined) {
          // corrupt archive head (truncated download, overwritten start):
          // contained like every other malformed region, and COUNTED
          onError()
          resync()
        } else false
      }
      private var pending: WarcRecord = null

      /** Decode forward until a keepable record or stream end. */
      private def advance(): Unit = {
        while (pending == null && atRecord) {
          graft.util.StepBudget.tick(64L)
          try {
            val headers = scala.collection.mutable.Map.empty[String, String]
            var line = readLine(in).getOrElse(throw new EOFException("warc headers truncated"))
            while (line.nonEmpty) {
              val c = line.indexOf(':')
              if (c > 0)
                headers(line.substring(0, c).trim.toLowerCase) = line.substring(c + 1).trim
              line = readLine(in).getOrElse(throw new EOFException("warc headers truncated"))
            }
            val len = headers
              .getOrElse("content-length", throw new EOFException("no content-length"))
              .toInt
            // hard cap well above real Common Crawl record sizes but low
            // enough that a hostile length cannot OOM an executor running
            // several archive tasks (the allocation happens before any
            // content validation)
            if (len < 0 || len > (1 << 26))
              throw new EOFException(s"implausible content-length $len")
            // recoverable corruption: a bogus length that overruns the
            // stream would otherwise consume everything to EOF and lose
            // the tail of the archive. For normally-sized records, mark
            // before the payload read and reset on failure so resync()
            // restarts from the payload start (bounded buffering); records
            // above the mark bound trade that recovery for memory safety.
            val recoverable = len <= (1 << 22)
            // readlimit covers the payload plus a generous separator scan
            // (the blank-line skip after the payload reads ahead of the
            // mark; 4 KiB bounds it for any realistic separator garbage)
            if (recoverable) in.mark(len + 4096)
            val payload =
              try readFully(in, len)
              catch {
                case e: EOFException if recoverable => in.reset(); throw e
              }
            graft.util.StepBudget.tick(len.toLong)
            val wtype = headers.getOrElse("warc-type", "")
            // only SUCCESSFUL captures become page rows: real crawls are
            // full of 301 redirect stubs, 404 pages and 5xx bodies whose
            // content is NOT the page at that url (a missing/unparsable
            // status line is kept — conversion-style raw payloads)
            val status = if (wtype == "response") httpStatus(payload) else 200
            if ((wtype == "response" && (status == -1 || (status >= 200 && status < 300))) ||
              wtype == "conversion") {
              pending = WarcRecord(
                wtype,
                headers.getOrElse("warc-target-uri", ""),
                parseDate(headers.getOrElse("warc-date", "")),
                headers.getOrElse("content-type", ""),
                if (wtype == "response") httpBody(payload, onError) else payload)
            }
            // consume the record separator; position at the next version
            // line. A bad separator means the Content-Length was corrupt
            // but did NOT overrun the stream — for recoverable sizes,
            // rewind to the payload start so the records swallowed inside
            // the bogus payload are resynced, not lost
            atRecord = {
              var l = readLine(in)
              while (l.isDefined && l.get.isEmpty) l = readLine(in)
              l match {
                case None                             => false
                case Some(v) if v.startsWith("WARC/") => true
                case Some(_) =>
                  onError()
                  // the blank-line skip may have read past the mark's
                  // readlimit, invalidating it — a stale mark degrades to
                  // forward resync instead of a second onError for the
                  // same record via the outer catch
                  if (recoverable) {
                    try in.reset()
                    catch { case _: java.io.IOException => () }
                  }
                  resync()
              }
            }
          } catch {
            case e: graft.util.StepBudget.Exceeded => throw e
            case _: Exception =>
              onError()
              atRecord = resync()
          }
        }
      }

      override def hasNext: Boolean = { advance(); pending != null }
      override def next(): WarcRecord = {
        advance()
        if (pending == null) throw new NoSuchElementException("warc iterator drained")
        val r = pending
        pending = null
        r
      }
    }

  /** Eager whole-buffer parse with the error count — the test/small-file
    * convenience over [[recordIterator]].
    */
  def parseStream(raw: InputStream): ParseResult = {
    var errors = 0
    val records = recordIterator(raw, () => errors += 1).toVector
    ParseResult(records, errors)
  }

  /** A parsed record as a pipeline row: response bodies become the binary
    * payload (the extractor sniffs HTML vs PDF), conversion records the
    * text layer; `lang` is the crawl-level default (Common Crawl does not
    * carry per-record language; the extraction config's language list is
    * the gate).
    */
  def toRow(r: WarcRecord, defaultLang: String): RawPage =
    if (r.warcType == "conversion")
      RawPage(r.targetUri, r.date, null,
        new String(r.payload, StandardCharsets.UTF_8), defaultLang)
    else RawPage(r.targetUri, r.date, r.payload, "", defaultLang)

  /** Read a directory/glob of `.warc`/`.warc.gz` archives into the
    * standard page table shape `(url, warc_ts, html, text, lang)`.
    */
  def toTable(
      spark: SparkSession,
      path: String,
      defaultLang: String = "en",
      minPartitions: Int = 0): DataFrame = {
    import spark.implicits._
    val parts = if (minPartitions > 0) minPartitions else spark.sparkContext.defaultParallelism
    val errAcc = spark.sparkContext.longAccumulator("warc_parse_errors")
    spark.sparkContext
      .binaryFiles(path, parts)
      .flatMap { case (file, pds) =>
        // stream-decode: the iterator pulls records lazily from the open
        // stream. Spark does NOT auto-close streams from a
        // PortableDataStream — a task-completion listener covers every
        // exit (early termination via limit/take, task failure), with
        // drain-close as the fast path.
        val in = pds.open()
        var closed = false
        def closeOnce(): Unit = if (!closed) { closed = true; in.close() }
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => closeOnce()))
        var fileErrors = 0L
        val it = recordIterator(in, () => { fileErrors += 1; errAcc.add(1L) })
        new Iterator[RawPage] {
          override def hasNext: Boolean = {
            val h = it.hasNext
            if (!h) {
              closeOnce()
              // attribute contained corruption to its archive: the driver
              // sees the total in the `warc_parse_errors` accumulator,
              // executor logs carry the per-file line
              if (fileErrors > 0)
                System.err.println(
                  s"[warc] $file: $fileErrors malformed record(s) contained")
            }
            h
          }
          override def next(): RawPage = toRow(it.next(), defaultLang)
        }
      }
      .toDF()
  }
}
