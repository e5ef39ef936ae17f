package graft.extract

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

import graft.corpus.RealPdf
import graft.corpus.RealPdf.{PageSpec, TextRun}

class PdfContainerSpec extends AnyFunSuite {

  private def line(y: Int, text: String, x: Int = 72) = TextRun(x, y, text)

  /** Minimal classic-xref document assembler: `bodies(i)` writes the BODY
    * of object i+1 (no `N 0 obj`/`endobj` wrapper); object 1 must be the
    * catalog. Shared by the hand-built tests below (review finding: the
    * header/xref/trailer assembly was copy-pasted per test).
    */
  private def classicDoc(bodies: Seq[java.io.ByteArrayOutputStream => Unit]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def ascii(t: String): Unit = out.write(t.getBytes(StandardCharsets.ISO_8859_1))
    val offsets = scala.collection.mutable.ArrayBuffer.empty[Int]
    ascii("%PDF-1.4\n")
    bodies.zipWithIndex.foreach { case (b, i) =>
      offsets += out.size()
      ascii(s"${i + 1} 0 obj\n")
      b(out)
      ascii("\nendobj\n")
    }
    val xrefAt = out.size()
    ascii(s"xref\n0 ${bodies.length + 1}\n0000000000 65535 f \n")
    offsets.foreach(o => ascii(f"$o%010d 00000 n \n"))
    ascii(s"trailer\n<< /Size ${bodies.length + 1} /Root 1 0 R >>\nstartxref\n$xrefAt\n%%EOF\n")
    out.toByteArray
  }

  private def asciiBody(s: String): java.io.ByteArrayOutputStream => Unit =
    out => out.write(s.getBytes(StandardCharsets.ISO_8859_1))

  /** One-page doc whose content stream is `ops` with a correct /Length. */
  private def onePageDoc(ops: String, pageRes: String = "<< >>"): Array[Byte] =
    classicDoc(Seq(
      asciiBody("<< /Type /Catalog /Pages 2 0 R >>"),
      asciiBody("<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
      asciiBody("<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        s"/Contents 4 0 R /Resources $pageRes >>"),
      out => {
        val b = ops.getBytes(StandardCharsets.ISO_8859_1)
        out.write(s"<< /Length ${b.length} >>\nstream\n".getBytes(StandardCharsets.ISO_8859_1))
        out.write(b)
        out.write("\nendstream".getBytes(StandardCharsets.ISO_8859_1))
      }))

  test("real-container round trip: literal strings, escapes, reading order") {
    val pdf = RealPdf.document(Seq(PageSpec(runs = Seq(
      line(100, "First line with (parens) and back\\slash."),
      line(112, "Second line."),
      line(160, "New paragraph after a gap.")))))
    assert(new String(pdf.take(8), StandardCharsets.US_ASCII).startsWith("%PDF-1."))
    val ex = PdfExtractor.extract(pdf)
    assert(ex.isRight, ex)
    val text = ex.toOption.get.text
    assert(text ==
      "First line with (parens) and back\\slash.\nSecond line.\n\nNew paragraph after a gap.")
  }

  test("hex strings, Flate compression, indirect /Length, split /Contents") {
    val runs = Seq(
      line(100, "Compressed hex content line one."),
      line(112, "Line two of the stream."),
      line(124, "Line three keeps going."),
      line(136, "Line four ends it."))
    for (
      compress <- Seq(false, true);
      split <- Seq(false, true);
      indirect <- Seq(false, true);
      hex <- Seq(false, true)
    ) {
      val pdf = RealPdf.document(Seq(PageSpec(
        runs = runs,
        compress = compress,
        splitContents = split,
        indirectLength = indirect,
        hexStrings = hex)))
      val ex = PdfExtractor.extract(pdf)
      assert(ex.isRight, s"compress=$compress split=$split indirect=$indirect hex=$hex: $ex")
      assert(ex.toOption.get.text ==
        "Compressed hex content line one.\nLine two of the stream.\nLine three keeps going.\nLine four ends it.",
        s"compress=$compress split=$split indirect=$indirect hex=$hex")
    }
  }

  test("transport filters round trip: ASCIIHex, ASCII85, RunLength, chained with Flate") {
    val runs = Seq(
      line(100, "Transport-filtered content line one."),
      line(112, "Repeated....... bytes exercise run lengths."),
      line(124, "Binary-ish éü chars survive base-85."))
    val expected = "Transport-filtered content line one.\n" +
      "Repeated....... bytes exercise run lengths.\n" +
      "Binary-ish éü chars survive base-85."
    for (
      transport <- Seq("ASCIIHexDecode", "ASCII85Decode", "RunLengthDecode", "LZWDecode");
      compress <- Seq(false, true)
    ) {
      val pdf = RealPdf.document(Seq(PageSpec(
        runs = runs, compress = compress, transport = Some(transport))))
      val ex = PdfExtractor.extract(pdf)
      assert(ex.isRight, s"transport=$transport compress=$compress: $ex")
      assert(ex.toOption.get.text == expected, s"transport=$transport compress=$compress")
    }
  }

  test("transport filter decoders: spec edge cases and loud failures") {
    def dec(name: String, s: String): Array[Byte] =
      PdfContainer.decodeTransportForTest(name, s.getBytes(StandardCharsets.ISO_8859_1))
    def fails(name: String, bytes: Array[Byte]): Boolean =
      try { PdfContainer.decodeTransportForTest(name, bytes); false }
      catch { case _: PdfContainer.PdfError => true }
    // odd final hex digit implies a low zero nibble; whitespace ignored;
    // EOF without the '>' EOD accepted
    assert(new String(dec("ASCIIHexDecode", "48 65 6c 6C 6f 2"), "ISO-8859-1") == "Hello ")
    assert(new String(dec("ASCIIHexDecode", "48656c6c6f>"), "ISO-8859-1") == "Hello")
    // 'z' shorthand for an all-zero group; '~>' EOD respected
    assert(java.util.Arrays.equals(dec("ASCII85Decode", "z~>"), Array[Byte](0, 0, 0, 0)))
    // known vector with a partial final group (2 chars -> 1 byte)
    assert(new String(dec("ASCII85Decode", "BOu!rDZ~>"), "ISO-8859-1") == "hello")
    // run-length: L=2 -> 3 literal bytes; L=253 -> repeat 'x' 4 times; EOD
    val rle = Array[Byte](2, 'a', 'b', 'c', 253.toByte, 'x', 128.toByte)
    assert(new String(PdfContainer.decodeTransportForTest("RunLengthDecode", rle),
      "ISO-8859-1") == "abcxxxx")
    // loud: bad hex byte, orphan base-85 digit, 5-digit group above 2^32-1,
    // truncated run, unsupported filter name
    assert(fails("ASCIIHexDecode", "4G>".getBytes("US-ASCII")))
    assert(fails("ASCII85Decode", "a~>".getBytes("US-ASCII")))
    assert(fails("ASCII85Decode", "uuuuu~>".getBytes("US-ASCII")))
    assert(fails("RunLengthDecode", Array[Byte](5, 'a')))
    assert(fails("DCTDecode", Array[Byte](1, 2, 3)))
  }

  test("LZWDecode: ISO 32000-1 7.4.4 published example vector and width growth") {
    // the spec's Example 2: bytes 80 0B 60 50 22 0C 0C 85 01 decode to
    // 45 45 45 45 45 65 45 45 45 66 (codes 256 45 258 258 65 259 66 257)
    val enc = Array(0x80, 0x0b, 0x60, 0x50, 0x22, 0x0c, 0x0c, 0x85, 0x01)
      .map(_.toByte)
    val dec = PdfContainer.decodeTransportForTest("LZWDecode", enc)
    assert(java.util.Arrays.equals(
      dec, Array(45, 45, 45, 45, 45, 65, 45, 45, 45, 66).map(_.toByte)))
    // a LARGE varied content stream crosses the 9->10->11-bit widths (and
    // the writer's pre-full Clear on the biggest): encoder/decoder width
    // schedules must stay in lockstep or the text scrambles
    for (lines <- Seq(120, 600, 2500)) {
      val runs = (0 until lines).map(i =>
        line(40 + (i % 50) * 12, s"Width growth line $i with varied content ${i * 37}."))
      val pdf = RealPdf.document(Seq(PageSpec(
        runs = runs, transport = Some("LZWDecode"), height = 40 + 50 * 12 + 100)))
      val ex = PdfContainer.parsePages(pdf)
      assert(ex.isRight, s"lines=$lines: $ex")
      val text = ex.toOption.get.map(_.runs.map(_.text).mkString("\n")).mkString("\n")
      assert(text.contains(s"Width growth line ${lines - 1} with varied content ${(lines - 1) * 37}."),
        s"lines=$lines last line")
      assert(text.contains("Width growth line 0 with varied content 0."), s"lines=$lines first line")
    }
    // truncated LZW data is accepted as a truncated capture (prefix kept)
    val cut = PdfContainer.decodeTransportForTest("LZWDecode", enc.take(4))
    assert(cut.length > 0 && cut.length < 10)
    // a bad first code after Clear is loud
    def loud(bytes: Array[Byte]): Boolean =
      try { PdfContainer.decodeTransportForTest("LZWDecode", bytes); false }
      catch { case _: PdfContainer.PdfError => true }
    // 9-bit codes: 256 (Clear) then 300 (not yet in table) -> invalid
    // 100000000 100101100 -> bytes 10000000 01001011 00xxxxxx
    assert(loud(Array(0x80, 0x4b, 0x00).map(_.toByte)))
  }

  test("positional /DecodeParms pairing, predictor placement, loud EarlyChange") {
    // classic minimal doc whose content stream carries explicit Filter +
    // DecodeParms entries and pre-encoded body bytes
    def filteredDoc(filter: String, parms: String, body: Array[Byte]): Array[Byte] = {
      val parmsEntry = if (parms.isEmpty) "" else s" /DecodeParms $parms"
      classicDoc(Seq(
        asciiBody("<< /Type /Catalog /Pages 2 0 R >>"),
        asciiBody("<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
        asciiBody("<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
          "/Contents 4 0 R /Resources << >> >>"),
        out => {
          out.write((s"<< /Length ${body.length} /Filter $filter$parmsEntry >>" +
            "\nstream\n").getBytes(StandardCharsets.ISO_8859_1))
          out.write(body)
          out.write("\nendstream".getBytes(StandardCharsets.ISO_8859_1))
        }))
    }
    def hexEnc(b: Array[Byte]): Array[Byte] =
      (b.map(x => f"$x%02x").mkString + ">").getBytes(StandardCharsets.ISO_8859_1)
    def deflate(b: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater(); d.setInput(b); d.finish()
      val o = new java.io.ByteArrayOutputStream(); val c = new Array[Byte](4096)
      while (!d.finished()) o.write(c, 0, d.deflate(c))
      d.end(); o.toByteArray
    }
    val ops = "BT /F1 10 Tf 1 0 0 1 72 700 Tm (paired) Tj ET"
      .getBytes(StandardCharsets.ISO_8859_1)
    // the reviewer scenario shape: a parms dict for the SECOND filter in
    // the chain — predictor must apply to THAT filter's output, not be
    // fished out as "the first dict". PNG row-filter 0 = identity, so the
    // predictor-encoded form is rows of [0, C bytes] (pad with spaces).
    val cols = 16
    val rows = (ops.length + cols - 1) / cols
    val padded = ops.padTo(rows * cols, ' '.toByte)
    val pngForm = (0 until rows).flatMap(r =>
      0.toByte +: padded.slice(r * cols, (r + 1) * cols).toSeq).toArray
    val doc = filteredDoc(
      "[/ASCIIHexDecode /FlateDecode]",
      s"[null << /Predictor 12 /Columns $cols >>]",
      hexEnc(deflate(pngForm)))
    val ex = PdfContainer.parsePages(doc)
    assert(ex.isRight, ex)
    assert(ex.toOption.get.head.runs.map(_.text).mkString == "paired")
    // a predictor declared on a TRANSPORT filter's slot is malformed+loud
    val bad = filteredDoc(
      "[/ASCIIHexDecode /FlateDecode]",
      s"[<< /Predictor 12 /Columns $cols >> null]",
      hexEnc(deflate(pngForm)))
    val rBad = PdfContainer.parsePages(bad)
    assert(rBad.isLeft && rBad.left.toOption.get.contains("predictor_on_"), rBad)
    // an invalid /EarlyChange value is loud, not silently coerced
    val lzwBody = Array(0x80, 0x0b, 0x60, 0x50, 0x22, 0x0c, 0x0c, 0x85, 0x01)
      .map(_.toByte)
    val badEc = filteredDoc("/LZWDecode", "<< /EarlyChange 2 >>", lzwBody)
    val rEc = PdfContainer.parsePages(badEc)
    assert(rEc.isLeft && rEc.left.toOption.get.contains("bad_early_change"), rEc)
  }

  test("scan mode still refuses an encrypted xref-stream PDF (no classic trailer)") {
    // modern container, /Encrypt planted in the xref-STREAM dict, and the
    // startxref pointer corrupted so the chain walk fails and body-scan
    // recovery takes over — the refusal must hold on that path too
    val pdf = RealPdf.document(
      Seq(PageSpec(runs = Seq(line(100, "secret")))),
      xrefStream = true)
    val s = new String(pdf, StandardCharsets.ISO_8859_1)
    val doctored = s
      .replace("/Type /XRef", "/Type /XRef /Encrypt 99 0 R")
      .replaceAll("startxref\n\\d+", "startxref\n999999999")
    assert(doctored != s)
    val r = PdfContainer.parsePages(doctored.getBytes(StandardCharsets.ISO_8859_1))
    assert(r.isLeft, r)
    assert(r.left.toOption.get.contains("encrypted_document"), r)
  }

  test("form XObjects: page content inside /Form with own resources round trips") {
    val runs = Seq(
      line(100, "Content that lives in a form XObject."),
      line(112, "Second line inside the form."),
      line(160, "New paragraph, still in the form."))
    val expected = "Content that lives in a form XObject.\nSecond line inside the form." +
      "\n\nNew paragraph, still in the form."
    // the Word/Quartz page shape: a q /Fx1 Do Q wrapper stream, text and
    // fonts inside the form's OWN resources; classic and packed-modern
    for (modern <- Seq(false, true)) {
      val pdf = RealPdf.document(
        Seq(PageSpec(runs = runs, formXObject = true)),
        xrefStream = modern, objStmPack = modern)
      val ex = PdfExtractor.extract(pdf)
      assert(ex.isRight, s"modern=$modern: $ex")
      assert(ex.toOption.get.text == expected, s"modern=$modern")
    }
    // a translated /Matrix shifts geometry without changing the text or
    // the relative line structure
    val shifted = RealPdf.document(Seq(PageSpec(
      runs = runs, formXObject = true, formMatrix = Some((0.0, -24.0)))))
    val exS = PdfExtractor.extract(shifted)
    assert(exS.isRight, exS)
    assert(exS.toOption.get.text == expected)
    // a CID font inside a form's resources composes with the CMap path
    val cidForm = RealPdf.document(Seq(PageSpec(
      runs = Seq(line(100, "Form Σλ ünïcode text.")),
      formXObject = true, cidFont = true)))
    val exC = PdfExtractor.extract(cidForm)
    assert(exC.isRight, exC)
    assert(exC.toOption.get.text == "Form Σλ ünïcode text.")
  }

  test("MacRomanEncoding decodes the Mac-era high half via the JVM's own table") {
    // byte 0x8A is 'ä' in MacRoman (vs a C1 control in Latin-1)
    val macText = "caf\u008a style" // 0x8A raw byte via hex strings
    val pdf = RealPdf.document(
      Seq(PageSpec(runs = Seq(line(100, macText)), hexStrings = true)),
      simpleFontEncoding = Some("/MacRomanEncoding"))
    val ex = PdfExtractor.extract(pdf)
    assert(ex.isRight, ex)
    assert(ex.toOption.get.text == "cafä style")
  }

  test("inline images (BI..ID..EI) are skipped, never tokenized as text") {
    // binary payload deliberately contains '(fake) Tj' lookalike bytes and
    // unbalanced delimiters that would wreck the lexer if tokenized
    def doc(ops: String, rawLen: Int): Array[Byte] = onePageDoc(ops)
    val pixels = "ÿ(fake) Tj <dead> [junk  þ"
    val ops = s"BI /W 4 /H 4 /BPC 8 /CS /G ID $pixels EI\n" +
      "BT /F1 10 Tf 1 0 0 1 72 700 Tm (real text) Tj ET"
    val ex = PdfContainer.parsePages(doc(ops, ops.length))
    assert(ex.isRight, ex)
    assert(ex.toOption.get.head.runs.map(_.text).mkString == "real text")
    // unterminated inline image is loud, not an infinite scan
    val bad = "BI /W 4 /H 4 ID ÿþ no terminator here"
    val exBad = PdfContainer.parsePages(doc(bad, bad.length))
    assert(exBad.isLeft, exBad)
    assert(exBad.left.toOption.get.contains("inline_image_unterminated"), exBad)
  }

  test("cm/q/Q: CTM-positioned text and forms; rotation loud only when text shows") {
    // a cm-positioned form invocation (the common real-generator shape):
    // geometry shifts, text unchanged
    val runs = Seq(
      line(100, "Placed via cm before Do."),
      line(112, "Second placed line."))
    val placed = RealPdf.document(Seq(PageSpec(
      runs = runs, formXObject = true, formCm = Some((0.0, -36.0)))))
    val exP = PdfExtractor.extract(placed)
    assert(exP.isRight, exP)
    assert(exP.toOption.get.text == "Placed via cm before Do.\nSecond placed line.")
    // hand-built: cm inside q..Q must not leak; a scaling cm normalizes
    // away through the dominant-font-size model; a rotated cm used only
    // for graphics is harmless, but showing text under it is loud
    def doc(ops: String): Array[Byte] = onePageDoc(ops)
    // scale-2 cm: positions double, dominant size doubles, normalization
    // divides it back out — same text, same relative layout
    val scaled = doc("q\n2 0 0 2 10 10 cm\nBT /F1 10 Tf " +
      "1 0 0 1 72 700 Tm (scaled) Tj 1 0 0 1 72 688 Tm (next) Tj ET\nQ")
    val exScaled = PdfContainer.parsePages(scaled)
    assert(exScaled.isRight, exScaled)
    assert(exScaled.toOption.get.head.runs.map(_.text) == Vector("scaled", "next"))
    // Q restores: text after the bracket lands at unscaled coordinates
    val bracket = doc("q\n2 0 0 2 0 0 cm\nQ\nBT /F1 10 Tf " +
      "1 0 0 1 72 700 Tm (plain) Tj ET")
    val exB = PdfContainer.parsePages(bracket)
    assert(exB.isRight && exB.toOption.get.head.runs.head.text == "plain")
    // rotated cm for graphics only: harmless
    val gfxRot = doc("q\n0 1 -1 0 0 0 cm\n0 0 100 100 re S\nQ\n" +
      "BT /F1 10 Tf 1 0 0 1 72 700 Tm (after gfx) Tj ET")
    val exG = PdfContainer.parsePages(gfxRot)
    assert(exG.isRight && exG.toOption.get.head.runs.head.text == "after gfx")
    // rotated cm with text shown under it: loud
    val textRot = doc("q\n0 1 -1 0 0 0 cm\nBT /F1 10 Tf " +
      "1 0 0 1 72 700 Tm (rotated) Tj ET\nQ")
    val exR = PdfContainer.parsePages(textRot)
    assert(exR.isLeft, exR)
    assert(exR.left.toOption.get.contains("rotated_text_unsupported"), exR)
    // the ubiquitous Quartz y-FLIP is SUPPORTED: positions map through
    // the negative d, font size uses |d| (no zero/negative sizes), and
    // line ORDER comes out right — flipped-space y=100 is ABOVE y=112
    val flip = doc("q\n1 0 0 -1 0 792 cm\nBT /F1 10 Tf " +
      "1 0 0 1 72 100 Tm (first flipped) Tj " +
      "1 0 0 1 72 112 Tm (second flipped) Tj ET\nQ")
    val exF = PdfContainer.parsePages(flip)
    assert(exF.isRight, exF)
    val fruns = exF.toOption.get.head.runs
    assert(fruns.map(_.text) == Vector("first flipped", "second flipped"))
    assert(fruns(0).y < fruns(1).y, s"flip must preserve top-down order: $fruns")
    // a 180-degree "rotation" (both diagonals negative) and an x-mirror
    // would reverse reading order: loud, not silently scrambled
    val rot180 = doc("q\n-1 0 0 -1 612 792 cm\nBT /F1 10 Tf " +
      "1 0 0 1 72 700 Tm (upside down) Tj ET\nQ")
    assert(PdfContainer.parsePages(rot180).isLeft)
    val mirror = doc("q\n-1 0 0 1 612 0 cm\nBT /F1 10 Tf " +
      "1 0 0 1 72 700 Tm (mirrored) Tj ET\nQ")
    assert(PdfContainer.parsePages(mirror).isLeft)
    // a flipped FORM /Matrix follows the same rule
    val flippedForm = RealPdf.document(Seq(PageSpec(
      runs = Seq(line(100, "inside flipped form")), formXObject = true,
      formMatrix = None)))
    val sFF = new String(flippedForm, StandardCharsets.ISO_8859_1)
      .replace("/Subtype /Form /BBox", "/Subtype /Form /Matrix [1 0 0 -1 0 0] /BBox")
    val exFF = PdfContainer.parsePages(sFF.getBytes(StandardCharsets.ISO_8859_1))
    assert(exFF.isRight, exFF)
    assert(exFF.toOption.get.head.runs.map(_.text).mkString == "inside flipped form")
    assert(exFF.toOption.get.head.runs.head.text.nonEmpty)
  }

  test("form XObjects: self-invocation is a loud cycle; images and unknowns add no text") {
    // hand-built doc whose form's OWN resources point back at itself
    def cyclicDoc(): Array[Byte] = {
      val wrapper = "q /Fx Do Q"
      classicDoc(Seq(
        asciiBody("<< /Type /Catalog /Pages 2 0 R >>"),
        asciiBody("<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
        asciiBody("<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
          "/Contents 4 0 R /Resources << /XObject << /Fx 5 0 R >> >> >>"),
        asciiBody(s"<< /Length ${wrapper.length} >>\nstream\n$wrapper\nendstream"),
        asciiBody(s"<< /Type /XObject /Subtype /Form /BBox [0 0 612 792] " +
          s"/Resources << /XObject << /Fx 5 0 R >> >> /Length ${wrapper.length} >>" +
          s"\nstream\n$wrapper\nendstream")))
    }
    val r = PdfContainer.parsePages(cyclicDoc())
    assert(r.isLeft, r)
    assert(r.left.toOption.get.contains("form_xobject_cycle"), r)
    // an undeclared Do name contributes nothing and does not fail
    // (hand-built so the stream /Length stays correct)
    def undeclaredDoDoc(): Array[Byte] =
      onePageDoc("BT /F1 10 Tf 1 0 0 1 72 700 Tm (with image) Tj ET\n/ImUndeclared Do")
    val ex = PdfContainer.parsePages(undeclaredDoDoc())
    assert(ex.isRight, ex)
    assert(ex.toOption.get.head.runs.map(_.text).mkString == "with image")
  }

  test("Tc/Tw/Tz text-state parameters feed the advance model") {
    // Tz 200 doubles the advance: the second Tj must start at 2x the
    // natural width of the first; Tc adds per-glyph; Tw per space byte
    val content =
      "BT /F1 10 Tf 1 0 0 1 72 692 Tm 200 Tz [(abc)(def)] TJ ET\n" +
        "BT /F1 10 Tf 100 Tz 3 Tc 1 0 0 1 72 680 Tm [(ab)(cd)] TJ ET\n" +
        "BT /F1 10 Tf 0 Tc 12 Tw 1 0 0 1 72 668 Tm [(a b)(cd)] TJ ET"
    val pdf = onePageDoc(content)
    val pages = PdfContainer.parsePages(pdf).toOption.get
    val runs = pages.head.runs.sortBy(r => (r.y, r.x))
    assert(runs.map(_.text) == Vector("abc", "def", "ab", "cd", "a b", "cd"))
    def gap(i: Int, j: Int) = runs(j).x - runs(i).x
    // row 1: Tz 200 -> advance 2 * 3 chars * 6px = 36
    assert(gap(0, 1) == 36, s"Tz: ${gap(0, 1)}")
    // row 2: Tc 3 -> (2 glyphs * (6 + 3)) = 18
    assert(gap(2, 3) == 18, s"Tc: ${gap(2, 3)}")
    // row 3: Tw 12 on one space byte -> 3*6 + 12 = 30
    assert(gap(4, 5) == 30, s"Tw: ${gap(4, 5)}")
    // a non-positive Tz is loud, never a degenerate zero advance
    val bad = onePageDoc("BT /F1 10 Tf 0 Tz 1 0 0 1 72 700 Tm (x) Tj ET")
    assert(PdfContainer.parsePages(bad).isLeft)
  }

  test("simple-font /Encoding: WinAnsi block and /Differences glyph remaps") {
    // WinAnsi: bytes 0x93/0x94 are curly quotes, 0x96 en-dash (Latin-1
    // would decode them as C1 controls — silently wrong text)
    val winText = "He said \u0093hi\u0094 \u0096 twice."
    val pdfWin = RealPdf.document(
      Seq(PageSpec(runs = Seq(line(100, winText)), hexStrings = true)),
      simpleFontEncoding = Some("/WinAnsiEncoding"))
    val exWin = PdfExtractor.extract(pdfWin)
    assert(exWin.isRight, exWin)
    assert(exWin.toOption.get.text == "He said “hi” – twice.")
    // Differences: remap 'A'(65) -> adieresis + following code 66 ->
    // emdash, and 0xC0 -> uni0394 (Δ); unmapped codes keep the base table
    val diffText = "xAB y À z"
    val pdfDiff = RealPdf.document(
      Seq(PageSpec(runs = Seq(line(100, diffText)), hexStrings = true)),
      simpleFontEncoding =
        Some("<< /Differences [ 65 /adieresis /emdash 192 /uni0394 ] >>"))
    val exDiff = PdfExtractor.extract(pdfDiff)
    assert(exDiff.isRight, exDiff)
    assert(exDiff.toOption.get.text == "xä— y Δ z")
    // AGL uXXXX[XX] form incl. a supplementary-plane codepoint
    val pdfU = RealPdf.document(
      Seq(PageSpec(runs = Seq(line(100, "AB")), hexStrings = true)),
      simpleFontEncoding = Some("<< /Differences [ 65 /u0394 /u1D11E ] >>"))
    assert(PdfExtractor.extract(pdfU).toOption.get.text == "Δ𝄞")
    // an unknown glyph name degrades to U+FFFD (quality gate's job), and
    // a malformed Differences structure is loud
    val pdfUnk = RealPdf.document(
      Seq(PageSpec(runs = Seq(line(100, "A")), hexStrings = true)),
      simpleFontEncoding = Some("<< /Differences [ 65 /notaglyphname ] >>"))
    assert(PdfExtractor.extract(pdfUnk).toOption.get.text == "�")
    val pdfBad = RealPdf.document(
      Seq(PageSpec(runs = Seq(line(100, "A")), hexStrings = true)),
      simpleFontEncoding = Some("<< /Differences [ /emdash ] >>"))
    val r = PdfContainer.parsePages(pdfBad)
    assert(r.isLeft && r.left.toOption.get.contains("bad_differences"), r)
  }

  test("an encrypted document is refused loudly, never silent garbage") {
    val pdf = RealPdf.document(Seq(PageSpec(runs = Seq(line(100, "secret")))))
    val s = new String(pdf, StandardCharsets.ISO_8859_1)
    // plant an /Encrypt entry in the classic trailer dict
    val doctored = s.replace("trailer\n<< ", "trailer\n<< /Encrypt 99 0 R ")
    assert(doctored != s, "trailer not found to doctor")
    val r = PdfContainer.parsePages(doctored.getBytes(StandardCharsets.ISO_8859_1))
    assert(r.isLeft, r)
    assert(r.left.toOption.get.contains("encrypted_document"), r)
  }

  test("an unsupported filter in a real container is a contained loud failure") {
    // take a valid uncompressed doc and claim /Filter /DCTDecode on its
    // content stream: parsing must fail loudly (Left), never crash
    val pdf = RealPdf.document(Seq(PageSpec(runs = Seq(line(100, "x")))))
    val s = new String(pdf, StandardCharsets.ISO_8859_1)
    val at = s.indexOf("/Length")
    assert(at > 0)
    val doctored = (s.substring(0, at) + "/Filter /DCTDecode " + s.substring(at))
      .getBytes(StandardCharsets.ISO_8859_1)
    val r = PdfContainer.parsePages(doctored)
    assert(r.isLeft, r)
    assert(r.left.toOption.get.contains("unsupported_filter"), r)
  }

  test("Type0/CID font with ToUnicode CMap round trips, incl. non-Latin text") {
    val runs = Seq(
      line(100, "A CID-keyed first line."),
      line(112, "Grüße from ünicode — Σωκράτης."),
      line(160, "New paragraph via composite font."))
    val expected = "A CID-keyed first line.\nGrüße from ünicode — Σωκράτης." +
      "\n\nNew paragraph via composite font."
    // classic container and the modern 1.5 packed form both carry the fonts
    for (modern <- Seq(false, true)) {
      val pdf = RealPdf.document(
        Seq(PageSpec(runs = runs, cidFont = true, compress = modern)),
        xrefStream = modern, objStmPack = modern)
      val ex = PdfExtractor.extract(pdf)
      assert(ex.isRight, s"modern=$modern: $ex")
      assert(ex.toOption.get.text == expected, s"modern=$modern")
    }
  }

  test("mixed simple and CID pages in one document extract in order") {
    val pdf = RealPdf.document(Seq(
      PageSpec(runs = Seq(line(100, "Simple-font page one."))),
      PageSpec(runs = Seq(line(100, "Composite-font page two.")), cidFont = true)))
    val ex = PdfExtractor.extract(pdf)
    assert(ex.isRight, ex)
    assert(ex.toOption.get.text == "Simple-font page one.\n\nComposite-font page two.")
  }

  test("CID font WITHOUT ToUnicode is a contained loud failure") {
    val pdf = RealPdf.document(Seq(PageSpec(
      runs = Seq(line(100, "opaque glyphs")), cidFont = true, cidToUnicode = false)))
    val r = PdfContainer.parsePages(pdf)
    assert(r.isLeft, r)
    assert(r.left.toOption.get.contains("cid_font_without_tounicode"), r)
  }

  test("a predefined-CMap Type0 encoding is out of subset and loud") {
    // (UCS2 horizontal families became supported in round 6 — a CID-table
    // CMap like GBK-EUC-H is the representative still-unsupported shape)
    val pdf = RealPdf.document(Seq(PageSpec(
      runs = Seq(line(100, "x")), cidFont = true)))
    val s = new String(pdf, StandardCharsets.ISO_8859_1)
      .replace("/Identity-H", "/GBK-EUC-H")
    val r = PdfContainer.parsePages(s.getBytes(StandardCharsets.ISO_8859_1))
    assert(r.isLeft, r)
    assert(r.left.toOption.get.contains("unsupported_cid_encoding"), r)
  }

  test("ToUnicode CMap parser: ligature expansion, range-array form, loud overflows") {
    def cmap(body: String): Array[Byte] =
      ("/CIDInit /ProcSet findresource begin\nbegincmap\n" +
        "1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n" +
        body + "\nendcmap\nend").getBytes(StandardCharsets.ISO_8859_1)
    // bfchar with a MULTI-CHAR destination (ffi ligature expansion)
    val lig = PdfContainer.parseToUnicode(cmap(
      "1 beginbfchar\n<0001> <006600660069>\nendbfchar"))
    assert(lig.codeLen == 2 && lig.map(1) == "ffi")
    // bfrange with an explicit destination ARRAY
    val arr = PdfContainer.parseToUnicode(cmap(
      "1 beginbfrange\n<0010> <0012> [<0041> <0062> <00660069>]\nendbfrange"))
    assert(arr.map(0x10) == "A" && arr.map(0x11) == "b" && arr.map(0x12) == "fi")
    // bfrange last-byte increment
    val inc = PdfContainer.parseToUnicode(cmap(
      "1 beginbfrange\n<0020> <0022> <0061>\nendbfrange"))
    assert(inc.map(0x20) == "a" && inc.map(0x21) == "b" && inc.map(0x22) == "c")
    def loud(body: String): Boolean =
      try { PdfContainer.parseToUnicode(cmap(body)); false }
      catch { case _: PdfContainer.PdfError => true }
    // increment crossing the destination's final byte
    assert(loud("1 beginbfrange\n<0000> <0100> <00FF>\nendbfrange"))
    // destination array of the wrong length
    assert(loud("1 beginbfrange\n<0010> <0012> [<0041>]\nendbfrange"))
    // mixed code widths
    assert(loud("2 beginbfchar\n<0001> <0041>\n<02> <0042>\nendbfchar"))
  }

  test("two-column page segments and reads left column before right") {
    val runs = Seq(
      TextRun(72, 100, "Left top."),
      TextRun(72, 112, "Left bottom."),
      TextRun(350, 100, "Right top."),
      TextRun(350, 112, "Right bottom."))
    val pdf = RealPdf.document(Seq(PageSpec(runs = runs)))
    val ex = PdfExtractor.extract(pdf).toOption.get
    assert(ex.columns.map(_._1) == Vector("pdf-p0-col0", "pdf-p0-col1"))
    assert(ex.columns(0)._2 == "Left top.\nLeft bottom.")
    assert(ex.columns(1)._2 == "Right top.\nRight bottom.")
  }

  test("multi-page nested /Kids tree with inherited /MediaBox") {
    val pdf = RealPdf.document(
      Seq(
        PageSpec(runs = Seq(line(100, "Page one."))),
        PageSpec(runs = Seq(line(100, "Page two.")), compress = true)),
      nestedKids = true)
    val pages = PdfExtractor.parse(pdf).toOption.get
    assert(pages.length == 2)
    assert(pages.forall(p => p.width == 612 && p.height == 792)) // inherited
    val ex = PdfExtractor.extract(pdf).toOption.get
    assert(ex.columns.map(_._1) == Vector("pdf-p0-col0", "pdf-p1-col0"))
    assert(ex.text == "Page one.\n\nPage two.")
  }

  test("TJ kerning adjustments within a line keep word geometry joinable") {
    // hand-write a content stream using TJ with kern adjustments: the two
    // halves of "Hyphen" abut exactly (advance-aware heavy join rejoins
    // them), while the -500 kern opens a half-em visible gap -> space
    val content =
      "BT /F1 10 Tf 1 0 0 1 72 692 Tm [(Hyp)(hen)] TJ ET\n" +
        "BT /F1 10 Tf 1 0 0 1 72 680 Tm [(word) -500 (gap)] TJ ET"
    val pdf = handBuilt(content)
    val pages = PdfExtractor.parse(pdf).toOption.get
    assert(pages.length == 1)
    val runs = pages.head.runs.sortBy(r => (r.y, r.x))
    assert(runs.map(_.text) == Vector("Hyp", "hen", "word", "gap"))
    // abutting halves: second starts exactly at first's advance end
    assert(runs(1).x == runs(0).x + 3 * 6)
    // heavy sweep: same-line abutting runs join without a space; kerned gap
    // becomes a space
    val heavy = PdfExtractor.heavyExtract(pdf).toOption.get.text
    assert(heavy == "Hyphen\nword gap")
  }

  test("Td/TD/T*/' operators advance lines like Tm positioning") {
    val content =
      "BT /F1 10 Tf 14 TL 1 0 0 1 72 700 Tm (Line A) Tj T* (Line B) Tj ET\n" +
        "BT /F1 10 Tf 14 TL 1 0 0 1 72 660 Tm (Line C) Tj (and D) ' ET"
    val pdf = handBuilt(content)
    val text = PdfExtractor.extract(pdf).toOption.get.text
    assert(text == "Line A\nLine B\n\nLine C\nand D") // 26pt gap > 1.5x median advance = paragraph break
  }

  test("lenient fallback: truncated xref recovers objects by body scan") {
    val pdf = RealPdf.document(Seq(PageSpec(runs = Seq(line(100, "Survivor text.")))))
    val s = new String(pdf, StandardCharsets.ISO_8859_1)
    val cut = s.lastIndexOf("xref")
    // corrupt the startxref offset instead of removing the tail entirely
    val broken = (s.substring(0, cut) + "xref\n0 1\ngarbage\n" +
      s.substring(s.lastIndexOf("trailer"))).getBytes(StandardCharsets.ISO_8859_1)
    val ex = PdfExtractor.extract(broken)
    assert(ex.isRight, ex)
    assert(ex.toOption.get.text == "Survivor text.")
  }

  test("malformed containers fail loudly and contained, never crash") {
    val garbage = "%PDF-1.4\nnot a real pdf at all".getBytes(StandardCharsets.US_ASCII)
    assert(PdfExtractor.parse(garbage).isLeft)
    val truncated = RealPdf.document(Seq(PageSpec(runs = Seq(line(100, "x"))))).take(60)
    assert(PdfExtractor.parse(truncated).isLeft)
    val unsupportedFilter = handBuilt("(x) Tj").map(identity) // valid...
    val s = new String(unsupportedFilter, StandardCharsets.ISO_8859_1)
      .replace("<< /Length", "<< /Filter /DCTDecode /Length")
    val r = PdfExtractor.parse(s.getBytes(StandardCharsets.ISO_8859_1))
    assert(r.isLeft)
    assert(r.swap.toOption.get.contains("unsupported_filter"))
  }

  test("the full extraction engine consumes a real-container payload") {
    val pdf = RealPdf.document(Seq(PageSpec(runs = (0 until 30).map(i =>
      line(100 + 12 * i, s"Paragraph sentence number $i with plain words.")))))
    val row = graft.model.RawPage(
      url = "https://real.example/doc.pdf",
      warc_ts = new java.sql.Timestamp(graft.corpus.CorpusGen.Epoch),
      html = pdf,
      text = null,
      lang = "en")
    val doc = Extractor.fastExtract(row, Extractor.Config())
    assert(doc.success, s"error=${doc.error} engine=${doc.engine} text=${doc.extracted_text.take(80)}")
    assert(doc.extracted_text.contains("Paragraph sentence number 0"))
    assert(doc.spans.exists(_.kind.startsWith("pdf-p0-col")))
  }

  test("font size folded into Tm normalizes to the pipeline advance model") {
    // '/F1 1 Tf' with '24 0 0 24 x y Tm': effective size 24; the two
    // abutting halves advance at 24*0.6 units/char in PDF space and must
    // still rejoin without a space after page normalization
    val content =
      "BT /F1 1 Tf 1 0 0 1 0 0 Tm 24 0 0 24 72 600 Tm [(Hyp)(hen)] TJ ET"
    val pdf = handBuilt(content)
    val heavy = PdfExtractor.heavyExtract(pdf).toOption.get.text
    assert(heavy == "Hyphen")
  }

  test("non-10pt Tf font sizes normalize to the pipeline advance model") {
    val content =
      "BT /F1 18 Tf 1 0 0 1 72 600 Tm [(Sp)(lit)] TJ ET\n" +
        "BT /F1 18 Tf 1 0 0 1 72 580 Tm [(word) -500 (gap)] TJ ET"
    val pdf = handBuilt(content)
    val heavy = PdfExtractor.heavyExtract(pdf).toOption.get.text
    assert(heavy == "Split\nword gap")
  }

  test("rotated text fails loudly instead of emitting scrambled geometry") {
    val content = "BT /F1 10 Tf 0 1 -1 0 72 600 Tm (rotated) Tj ET"
    val r = PdfExtractor.parse(handBuilt(content))
    assert(r.isLeft)
    assert(r.swap.toOption.get.contains("rotated_text_unsupported"))
  }

  test("nonzero /MediaBox origin shifts into page-local coordinates") {
    // cropped page: box [0 400 612 792] -> height 392; text at PDF y 700
    // is 92 below the top edge -> downward y 92, not negative
    val content = "BT /F1 10 Tf 1 0 0 1 72 700 Tm (Cropped.) Tj ET"
    val pdf = handBuiltWithBox(content, "[0 400 612 792]")
    val pages = PdfExtractor.parse(pdf).toOption.get
    assert(pages.head.height == 392)
    val run = pages.head.runs.head
    assert(run.y == 92, run)
    assert(run.x == 72, run)
    assert(PdfExtractor.extract(pdf).toOption.get.text == "Cropped.")
  }

  test("zlib FDICT stream is contained, not an infinite loop") {
    // zlib header with the preset-dictionary bit set: 0x78 0xBB + 4-byte
    // dict id; Inflater returns 0 with needsDictionary()==true forever
    val body = Array[Byte](0x78.toByte, 0xBB.toByte, 1, 2, 3, 4, 0, 0, 0, 0)
    val out = new java.io.ByteArrayOutputStream()
    def ascii(s: String): Unit = out.write(s.getBytes(StandardCharsets.ISO_8859_1))
    val offs = scala.collection.mutable.ArrayBuffer.empty[Int]
    ascii("%PDF-1.4\n")
    def obj(b: => Unit): Unit = { offs += out.size(); b; ascii("\nendobj\n") }
    obj(ascii("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>"))
    obj(ascii("2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 /MediaBox [0 0 612 792] >>"))
    obj(ascii("3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"))
    obj {
      ascii(s"4 0 obj\n<< /Length ${body.length} /Filter /FlateDecode >>\nstream\n")
      out.write(body)
      ascii("\nendstream")
    }
    val xref = out.size()
    ascii("xref\n0 5\n0000000000 65535 f \n")
    offs.foreach(o => ascii(f"$o%010d 00000 n \n"))
    ascii(s"trailer\n<< /Size 5 /Root 1 0 R >>\nstartxref\n$xref\n%%EOF\n")
    val r = PdfExtractor.parse(out.toByteArray)
    assert(r.isLeft)
    assert(
      r.swap.toOption.get.contains("flate_needs_dictionary") ||
        r.swap.toOption.get.contains("flate_corrupt"),
      r)
  }

  test("PDF 1.5 xref streams, object streams and PNG predictor round trip") {
    val runs = Seq(
      line(100, "Modern container line one ends properly."),
      line(112, "Second line of the modern file."),
      line(124, "Third line to be safe here."))
    for (
      objStm <- Seq(false, true);
      predictor <- Seq(false, true);
      compress <- Seq(false, true)
    ) {
      val pdf = RealPdf.document(
        Seq(PageSpec(runs = runs, compress = compress)),
        xrefStream = true,
        objStmPack = objStm,
        xrefPredictor = predictor)
      assert(new String(pdf.take(9), StandardCharsets.US_ASCII) == "%PDF-1.5\n")
      // no classic table anywhere: the chain MUST go through the stream
      assert(!new String(pdf, StandardCharsets.ISO_8859_1).contains("trailer"))
      val ex = PdfExtractor.extract(pdf)
      assert(ex.isRight, s"objStm=$objStm predictor=$predictor compress=$compress: $ex")
      assert(ex.toOption.get.text ==
        "Modern container line one ends properly.\nSecond line of the modern file.\nThird line to be safe here.",
        s"objStm=$objStm predictor=$predictor compress=$compress")
    }
  }

  test("hybrid-reference file: classic trailer /XRefStm supplies the packed entries") {
    // Acrobat-compat hybrid: a classic table (which cannot express the
    // packed objects) plus a trailer /XRefStm pointing at the real xref
    // stream; the stream's entries must take precedence
    val pdf = RealPdf.document(
      Seq(PageSpec(runs = Seq(line(100, "Hybrid referenced text line.")))),
      xrefStream = true,
      objStmPack = true)
    val s = new String(pdf, StandardCharsets.ISO_8859_1)
    val sxAt = s.lastIndexOf("startxref")
    val streamOff = s.substring(sxAt + "startxref".length).trim.takeWhile(_.isDigit)
    val base = s.substring(0, sxAt)
    val classicOff = base.length
    val hybrid = (base +
      s"xref\n0 1\n0000000000 65535 f \n" +
      s"trailer\n<< /Size 99 /Root 1 0 R /XRefStm $streamOff >>\n" +
      s"startxref\n$classicOff\n%%EOF\n").getBytes(StandardCharsets.ISO_8859_1)
    val ex = PdfExtractor.extract(hybrid)
    assert(ex.isRight, ex)
    assert(ex.toOption.get.text == "Hybrid referenced text line.")
  }

  test("incremental update wins over a stale ObjStm copy of the same object") {
    // base file packs the page dict (object 4) in an ObjStm; the appended
    // update rewrites object 4 at a top-level offset (new /Contents 8) and
    // chains back via /Prev. Resolving the page tree unpacks the old
    // ObjStm — its stale copy of object 4 must NOT shadow the newer
    // at-offset version (newest update wins)
    val base0 = RealPdf.document(
      Seq(PageSpec(runs = Seq(line(100, "Old text before the update.")))),
      xrefStream = true,
      objStmPack = true)
    val s0 = new String(base0, StandardCharsets.ISO_8859_1)
    val sxAt = s0.lastIndexOf("startxref")
    val prevOff = s0.substring(sxAt + "startxref".length).trim.takeWhile(_.isDigit)
    val out = new java.io.ByteArrayOutputStream()
    out.write(base0)
    def ascii(t: String): Unit = out.write(t.getBytes(StandardCharsets.ISO_8859_1))
    val newPageOff = out.size()
    ascii("4 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
      "/Contents 8 0 R /Resources << /Font << /F1 3 0 R >> >> >>\nendobj\n")
    val newContent = "BT /F1 10 Tf 1 0 0 1 72 692 Tm (New text after the update.) Tj ET"
    val newContentOff = out.size()
    ascii(s"8 0 obj\n<< /Length ${newContent.length} >>\nstream\n$newContent\nendstream\nendobj\n")
    // update xref stream (object 9): sections [4 1] and [8 2], W=[1 4 2]
    val rows = new java.io.ByteArrayOutputStream()
    def row(t: Int, f2: Int, f3: Int): Unit = {
      rows.write(t)
      rows.write((f2 >>> 24) & 0xff); rows.write((f2 >>> 16) & 0xff)
      rows.write((f2 >>> 8) & 0xff); rows.write(f2 & 0xff)
      rows.write((f3 >>> 8) & 0xff); rows.write(f3 & 0xff)
    }
    val updateXrefOff = out.size()
    row(1, newPageOff, 0) // object 4 -> new offset
    row(1, newContentOff, 0) // object 8
    row(1, updateXrefOff, 0) // object 9 (this stream)
    val d = new java.util.zip.Deflater()
    d.setInput(rows.toByteArray); d.finish()
    val zbuf = new Array[Byte](1024)
    val zOut = new java.io.ByteArrayOutputStream()
    while (!d.finished()) zOut.write(zbuf, 0, d.deflate(zbuf))
    d.end()
    val z = zOut.toByteArray
    ascii(s"9 0 obj\n<< /Type /XRef /Size 10 /W [1 4 2] /Index [4 1 8 2] " +
      s"/Root 1 0 R /Prev $prevOff /Length ${z.length} /Filter /FlateDecode >>\nstream\n")
    out.write(z)
    ascii(s"\nendstream\nendobj\nstartxref\n$updateXrefOff\n%%EOF\n")
    val ex = PdfExtractor.extract(out.toByteArray)
    assert(ex.isRight, ex)
    assert(ex.toOption.get.text == "New text after the update.", ex.toOption.get.text)
  }

  test("xref-stream multi-page doc with nested kids and packed dicts") {
    val pdf = RealPdf.document(
      Seq(
        PageSpec(runs = Seq(line(100, "Packed page one."))),
        PageSpec(runs = Seq(line(100, "Packed page two.")), compress = true)),
      nestedKids = true,
      xrefStream = true,
      objStmPack = true,
      xrefPredictor = true)
    val ex = PdfExtractor.extract(pdf).toOption.get
    assert(ex.columns.map(_._1) == Vector("pdf-p0-col0", "pdf-p1-col0"))
    assert(ex.text == "Packed page one.\n\nPacked page two.")
  }

  test("jittered baselines in a real container: heavy sweep recovers lines") {
    // word runs of one visual line with ±1pt baseline jitter (within
    // YTolerance after 10pt normalization) and x at the exact fixed-pitch
    // advance: the fast exact-y sweep fragments them, the heavy y-tolerance
    // clustering + advance-aware joining must reconstruct the line
    val words = Seq("these", "words", "share", "one", "visual", "baseline")
    val ops = new StringBuilder("BT /F1 10 Tf\n")
    var x = 72.0
    words.zipWithIndex.foreach { case (w, i) =>
      val y = 600.0 + (if (i % 2 == 1) 1.0 else 0.0) // alternate ±1pt jitter
      ops.append(s"1 0 0 1 ${x.toInt} ${y.toInt} Tm ($w) Tj\n")
      x += (w.length + 1) * 6.0 // advance incl. the joining space
    }
    ops.append("ET")
    val pdf = handBuilt(ops.toString)
    val heavy = PdfExtractor.heavyExtract(pdf).toOption.get.text
    assert(heavy == words.mkString(" "))
  }

  test("container independence: same runs via %PDF-GRAFT and ISO 32000 extract byte-identically") {
    // the spliced mixed-engine doc (one clean + 8 jittered pages): parse
    // its synthetic payload to runs, re-serialize THE SAME runs as a real
    // ISO 32000 container, and run both through the full extractor — text,
    // engine (mixed) and spans must be byte-identical, proving the layout
    // pipeline is genuinely container-independent on the hardest path
    // (per-page selective heavy reprocessing)
    val synth = graft.corpus.CorpusGen.splicedRow(42L, 0)
    val pages = PdfExtractor.parse(synth.html).toOption.get
    val real = RealPdf.document(pages.map(p =>
      PageSpec(
        width = p.width,
        height = p.height,
        runs = p.runs.map(r => TextRun(r.x, r.y, r.text)),
        compress = true)))
    val cfg = Extractor.Config()
    val dSynth = Extractor.extractWithFallback(
      synth.copy(html = synth.html), cfg)
    val dReal = Extractor.extractWithFallback(synth.copy(html = real), cfg)
    assert(dReal.success, String.valueOf(dReal.error))
    assert(dReal.extracted_text == dSynth.extracted_text)
    assert(dReal.engine == dSynth.engine)
    assert(dSynth.engine == graft.model.Engines.Mixed)
    assert(dReal.spans == dSynth.spans)
  }

  test("\" show operator sets Tw/Tc persistently before showing") {
    // ISO 32000-1 Table 107: aw ac string " — word/char spacing become
    // TEXT STATE, in force for this show and every later one
    val content =
      "BT /F1 10 Tf 12 TL 1 0 0 1 72 692 Tm 12 3 (a b) \" ET\n" +
        "BT /F1 10 Tf 1 0 0 1 72 668 Tm [(a b)(cd)] TJ ET"
    val pages = PdfContainer.parsePages(onePageDoc(content)).toOption.get
    val runs = pages.head.runs.sortBy(r => (r.y, r.x))
    assert(runs.map(_.text) == Vector("a b", "a b", "cd"))
    // persistence: the SECOND line's advance carries Tc 3 and Tw 12 set by
    // the " operator — 3 glyphs * (6 + 3) + 1 space * 12 = 39
    assert(runs(2).x - runs(1).x == 39, runs)
  }

  test("LZW: a full table without Clear keeps decoding existing codes") {
    // some real encoders legally emit 12-bit codes from the frozen table
    // instead of clearing; craft such a stream with a no-Clear encoder
    val rnd = new scala.util.Random(7)
    val data = Array.fill(12000)(rnd.nextInt(256).toByte)
    val out = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L; var bitCnt = 0; var width = 9
    def put(code: Int): Unit = {
      bitBuf = (bitBuf << width) | code.toLong; bitCnt += width
      while (bitCnt >= 8) { out.write(((bitBuf >> (bitCnt - 8)) & 0xff).toInt); bitCnt -= 8 }
    }
    val dict = new java.util.HashMap[String, Integer]()
    var nextCode = 258
    put(256) // single initial Clear; NEVER again
    val cur = new StringBuilder
    def codeOf(s: CharSequence): Int =
      if (s.length == 1) s.charAt(0).toInt else dict.get(s.toString).intValue()
    data.foreach { byte =>
      val k = (byte & 0xff).toChar
      if (cur.isEmpty) cur.append(k)
      else {
        cur.append(k)
        if (!dict.containsKey(cur.toString)) {
          val candidate = cur.toString
          cur.setLength(cur.length - 1)
          put(codeOf(cur))
          if (nextCode < 4096) { // table full: STOP adding, keep emitting
            dict.put(candidate, nextCode)
            nextCode += 1
            if (nextCode >= (1 << width) && width < 12) width += 1
          }
          cur.setLength(0); cur.append(k)
        }
      }
    }
    if (cur.nonEmpty) put(codeOf(cur))
    put(257) // EOD
    if (bitCnt > 0) out.write(((bitBuf << (8 - bitCnt)) & 0xff).toInt)
    val enc = out.toByteArray
    val dec = PdfContainer.decodeTransportForTest("LZWDecode", enc)
    assert(java.util.Arrays.equals(dec, data))
  }

  test("empty-user-password encrypted PDFs decrypt transparently") {
    val runs = Seq(
      line(100, "Owner-locked but readable content."),
      line(112, "Second line survives decryption."),
      line(160, "Third paragraph, new block."))
    val plainText = PdfExtractor.extract(
      RealPdf.document(Seq(PageSpec(runs = runs)))).toOption.get.text
    // RC4-40 (R2), RC4-128 (R3), AES-128 (R4/AESV2): classic container
    for (enc <- Seq(
        RealPdf.Encryption.rc4_40("owner-secret"),
        RealPdf.Encryption.rc4_128("owner-secret"),
        RealPdf.Encryption.aes128("owner-secret"))) {
      val pdf = RealPdf.document(Seq(PageSpec(runs = runs)), encrypt = Some(enc))
      val ex = PdfExtractor.extract(pdf)
      assert(ex.isRight, s"$enc -> $ex")
      assert(ex.toOption.get.text == plainText, enc)
    }
    // compressed content + indirect length through RC4
    val pdfZ = RealPdf.document(
      Seq(PageSpec(runs = runs, compress = true, indirectLength = true)),
      encrypt = Some(RealPdf.Encryption.rc4_128("owner-secret")))
    assert(PdfExtractor.extract(pdfZ).toOption.get.text == plainText)
    // modern container: xref STREAM + ObjStm packing + AES-128 — the xref
    // stream must stay unencrypted while the ObjStm decrypts as a stream
    val pdfModern = RealPdf.document(
      Seq(PageSpec(runs = runs, compress = true)),
      xrefStream = true,
      objStmPack = true,
      encrypt = Some(RealPdf.Encryption.aes128("owner-secret")))
    assert(PdfExtractor.extract(pdfModern).toOption.get.text == plainText)
    // V4 with /CFM /V2 (RC4 named through a crypt filter) and the
    // /EncryptMetadata false key-derivation branch (R4 appends ffffffff)
    val pdfV4Rc4 = RealPdf.document(
      Seq(PageSpec(runs = runs)),
      encrypt = Some(RealPdf.Encryption("owner-secret", v = 4, r = 4, aes = false)))
    assert(PdfExtractor.extract(pdfV4Rc4).toOption.get.text == plainText)
    val pdfNoMeta = RealPdf.document(
      Seq(PageSpec(runs = runs)),
      encrypt = Some(
        RealPdf.Encryption("owner-secret", v = 4, r = 4, aes = true, encryptMetadata = false)))
    assert(PdfExtractor.extract(pdfNoMeta).toOption.get.text == plainText)
    // corrupted ciphertext stays a CONTAINED loud failure, never a crash:
    // flip the first ciphertext byte of the Flate+AES content stream — the
    // decrypted block becomes garbage and inflate fails on its magic
    val encPdf = RealPdf.document(
      Seq(PageSpec(runs = runs, compress = true)),
      encrypt = Some(RealPdf.Encryption.aes128("owner-secret")))
    val corrupted = encPdf.clone()
    val streamAt = {
      val s = new String(corrupted, StandardCharsets.ISO_8859_1)
      s.indexOf("stream\n", s.indexOf("/Contents")) // first content stream
    }
    val flipAt = streamAt + "stream\n".length + 16 // skip the AES IV
    corrupted(flipAt) = (corrupted(flipAt) ^ 0x5a).toByte
    val rCorrupt = PdfContainer.parsePages(corrupted)
    assert(rCorrupt.isLeft, "corrupted ciphertext must fail loudly")
    // sloppy-writer shape: an UNencrypted zero-length string reachable in
    // an AES document must pass through, not refuse the whole file
    // (an encrypted empty string would be 32 bytes of ciphertext)
    val pdfEmptyStr = RealPdf.document(
      Seq(PageSpec(runs = runs)),
      encrypt = Some(RealPdf.Encryption.aes128("owner-secret")),
      emptyCatalogString = true)
    assert(PdfExtractor.extract(pdfEmptyStr).toOption.get.text == plainText)
    // CID font with an encrypted /ToUnicode CMap stream
    val cidRuns = Seq(line(100, "Unicode päge • done"))
    val cidPlain = PdfExtractor.extract(
      RealPdf.document(Seq(PageSpec(runs = cidRuns, cidFont = true)))).toOption.get.text
    val pdfCid = RealPdf.document(
      Seq(PageSpec(runs = cidRuns, cidFont = true)),
      encrypt = Some(RealPdf.Encryption.aes128("owner-secret")))
    assert(PdfExtractor.extract(pdfCid).toOption.get.text == cidPlain)
  }

  test("AES-256 (V5 R5/R6) empty-user-password PDFs decrypt transparently") {
    val runs = Seq(
      line(100, "Modern AES-256 owner-locked content."),
      line(112, "Second line survives the V5 handler."))
    val plainText = PdfExtractor.extract(
      RealPdf.document(Seq(PageSpec(runs = runs)))).toOption.get.text
    // R6 (the hardened 2.B hash — today's writer default) and R5 (the
    // deprecated Acrobat-9 single-SHA-256 revision), classic container
    for (enc <- Seq(
        RealPdf.Encryption.aes256("owner-secret"),
        RealPdf.Encryption.aes256r5("owner-secret"))) {
      val pdf = RealPdf.document(Seq(PageSpec(runs = runs)), encrypt = Some(enc))
      val ex = PdfExtractor.extract(pdf)
      assert(ex.isRight, s"$enc -> $ex")
      assert(ex.toOption.get.text == plainText, enc)
    }
    // modern container: xref STREAM + ObjStm under AES-256 — the xref
    // stream stays plaintext, the ObjStm decrypts with the FILE key
    val pdfModern = RealPdf.document(
      Seq(PageSpec(runs = runs, compress = true)),
      xrefStream = true,
      objStmPack = true,
      encrypt = Some(RealPdf.Encryption.aes256("owner-secret")))
    assert(PdfExtractor.extract(pdfModern).toOption.get.text == plainText)
    // /EncryptMetadata false under V5 (no key-derivation effect for
    // AES-256 — the flag only gates metadata-stream decryption)
    val pdfNoMeta = RealPdf.document(
      Seq(PageSpec(runs = runs)),
      encrypt = Some(
        RealPdf.Encryption("owner-secret", v = 5, r = 6, lengthBits = 256,
          aes = true, encryptMetadata = false)))
    assert(PdfExtractor.extract(pdfNoMeta).toOption.get.text == plainText)
    // CID font whose /ToUnicode CMap stream is AES-256 encrypted
    val cidRuns = Seq(line(100, "Unicode päge • via V5"))
    val cidPlain = PdfExtractor.extract(
      RealPdf.document(Seq(PageSpec(runs = cidRuns, cidFont = true)))).toOption.get.text
    val pdfCid = RealPdf.document(
      Seq(PageSpec(runs = cidRuns, cidFont = true)),
      encrypt = Some(RealPdf.Encryption.aes256("owner-secret")))
    assert(PdfExtractor.extract(pdfCid).toOption.get.text == cidPlain)
  }

  test("V5 refusals: real user password, corrupt /UE, bad revision") {
    val runs = Seq(line(100, "locked"))
    // a REAL (non-empty) user password fails the /U hash — locked
    for (enc <- Seq(
        RealPdf.Encryption.aes256("owner", "realpw"),
        RealPdf.Encryption.aes256r5("owner", "realpw"))) {
      val r = PdfContainer.parsePages(
        RealPdf.document(Seq(PageSpec(runs = runs)), encrypt = Some(enc)))
      assert(r.isLeft, enc)
      assert(r.left.toOption.get.contains("encrypted_document"), s"$enc -> $r")
    }
    // corrupt /UE: the /U hash still verifies (salts untouched) so the
    // unwrap yields a WRONG file key — the /Perms "adb" sentinel is the
    // only thing standing between that and silent garbage
    val good = RealPdf.document(
      Seq(PageSpec(runs = runs)),
      encrypt = Some(RealPdf.Encryption.aes256("owner-secret")))
    val s = new String(good, StandardCharsets.ISO_8859_1)
    val ueAt = s.indexOf("/UE <")
    assert(ueAt > 0)
    val corrupted = good.clone()
    val hexAt = ueAt + "/UE <".length
    corrupted(hexAt) = (if (corrupted(hexAt) == '0') '1' else '0').toByte
    val rC = PdfContainer.parsePages(corrupted)
    assert(rC.isLeft, rC)
    assert(rC.left.toOption.get.contains("encrypted_bad_perms"), rC)
    // /V 5 with a legacy /R is a confused writer: loud, named
    val doctoredR = s.replace("/V 5 /R 6", "/V 5 /R 4")
    assert(doctoredR != s)
    val rR = PdfContainer.parsePages(doctoredR.getBytes(StandardCharsets.ISO_8859_1))
    assert(rR.isLeft, rR)
    assert(rR.left.toOption.get.contains("encrypted_unsupported_revision"), rR)
    // a WRONG-LENGTH /Perms is a broken writer, not a wrong key (the /U
    // hash already authenticated): skipped like the absent case — the
    // document must still extract (length-preserving doctor: drop the
    // last hex pair, pad with spaces after the delimiter)
    val pAt = s.indexOf("/Perms <")
    assert(pAt > 0)
    val hexStart = pAt + "/Perms <".length
    val shortPerms = s.substring(0, hexStart + 30) + ">  " + s.substring(hexStart + 33)
    assert(shortPerms.length == s.length)
    val rShort = PdfContainer.parsePages(shortPerms.getBytes(StandardCharsets.ISO_8859_1))
    assert(rShort.isRight, rShort)
  }

  test("a ToUnicode stream shared across code widths fails on every use") {
    // one CMap stream referenced by BOTH the 1-byte simple font and the
    // 2-byte Identity-H font: the width guard must fire on the cache HIT
    // too, not only on the first parse — here F1 parses the 1-byte CMap
    // first, then F2 reuses it and must refuse (cid_code_width_1)
    val pdf = RealPdf.document(
      Seq(PageSpec(runs = Seq(line(100, "shared cmap")), cidFont = true)),
      simpleFontToUnicode = Some(Seq('x'.toInt -> "y")))
    val s = new String(pdf, StandardCharsets.ISO_8859_1)
    val simpleToUni =
      """/Courier /ToUnicode (\d+) 0 R""".r.findFirstMatchIn(s).get.group(1)
    val m = """/DescendantFonts \[\d+ 0 R\] /ToUnicode (\d+) 0 R""".r
      .findFirstMatchIn(s).get
    assert(m.group(1).length == simpleToUni.length, "object numbers must be same width")
    val doctored = s.substring(0, m.start(1)) + simpleToUni + s.substring(m.end(1))
    val r = PdfContainer.parsePages(doctored.getBytes(StandardCharsets.ISO_8859_1))
    assert(r.isLeft, r)
    assert(r.left.toOption.get.contains("cid_code_width_1"), r)
  }

  test("a REAL user password (and unsupported /V) stays a loud refusal") {
    val runs = Seq(line(100, "locked"))
    for (enc <- Seq(
        RealPdf.Encryption.rc4_40("owner", "realpw"),
        RealPdf.Encryption.rc4_128("owner", "realpw"),
        RealPdf.Encryption.aes128("owner", "realpw"))) {
      val r = PdfContainer.parsePages(RealPdf.document(Seq(PageSpec(runs = runs)), encrypt = Some(enc)))
      assert(r.isLeft, enc)
      assert(r.left.toOption.get.contains("encrypted_document"), s"$enc -> $r")
    }
    // an exotic /V value is out of subset: loud, named
    val pdf = RealPdf.document(
      Seq(PageSpec(runs = runs)),
      encrypt = Some(RealPdf.Encryption.rc4_128("owner")))
    val s = new String(pdf, StandardCharsets.ISO_8859_1)
    val doctored = s.replace("/Filter /Standard /V 2 /R 3", "/Filter /Standard /V 7 /R 7")
    assert(doctored != s)
    val r7 = PdfContainer.parsePages(doctored.getBytes(StandardCharsets.ISO_8859_1))
    assert(r7.isLeft, r7)
    assert(r7.left.toOption.get.contains("encrypted_unsupported"), r7)
  }

  test("embedded /Encoding CMap streams: subset-font shapes decode via ToUnicode") {
    // Embedded-2: a private 2-byte CMap stream fixes the codespace; the
    // ToUnicode CMap (keyed by the same codes) carries the text
    val text = "Embedded 编码 subset façade"
    val pdf2 = RealPdf.document(Seq(PageSpec(
      runs = Seq(line(100, text)),
      cidFont = true,
      cidEncoding = "Embedded-2")))
    val ex2 = PdfExtractor.extract(pdf2)
    assert(ex2.isRight, ex2)
    assert(ex2.toOption.get.text == text)
    // Embedded-1: PRIVATE sequential 1-byte codes — nothing but the
    // ToUnicode CMap can recover the text (the true subset-font shape)
    val pdf1 = RealPdf.document(Seq(PageSpec(
      runs = Seq(line(100, text)),
      cidFont = true,
      cidEncoding = "Embedded-1")))
    val ex1 = PdfExtractor.extract(pdf1)
    assert(ex1.isRight, ex1)
    assert(ex1.toOption.get.text == text)
    // the private codes really are private: the raw bytes of the 1-byte
    // show string must NOT contain the text (guards against the writer
    // accidentally emitting Latin-1)
    assert(!new String(pdf1, StandardCharsets.ISO_8859_1).contains("Embedded "))
    // an embedded encoding WITHOUT ToUnicode is opaque glyph soup: loud
    val pdfNoUni = RealPdf.document(Seq(PageSpec(
      runs = Seq(line(100, text)),
      cidFont = true,
      cidToUnicode = false,
      cidEncoding = "Embedded-2")))
    val rNoUni = PdfContainer.parsePages(pdfNoUni)
    assert(rNoUni.isLeft, rNoUni)
    assert(rNoUni.left.toOption.get.contains("cid_font_without_tounicode"), rNoUni)
    // the embedded-CMap + AES-256 combination: the /Encoding stream is
    // itself encrypted and must decrypt before the codespace scan
    val pdfEnc = RealPdf.document(
      Seq(PageSpec(runs = Seq(line(100, text)), cidFont = true, cidEncoding = "Embedded-1")),
      encrypt = Some(RealPdf.Encryption.aes256("owner-secret")))
    assert(PdfExtractor.extract(pdfEnc).toOption.get.text == text)
  }

  test("encodingCMapWidth: uniform widths pass, mixed/absent codespaces are loud") {
    def cmap(body: String): Array[Byte] =
      s"""/CIDInit /ProcSet findresource begin
         |begincmap
         |$body
         |endcmap end""".stripMargin.getBytes(StandardCharsets.ISO_8859_1)
    assert(PdfContainer.encodingCMapWidth(cmap(
      "1 begincodespacerange\n<00> <FF>\nendcodespacerange")) == 1)
    assert(PdfContainer.encodingCMapWidth(cmap(
      "2 begincodespacerange\n<0000> <80FF>\n<A000> <FFFF>\nendcodespacerange\n" +
        "1 begincidrange\n<0000> <FFFF> 0\nendcidrange")) == 2)
    def loud(body: String, reason: String): Unit = {
      val e = intercept[PdfContainer.PdfError](PdfContainer.encodingCMapWidth(cmap(body)))
      assert(e.reason.contains(reason), e.reason)
    }
    loud("1 begincodespacerange\n<00> <FFFF>\nendcodespacerange", "cmap_mixed_code_width")
    loud("1 begincidrange\n<0000> <FFFF> 0\nendcidrange", "cmap_no_codespace")
    loud("1 begincodespacerange\n<000000> <FFFFFF>\nendcodespacerange", "cmap_code_width_3")
  }

  test("a simple font's ToUnicode CMap takes precedence over its encoding table") {
    // subsetted-TrueType shape: the 1-byte codes carry a private meaning
    // only the ToUnicode CMap knows — here 'X' really means Ж and '~'
    // means ≈, with a ligature expansion for 'f'; unmapped codes fall
    // back to the table
    val pdf = RealPdf.document(
      Seq(PageSpec(runs = Seq(line(100, "fiX ~ plain")))),
      simpleFontToUnicode = Some(Seq(
        'X'.toInt -> "Ж",
        '~'.toInt -> "≈",
        'f'.toInt -> "fi")))
    val ex = PdfExtractor.extract(pdf)
    assert(ex.isRight, ex)
    assert(ex.toOption.get.text == "fiiЖ ≈ plain")
    // combined with /WinAnsiEncoding: table handles the 0x80-0x9F block,
    // ToUnicode still wins where it maps
    val pdfWin = RealPdf.document(
      Seq(PageSpec(runs = Seq(line(100, "Xquoted")), hexStrings = true)),
      simpleFontEncoding = Some("/WinAnsiEncoding"),
      simpleFontToUnicode = Some(Seq('X'.toInt -> "Ж")))
    val exWin = PdfExtractor.extract(pdfWin)
    assert(exWin.isRight, exWin)
    assert(exWin.toOption.get.text == "Ж“quoted”")
    // the width guard's input: parseToUnicode reports the codespace
    // width, and fontsOfRes refuses a 2-byte CMap on a 1-byte font
    // (simple_font_code_width_2) just as it refuses width mismatches on
    // composite fonts — here pin the width detection both ways
    val one = PdfContainer.parseToUnicode(
      ("begincmap\n1 begincodespacerange\n<00> <FF>\nendcodespacerange\n" +
        "1 beginbfchar\n<78> <0416>\nendbfchar\nendcmap")
        .getBytes(StandardCharsets.ISO_8859_1))
    assert(one.codeLen == 1 && one.map(0x78) == "Ж")
    val two = PdfContainer.parseToUnicode(
      ("begincmap\n1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n" +
        "1 beginbfchar\n<0078> <0416>\nendbfchar\nendcmap")
        .getBytes(StandardCharsets.ISO_8859_1))
    assert(two.codeLen == 2)
  }

  test("predefined UCS2 CMaps decode CID text without a ToUnicode map") {
    // UniGB-UCS2-H: 2-byte codes ARE UCS-2 code points — extraction needs
    // no CID tables; ToUnicode-absent is the interesting CJK crawl shape
    val text = "中文期刊 mixed ascii 混合"
    val pdf = RealPdf.document(Seq(PageSpec(
      runs = Seq(line(100, text)),
      cidFont = true,
      cidToUnicode = false,
      cidEncoding = "UniGB-UCS2-H")))
    val ex = PdfExtractor.extract(pdf)
    assert(ex.isRight, ex)
    assert(ex.toOption.get.text == text)
    // with a ToUnicode CMap present the CMap wins (same output here)
    val pdfToUni = RealPdf.document(Seq(PageSpec(
      runs = Seq(line(100, text)),
      cidFont = true,
      cidEncoding = "UniJIS-UCS2-H")))
    assert(PdfExtractor.extract(pdfToUni).toOption.get.text == text)
    // UTF16 families: code units pass through, surrogate PAIRS reassemble
    // supplementary-plane characters (CJK extension B here)
    val utf16Text = "新字体 𠀀𪛖 mixed"
    val pdfUtf16 = RealPdf.document(Seq(PageSpec(
      runs = Seq(line(100, utf16Text)),
      cidFont = true,
      cidToUnicode = false,
      cidEncoding = "UniGB-UTF16-H")))
    assert(PdfExtractor.extract(pdfUtf16).toOption.get.text == utf16Text)
    // vertical variants and CID-table predefined CMaps stay loud
    for (bad <- Seq("UniGB-UCS2-V", "UniJIS-UTF16-V", "GBK-EUC-H")) {
      val r = PdfContainer.parsePages(RealPdf.document(Seq(PageSpec(
        runs = Seq(line(100, "x")),
        cidFont = true,
        cidToUnicode = false,
        cidEncoding = bad))))
      assert(r.isLeft && r.left.toOption.get.contains("unsupported_cid_encoding"), s"$bad -> $r")
    }
    // Identity-H without ToUnicode is still opaque glyph ids: loud
    val rId = PdfContainer.parsePages(RealPdf.document(Seq(PageSpec(
      runs = Seq(line(100, "x")), cidFont = true, cidToUnicode = false))))
    assert(rId.isLeft && rId.left.toOption.get.contains("cid_font_without_tounicode"), rId)
  }

  private def handBuiltWithBox(content: String, mediaBox: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def ascii(s: String): Unit = out.write(s.getBytes(StandardCharsets.ISO_8859_1))
    val offs = scala.collection.mutable.ArrayBuffer.empty[Int]
    ascii("%PDF-1.4\n")
    def obj(body: String): Unit = { offs += out.size(); ascii(body); ascii("\nendobj\n") }
    obj("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>")
    obj(s"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 /MediaBox $mediaBox >>")
    obj("3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>")
    obj(s"4 0 obj\n<< /Length ${content.length} >>\nstream\n$content\nendstream")
    val xref = out.size()
    ascii(s"xref\n0 5\n0000000000 65535 f \n")
    offs.foreach(o => ascii(f"$o%010d 00000 n \n"))
    ascii(s"trailer\n<< /Size 5 /Root 1 0 R >>\nstartxref\n$xref\n%%EOF\n")
    out.toByteArray
  }

  /** Minimal single-page doc around a hand-written content stream. */
  private def handBuilt(content: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def ascii(s: String): Unit = out.write(s.getBytes(StandardCharsets.ISO_8859_1))
    val offs = scala.collection.mutable.ArrayBuffer.empty[Int]
    ascii("%PDF-1.4\n")
    def obj(body: String): Unit = { offs += out.size(); ascii(body); ascii("\nendobj\n") }
    obj("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>")
    obj("2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 /MediaBox [0 0 612 792] >>")
    obj("3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>")
    obj(s"4 0 obj\n<< /Length ${content.length} >>\nstream\n$content\nendstream")
    val xref = out.size()
    ascii(s"xref\n0 5\n0000000000 65535 f \n")
    offs.foreach(o => ascii(f"$o%010d 00000 n \n"))
    ascii(s"trailer\n<< /Size 5 /Root 1 0 R >>\nstartxref\n$xref\n%%EOF\n")
    out.toByteArray
  }
}
