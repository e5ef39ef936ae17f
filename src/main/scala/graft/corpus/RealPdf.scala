package graft.corpus

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

/** Spec-conformant real-PDF writer (ISO 32000 subset) for exercising
  * [[graft.extract.PdfContainer]] with genuine container bytes: a proper
  * object graph, classic xref table with byte-exact offsets, trailer,
  * Flate-compressed or plain content streams, direct or indirect /Length,
  * literal (with escapes) and hex strings, single or array /Contents, and a
  * nested /Pages tree with inherited /MediaBox.
  *
  * Layout model: 10pt Courier (600/1000 em => 6 units/char — the same
  * advance the layout pipeline's CharWidth assumes), positioned with Tm/Td,
  * so generated documents drive the identical column-segmentation and
  * reading-order code paths as the synthetic layout stream.
  */
object RealPdf {

  final case class TextRun(x: Double, y: Double, text: String)

  /** Standard-security-handler encryption for fixtures (ISO 32000-1
    * §7.6.3 and ISO 32000-2 §7.6.4, via the shared
    * [[graft.extract.PdfCrypto]] primitives). The interesting crawled
    * shape is owner-password-only (`userPwd = ""`): readable by every real
    * extractor without a password. Presets: RC4-40 (v=1, r=2), RC4-128
    * (v=2, r=3), AES-128 (v=4, r=4, aes), AES-256 (v=5, r=6 — or r=5 for
    * the deprecated Acrobat-9 hash).
    */
  final case class Encryption(
      ownerPwd: String,
      userPwd: String = "",
      v: Int = 2,
      r: Int = 3,
      lengthBits: Int = 128,
      aes: Boolean = false,
      encryptMetadata: Boolean = true)
  object Encryption {
    def rc4_40(owner: String, user: String = ""): Encryption =
      Encryption(owner, user, v = 1, r = 2, lengthBits = 40)
    def rc4_128(owner: String, user: String = ""): Encryption =
      Encryption(owner, user, v = 2, r = 3, lengthBits = 128)
    def aes128(owner: String, user: String = ""): Encryption =
      Encryption(owner, user, v = 4, r = 4, lengthBits = 128, aes = true)
    def aes256(owner: String, user: String = ""): Encryption =
      Encryption(owner, user, v = 5, r = 6, lengthBits = 256, aes = true)
    def aes256r5(owner: String, user: String = ""): Encryption =
      Encryption(owner, user, v = 5, r = 5, lengthBits = 256, aes = true)
  }

  /** One page of positioned runs; `y` is in the DOWNWARD convention of the
    * layout pipeline ([[graft.extract.PdfExtractor.Run]]) and is flipped
    * into PDF's upward axis at write time, so round-trip expectations read
    * naturally.
    */
  /** `transport` optionally wraps the (possibly Flate-compressed) content
    * stream in one of the byte-level transport filters
    * (`ASCIIHexDecode` / `ASCII85Decode` / `RunLengthDecode`); combined
    * with `compress` the /Filter array is `[transport /FlateDecode]` —
    * decode order transport-first, exactly as real generators chain them.
    */
  /** `cidFont = true` shows the page's text through a /Type0 composite
    * font (/Encoding /Identity-H, CIDFontType2 descendant) with 2-byte
    * codes equal to the Unicode codepoints, written as hex strings; the
    * /ToUnicode CMap maps ASCII through one bfrange and every other used
    * char through bfchar entries. `cidToUnicode = false` omits the CMap
    * (the reader must refuse loudly — opaque glyph ids). `cidEncoding`
    * also accepts "Embedded-2" / "Embedded-1": the /Encoding becomes an
    * embedded CMap STREAM (codespace <0000><FFFF> / <00><FF> plus an
    * identity cidrange) — the subsetted-CJK shape; Embedded-1 assigns
    * PRIVATE sequential 1-byte codes to the distinct chars and maps them
    * back only through the ToUnicode CMap.
    */
  /** `formXObject = true` wraps the page's text in a /Form XObject
    * carrying its OWN /Resources, invoked from a minimal `q /Fx1 Do Q`
    * page stream — the Word/Quartz-era page shape; `formMatrix` adds an
    * axis-aligned translate to the form's /Matrix.
    */
  final case class PageSpec(
      width: Int = 612,
      height: Int = 792,
      runs: Seq[TextRun] = Nil,
      compress: Boolean = false,
      splitContents: Boolean = false,
      indirectLength: Boolean = false,
      hexStrings: Boolean = false,
      transport: Option[String] = None,
      cidFont: Boolean = false,
      cidToUnicode: Boolean = true,
      cidEncoding: String = "Identity-H",
      formXObject: Boolean = false,
      formMatrix: Option[(Double, Double)] = None,
      formCm: Option[(Double, Double)] = None)

  private def escLiteral(s: String): String =
    s.flatMap {
      case '('  => "\\("
      case ')'  => "\\)"
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case c    => c.toString
    }

  private def hexOf(s: String): String =
    s.getBytes(StandardCharsets.ISO_8859_1).map("%02X".format(_)).mkString

  /** Locale-independent decimal formatting: f"$x%.1f" uses the JVM default
    * FORMAT locale and would emit "72,0" (an invalid PDF number token)
    * under e.g. de_DE.
    */
  private def num1(x: Double): String =
    String.format(java.util.Locale.ROOT, "%.1f", Double.box(x))

  private def contentOps(p: PageSpec, cid1Map: Map[Char, Int] = Map.empty): String = {
    val sb = new StringBuilder
    sb.append(s"BT\n${if (p.cidFont) "/F2" else "/F1"} 10 Tf\n12 TL\n")
    p.runs.foreach { r =>
      val pdfY = p.height - r.y // downward spec -> upward PDF axis
      sb.append(s"1 0 0 1 ${num1(r.x)} ${num1(pdfY)} Tm\n")
      if (p.cidFont) {
        if (cid1Map.nonEmpty) {
          // Embedded-1: PRIVATE sequential 1-byte codes — meaningless
          // without the ToUnicode CMap, exactly like a subset font
          val codes = r.text.map(c => f"${cid1Map(c)}%02X").mkString
          sb.append(s"<$codes> Tj\n")
        } else {
          // 2-byte codes, hex-string form: codepoints for Identity-H/UCS2
          // (BMP only), raw UTF-16 code units for the UTF16 families (a
          // surrogate pair becomes two consecutive 2-byte codes — exactly
          // the UTF-16BE byte sequence those CMaps define)
          val utf16 = p.cidEncoding.contains("UTF16")
          val codes = r.text.map { c =>
            require(utf16 || !Character.isSurrogate(c),
              "BMP text only for non-UTF16 CID pages")
            f"${c.toInt}%04X"
          }.mkString
          sb.append(s"<$codes> Tj\n")
        }
      } else if (p.hexStrings) sb.append(s"<${hexOf(r.text)}> Tj\n")
      else sb.append(s"(${escLiteral(r.text)}) Tj\n")
    }
    sb.append("ET")
    sb.toString
  }

  /** A /ToUnicode CMap over the used chars: ASCII printable through ONE
    * bfrange (last-byte increment form), everything else through bfchar.
    */
  private def toUnicodeCMap(chars: Set[Char]): String = {
    val extra = chars.filter(c => c < 0x20 || c > 0x7e).toSeq.sorted
    val sb = new StringBuilder
    sb.append("/CIDInit /ProcSet findresource begin\n12 dict begin\nbegincmap\n")
    sb.append("/CIDSystemInfo << /Registry (Graft) /Ordering (UCS) /Supplement 0 >> def\n")
    sb.append("/CMapName /Graft-UCS def\n/CMapType 2 def\n")
    sb.append("1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n")
    sb.append("1 beginbfrange\n<0020> <007E> <0020>\nendbfrange\n")
    if (extra.nonEmpty) {
      sb.append(s"${extra.length} beginbfchar\n")
      extra.foreach(c => sb.append(f"<${c.toInt}%04X> <${c.toInt}%04X>\n"))
      sb.append("endbfchar\n")
    }
    sb.append("endcmap\nCMapName currentdict /CMap defineresource pop\nend\nend")
    sb.toString
  }

  /** A 1-byte-codespace /ToUnicode CMap from explicit (code, text)
    * entries — for simple fonts and Embedded-1 composite fonts, whose
    * codes are private.
    */
  private def toUnicode1CMap(entries: Seq[(Int, String)]): String = {
    val sb = new StringBuilder
    sb.append("/CIDInit /ProcSet findresource begin\n12 dict begin\nbegincmap\n")
    sb.append("/CIDSystemInfo << /Registry (Graft) /Ordering (UCS1) /Supplement 0 >> def\n")
    sb.append("/CMapName /Graft-UCS1 def\n/CMapType 2 def\n")
    sb.append("1 begincodespacerange\n<00> <FF>\nendcodespacerange\n")
    sb.append(s"${entries.length} beginbfchar\n")
    entries.foreach { case (code, txt) =>
      val dst = txt.map(c => f"${c.toInt}%04X").mkString
      sb.append(f"<$code%02X> <$dst>\n")
    }
    sb.append("endbfchar\n")
    sb.append("endcmap\nCMapName currentdict /CMap defineresource pop\nend\nend")
    sb.toString
  }

  /** An embedded /Encoding CMap stream (Adobe CMap spec): the codespace
    * plus an identity cidrange — what a subset-font writer emits. The
    * reader only consumes the codespace width; the cidrange makes the
    * stream structurally faithful (and exercises skipping it).
    */
  private def encodingCMap(twoByte: Boolean): String = {
    val (lo, hi) = if (twoByte) ("<0000>", "<FFFF>") else ("<00>", "<FF>")
    val sb = new StringBuilder
    sb.append("/CIDInit /ProcSet findresource begin\n12 dict begin\nbegincmap\n")
    sb.append("/CIDSystemInfo << /Registry (Graft) /Ordering (Private) /Supplement 0 >> def\n")
    sb.append("/CMapName /Graft-Private def\n/CMapType 1 def\n")
    sb.append(s"1 begincodespacerange\n$lo $hi\nendcodespacerange\n")
    sb.append(s"1 begincidrange\n$lo $hi 0\nendcidrange\n")
    sb.append("endcmap\nCMapName currentdict /CMap defineresource pop\nend\nend")
    sb.toString
  }

  private def deflate(b: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(b); d.finish()
    val out = new ByteArrayOutputStream()
    val chunk = new Array[Byte](8192)
    while (!d.finished()) out.write(chunk, 0, d.deflate(chunk))
    d.end()
    out.toByteArray
  }

  // spec-conformant transport-filter encoders (ISO 32000-1 7.4.2/7.4.3/
  // 7.4.5) for round-trip fixtures against the reader's decoders
  private def asciiHexEncode(b: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder(b.length * 2 + 8)
    var i = 0
    while (i < b.length) {
      sb.append("0123456789abcdef".charAt((b(i) >> 4) & 0xf))
      sb.append("0123456789abcdef".charAt(b(i) & 0xf))
      if (i % 40 == 39) sb.append('\n') // whitespace must be ignored
      i += 1
    }
    sb.append('>')
    sb.toString.getBytes(StandardCharsets.ISO_8859_1)
  }

  private def ascii85Encode(b: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder(b.length * 5 / 4 + 8)
    var i = 0
    while (i < b.length) {
      val n = math.min(4, b.length - i)
      var t = 0L
      var k = 0
      while (k < 4) {
        t = (t << 8) | (if (i + k < b.length) b(i + k) & 0xffL else 0L)
        k += 1
      }
      if (n == 4 && t == 0L) sb.append('z')
      else {
        val digits = new Array[Char](5)
        var v = t
        var j = 4
        while (j >= 0) { digits(j) = ('!' + (v % 85).toInt).toChar; v /= 85; j -= 1 }
        var m = 0
        while (m <= n) { sb.append(digits(m)); m += 1 } // n+1 chars for n bytes
      }
      i += 4
    }
    sb.append("~>")
    sb.toString.getBytes(StandardCharsets.ISO_8859_1)
  }

  private def runLengthEncode(b: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(b.length + 8)
    var i = 0
    while (i < b.length) {
      var runLen = 1
      while (i + runLen < b.length && b(i + runLen) == b(i) && runLen < 128) runLen += 1
      if (runLen >= 2) {
        out.write(257 - runLen) // 129..255: repeat next byte 257-L times
        out.write(b(i))
        i += runLen
      } else {
        var j = i
        while (j < b.length && j - i < 128 &&
          !(j + 2 < b.length && b(j) == b(j + 1) && b(j + 1) == b(j + 2))) j += 1
        out.write(j - i - 1) // 0..127: copy next L+1 literal bytes
        out.write(b, i, j - i)
        i = j
      }
    }
    out.write(128) // EOD
    out.toByteArray
  }

  /** TIFF-style LZW encoder (ISO 32000-1 7.4.4, EarlyChange=1): MSB-first
    * bit packing, 9->12-bit growth mirroring the reader's width rule,
    * Clear at start and before the table fills, EOD terminator.
    */
  private def lzwEncode(b: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(b.length + 16)
    var bitBuf = 0L
    var bitCnt = 0
    var width = 9
    def put(code: Int): Unit = {
      bitBuf = (bitBuf << width) | code.toLong
      bitCnt += width
      while (bitCnt >= 8) {
        out.write(((bitBuf >> (bitCnt - 8)) & 0xff).toInt)
        bitCnt -= 8
      }
    }
    val dict = new java.util.HashMap[String, Integer]()
    var nextCode = 258
    def reset(): Unit = { dict.clear(); nextCode = 258; width = 9 }
    put(256) // initial Clear
    reset()
    val cur = new StringBuilder // byte sequence as chars 0..255
    def codeOf(s: CharSequence): Int =
      if (s.length == 1) s.charAt(0).toInt else dict.get(s.toString).intValue()
    b.foreach { byte =>
      val k = (byte & 0xff).toChar
      if (cur.isEmpty) cur.append(k)
      else {
        cur.append(k)
        if (dict.containsKey(cur.toString)) () // extend
        else {
          val candidate = cur.toString
          cur.setLength(cur.length - 1)
          put(codeOf(cur))
          dict.put(candidate, nextCode)
          nextCode += 1
          // decoder lockstep: the reader's add for the code we just wrote
          // happens only when it reads the NEXT code, so its width (grown
          // after ITS add, nextCode+earlyChange >= 1<<width) trails ours
          // by one add — the writer must therefore grow one emit later:
          // nextCode + earlyChange - 1 >= 1<<width, with EarlyChange=1:
          if (nextCode >= (1 << width) && width < 12) width += 1
          // clear safely before the table fills (decoder resets in lockstep)
          if (nextCode >= 4000) { put(256); reset() }
          cur.setLength(0)
          cur.append(k)
        }
      }
    }
    if (cur.nonEmpty) put(codeOf(cur))
    put(257) // EOD
    if (bitCnt > 0) out.write(((bitBuf << (8 - bitCnt)) & 0xff).toInt) // pad
    out.toByteArray
  }

  private def applyTransport(p: PageSpec, flateBody: Array[Byte]): (Array[Byte], String) = {
    val body = p.transport match {
      case Some("ASCIIHexDecode")  => asciiHexEncode(flateBody)
      case Some("ASCII85Decode")   => ascii85Encode(flateBody)
      case Some("RunLengthDecode") => runLengthEncode(flateBody)
      case Some("LZWDecode")       => lzwEncode(flateBody)
      case Some(other)             => throw new IllegalArgumentException(s"unknown transport $other")
      case None                    => flateBody
    }
    val names = p.transport.toSeq ++ (if (p.compress) Seq("FlateDecode") else Nil)
    val filter = names match {
      case Seq()    => ""
      case Seq(one) => s" /Filter /$one"
      case many     => many.map("/" + _).mkString(" /Filter [", " ", "]")
    }
    (body, filter)
  }

  /** Serialize a document. `nestedKids = true` wraps pages in an
    * intermediate /Pages node (inherited /MediaBox exercised when a page
    * omits its own).
    */
  /** Serialize a document.
    *
    *   - `nestedKids`: wrap pages in an intermediate /Pages node (inherited
    *     /MediaBox exercised when a page omits its own).
    *   - `xrefStream`: write a PDF 1.5 cross-reference STREAM (binary
    *     W=[1 4 2] rows, trailer fields in the stream dict, no classic
    *     table) — the modern writer default.
    *   - `objStmPack`: pack the non-stream dictionary objects (catalog,
    *     page tree, font, page dicts) into one /Type /ObjStm compressed
    *     object stream, referenced by type-2 xref entries. Requires
    *     `xrefStream` (a classic table cannot express type-2 entries).
    *   - `xrefPredictor`: apply the PNG Up predictor (/Predictor 12) to
    *     the xref stream data, as common writers do.
    */
  /** `emptyCatalogString` plants a zero-length string in the catalog dict
    * that stays PLAINTEXT even when `encrypt` is set (written as the empty
    * hex string `<>`, which the string encryptor leaves alone) — the
    * sloppy-real-writer shape where `()` entries are left unencrypted in
    * otherwise encrypted documents.
    */
  def document(
      pages: Seq[PageSpec],
      nestedKids: Boolean = false,
      xrefStream: Boolean = false,
      objStmPack: Boolean = false,
      xrefPredictor: Boolean = false,
      simpleFontEncoding: Option[String] = None,
      simpleFontToUnicode: Option[Seq[(Int, String)]] = None,
      encrypt: Option[Encryption] = None,
      emptyCatalogString: Boolean = false): Array[Byte] = {
    require(!objStmPack || xrefStream, "objStmPack requires xrefStream")
    require(!xrefPredictor || xrefStream, "xrefPredictor requires xrefStream")
    val out = new ByteArrayOutputStream()
    def ascii(s: String): Unit = out.write(s.getBytes(StandardCharsets.ISO_8859_1))
    val offsets = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)] // (objNum, offset)
    // dict objects deferred into the ObjStm when packing: (num, body)
    val packed = scala.collection.mutable.ArrayBuffer.empty[(Int, String)]

    var nextObj = 1
    def alloc(): Int = { val n = nextObj; nextObj += 1; n }

    import graft.extract.PdfCrypto
    // everything derived once, deterministic (fixed /ID, fixed V5 salts
    // and file key, per-object IVs hashed from the object number); the
    // V5 extras (oe/ue/perms) are empty for the legacy revisions
    val encPerms = -44 // print + extract allowed, modify denied — typical
    final case class EncComputed(
        e: Encryption,
        o: Array[Byte], u: Array[Byte],
        oe: Array[Byte], ue: Array[Byte], perms: Array[Byte],
        id0: Array[Byte], key: Array[Byte])
    val encState: Option[EncComputed] =
      encrypt.map { e =>
        val ownerB = e.ownerPwd.getBytes(StandardCharsets.ISO_8859_1)
        val userB = e.userPwd.getBytes(StandardCharsets.ISO_8859_1)
        val id0 = PdfCrypto.md5("graft-fixture-id".getBytes(StandardCharsets.US_ASCII))
        if (e.v == 5) {
          // AES-256: the file key is free-standing (not password-derived);
          // /U//UE wrap it under the user password, /O//OE under the owner
          def b8(tag: String): Array[Byte] =
            PdfCrypto.md5(tag.getBytes(StandardCharsets.US_ASCII)).take(8)
          val fileKey =
            PdfCrypto.md5("graft-v5-key-a".getBytes(StandardCharsets.US_ASCII)) ++
              PdfCrypto.md5("graft-v5-key-b".getBytes(StandardCharsets.US_ASCII))
          val (u, ue) = PdfCrypto.makeUV5(e.r, userB, fileKey, b8("u-vs"), b8("u-ks"))
          val (o, oe) = PdfCrypto.makeOV5(e.r, ownerB, fileKey, u, b8("o-vs"), b8("o-ks"))
          val perms = PdfCrypto.makePermsV5(fileKey, encPerms, e.encryptMetadata)
          EncComputed(e, o, u, oe, ue, perms, id0, fileKey)
        } else {
          val keyLen = if (e.v == 1) 5 else e.lengthBits / 8
          val o = PdfCrypto.computeO(ownerB, userB, e.r, keyLen)
          val key = PdfCrypto.computeKey(
            userB, o, encPerms, id0, e.r, keyLen, e.encryptMetadata)
          val u = PdfCrypto.computeU(key, id0, e.r)
          EncComputed(e, o, u,
            Array.emptyByteArray, Array.emptyByteArray, Array.emptyByteArray,
            id0, key)
        }
      }
    def encStream(num: Int, b: Array[Byte]): Array[Byte] = encState match {
      case Some(s) =>
        val objKey =
          if (s.e.v == 5) s.key // AES-256: the file key directly, no derivation
          else PdfCrypto.objectKey(s.key, num, 0, aes = s.e.aes)
        if (s.e.aes)
          PdfCrypto.aesEncrypt(
            objKey,
            PdfCrypto.md5(s"graft-iv-$num".getBytes(StandardCharsets.US_ASCII)).take(16),
            b)
        else PdfCrypto.rc4(objKey, b)
      case None => b
    }
    // top-level dict strings: literal (...) forms re-encoded as encrypted
    // hex strings; fixture strings carry no escapes or nested parens.
    // ObjStm-packed dicts keep plaintext strings (§7.5.7: members of an
    // encrypted ObjStm are not encrypted individually).
    def encStringsIn(num: Int, body: String): String = encState match {
      case Some(_) =>
        val m = java.util.regex.Pattern.compile("\\(([^()\\\\]*)\\)").matcher(body)
        val sb = new StringBuffer
        while (m.find()) {
          val cipher = encStream(num, m.group(1).getBytes(StandardCharsets.ISO_8859_1))
          m.appendReplacement(sb, "<" + cipher.map("%02X".format(_)).mkString + ">")
        }
        m.appendTail(sb)
        sb.toString
      case None => body
    }

    val catalogNum = alloc()
    val pagesNum = alloc()
    val fontNum = alloc()
    val innerPagesNum = if (nestedKids) alloc() else -1
    val anyCid = pages.exists(_.cidFont)
    val anyToUni = pages.exists(p => p.cidFont && p.cidToUnicode)
    val cidFontNum = if (anyCid) alloc() else -1
    val cidDescNum = if (anyCid) alloc() else -1
    val toUniNum = if (anyToUni) alloc() else -1
    val cidEncName = pages.find(_.cidFont).map(_.cidEncoding).getOrElse("Identity-H")
    val cidEncEmbedded = cidEncName.startsWith("Embedded")
    val cidEncNum = if (anyCid && cidEncEmbedded) alloc() else -1
    val simpleToUniNum = if (simpleFontToUnicode.isDefined) alloc() else -1
    // Embedded-1: private sequential 1-byte codes over the distinct chars
    // of all CID pages, in order of first appearance (a subset font's
    // code assignment); the ToUnicode CMap is the ONLY way back to text
    val cid1Map: Map[Char, Int] =
      if (cidEncName == "Embedded-1") {
        val distinct = pages.filter(_.cidFont).flatMap(_.runs).flatMap(_.text).distinct
        require(distinct.length <= 255, "Embedded-1 pages limited to 255 distinct chars")
        distinct.zipWithIndex.map { case (c, i) => c -> (i + 1) }.toMap
      } else Map.empty

    // per page: page obj + content obj(s) + optional length obj(s)
    final case class PagePlan(
        pageNum: Int,
        contentNums: Seq[Int],
        lengthNums: Seq[Int],
        formNum: Int,
        spec: PageSpec)
    val plans = pages.map { p =>
      val pageNum = alloc()
      val nStreams = if (p.splitContents) 2 else 1
      val contentNums = Seq.fill(nStreams)(alloc())
      val lengthNums = if (p.indirectLength) Seq.fill(nStreams)(alloc()) else Nil
      val formNum = if (p.formXObject) alloc() else -1
      PagePlan(pageNum, contentNums, lengthNums, formNum, p)
    }

    def obj(num: Int)(body: => Unit): Unit = {
      offsets += ((num, out.size()))
      ascii(s"$num 0 obj\n")
      body
      ascii("\nendobj\n")
    }

    // a dictionary object: top-level normally, deferred into the ObjStm
    // when packing (objects inside an ObjStm are direct, no header)
    def dictObj(num: Int, body: String): Unit =
      if (objStmPack) { packed += ((num, body)); () }
      else obj(num)(ascii(encStringsIn(num, body)))

    ascii(s"%PDF-1.${if (xrefStream) "5" else "4"}\n%âãÏÓ\n") // binary marker

    val catalogExtra = if (emptyCatalogString) " /GraftEmpty <>" else ""
    dictObj(catalogNum, s"<< /Type /Catalog /Pages $pagesNum 0 R$catalogExtra >>")
    val kidRefs =
      if (nestedKids) s"[$innerPagesNum 0 R]"
      else plans.map(p => s"${p.pageNum} 0 R").mkString("[", " ", "]")
    // top node carries the inheritable MediaBox when nesting
    dictObj(
      pagesNum,
      s"<< /Type /Pages /Kids $kidRefs /Count ${plans.length}" +
        (if (nestedKids) " /MediaBox [0 0 612 792]" else "") + " >>")
    if (nestedKids)
      dictObj(
        innerPagesNum,
        s"<< /Type /Pages /Parent $pagesNum 0 R /Kids " +
          plans.map(p => s"${p.pageNum} 0 R").mkString("[", " ", "]") +
          s" /Count ${plans.length} >>")
    val encEntry = simpleFontEncoding.map(e => s" /Encoding $e").getOrElse("")
    val f1ToUni =
      if (simpleFontToUnicode.isDefined) s" /ToUnicode $simpleToUniNum 0 R" else ""
    dictObj(fontNum, s"<< /Type /Font /Subtype /Type1 /BaseFont /Courier$encEntry$f1ToUni >>")
    simpleFontToUnicode.foreach { entries =>
      val z = toUnicode1CMap(entries).getBytes(StandardCharsets.ISO_8859_1)
      val zE = encStream(simpleToUniNum, z)
      obj(simpleToUniNum) {
        ascii(s"<< /Length ${zE.length} >>\nstream\n")
        out.write(zE)
        ascii("\nendstream")
      }
    }
    if (anyCid) {
      val toUniRef = if (anyToUni) s" /ToUnicode $toUniNum 0 R" else ""
      val encSpec =
        if (cidEncEmbedded) s"/Encoding $cidEncNum 0 R" else s"/Encoding /$cidEncName"
      dictObj(
        cidFontNum,
        s"<< /Type /Font /Subtype /Type0 /BaseFont /GraftCID " +
          s"$encSpec /DescendantFonts [$cidDescNum 0 R]$toUniRef >>")
      if (cidEncEmbedded) {
        val z = encodingCMap(twoByte = cidEncName == "Embedded-2")
          .getBytes(StandardCharsets.ISO_8859_1)
        val zE = encStream(cidEncNum, z)
        obj(cidEncNum) {
          ascii(s"<< /Length ${zE.length} >>\nstream\n")
          out.write(zE)
          ascii("\nendstream")
        }
      }
      dictObj(
        cidDescNum,
        "<< /Type /Font /Subtype /CIDFontType2 /BaseFont /GraftCID " +
          "/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) /Supplement 0 >> " +
          "/CIDToGIDMap /Identity /DW 600 >>")
      if (anyToUni) {
        val cmapText =
          if (cid1Map.nonEmpty)
            toUnicode1CMap(
              cid1Map.toSeq.sortBy(_._2).map { case (c, code) => code -> c.toString })
          else
            toUnicodeCMap(
              pages.filter(p => p.cidFont && p.cidToUnicode)
                .flatMap(_.runs).flatMap(_.text).toSet)
        val z = cmapText.getBytes(StandardCharsets.ISO_8859_1)
        val zE = encStream(toUniNum, z)
        obj(toUniNum) {
          ascii(s"<< /Length ${zE.length} >>\nstream\n")
          out.write(zE)
          ascii("\nendstream")
        }
      }
    }

    plans.foreach { plan =>
      val p = plan.spec
      // page dict: omit MediaBox when nesting (inherits from the top node)
      val mb = if (nestedKids) "" else s" /MediaBox [0 0 ${p.width} ${p.height}]"
      val contents =
        if (plan.contentNums.length == 1) s"${plan.contentNums.head} 0 R"
        else plan.contentNums.map(n => s"$n 0 R").mkString("[", " ", "]")
      val parent = if (nestedKids) innerPagesNum else pagesNum
      val fontRes = s"/F1 $fontNum 0 R" +
        (if (p.cidFont) s" /F2 $cidFontNum 0 R" else "")
      // a form-XObject page declares the form under /XObject and invokes
      // it from a minimal wrapper stream; the fonts live in the FORM's
      // own resources (exercising the reader's resource switch)
      val pageRes =
        if (p.formXObject) s"<< /XObject << /Fx1 ${plan.formNum} 0 R >> >>"
        else s"<< /Font << $fontRes >> >>"
      dictObj(
        plan.pageNum,
        s"<< /Type /Page /Parent $parent 0 R$mb /Contents $contents " +
          s"/Resources $pageRes >>")
      if (p.formXObject) {
        val formOps =
          encStream(plan.formNum, contentOps(p, cid1Map).getBytes(StandardCharsets.ISO_8859_1))
        val matrix = p.formMatrix
          .map { case (e, f) => s" /Matrix [1 0 0 1 ${num1(e)} ${num1(f)}]" }
          .getOrElse("")
        obj(plan.formNum) {
          ascii(s"<< /Type /XObject /Subtype /Form /BBox [0 0 ${p.width} ${p.height}]" +
            s"$matrix /Resources << /Font << $fontRes >> >> " +
            s"/Length ${formOps.length} >>\nstream\n")
          out.write(formOps)
          ascii("\nendstream")
        }
      }
      val opsAll =
        if (p.formXObject) {
          // optional cm-positioned invocation (the common real-generator
          // placement): translate inside the q/Q bracket
          val cm = p.formCm
            .map { case (e, f) => s"1 0 0 1 ${num1(e)} ${num1(f)} cm\n" }
            .getOrElse("")
          s"q\n$cm/Fx1 Do\nQ"
        } else contentOps(p, cid1Map)
      val parts: Seq[String] =
        if (p.splitContents) {
          // split roughly in half at an operator boundary: token halves of a
          // split content stream are concatenated by the reader
          val lines = opsAll.split("\n")
          val mid = lines.length / 2
          Seq(lines.take(mid).mkString("\n"), lines.drop(mid).mkString("\n"))
        } else Seq(opsAll)
      parts.zipWithIndex.foreach { case (part, i) =>
        val raw = part.getBytes(StandardCharsets.ISO_8859_1)
        val flateBody = if (p.compress) deflate(raw) else raw
        // filters first, encryption LAST: readers decrypt raw stream bytes
        // and then run the /Filter chain (§7.6.2)
        val (plainBody, filter) = applyTransport(p, flateBody)
        val body = encStream(plan.contentNums(i), plainBody)
        val lenField =
          if (p.indirectLength) s"${plan.lengthNums(i)} 0 R" else body.length.toString
        obj(plan.contentNums(i)) {
          ascii(s"<< /Length $lenField$filter >>\nstream\n")
          out.write(body)
          ascii("\nendstream")
        }
        if (p.indirectLength) obj(plan.lengthNums(i)) {
          ascii(body.length.toString)
        }
      }
    }

    // ObjStm: header of (num, offset) pairs, then the packed bodies
    val stmLoc = scala.collection.mutable.Map.empty[Int, Int] // num -> idx in stm
    val objStmNum = if (objStmPack) alloc() else -1
    if (objStmPack) {
      val bodies = packed.toVector
      val bodyBlob = new StringBuilder
      val pairs = new StringBuilder
      bodies.zipWithIndex.foreach { case ((num, body), idx) =>
        pairs.append(s"$num ${bodyBlob.length} ")
        bodyBlob.append(body).append('\n')
        stmLoc(num) = idx
      }
      val header = pairs.toString
      val data = (header + bodyBlob.toString).getBytes(StandardCharsets.ISO_8859_1)
      val z = encStream(objStmNum, deflate(data))
      obj(objStmNum) {
        ascii(
          s"<< /Type /ObjStm /N ${bodies.length} /First ${header.length} " +
            s"/Length ${z.length} /Filter /FlateDecode >>\nstream\n")
        out.write(z)
        ascii("\nendstream")
      }
    }

    // the /Encrypt dict: a TOP-LEVEL object (never ObjStm-packed, §7.5.7)
    // whose /O and /U strings stay plaintext hex (§7.6.2)
    def hexUp(b: Array[Byte]): String = b.map("%02X".format(_)).mkString
    val encNum = encState.map { s =>
      val e = s.e
      val n = alloc()
      val cfPart =
        if (e.v == 5)
          // AES-256: key-wrap strings /OE //UE, the /Perms sentinel, and
          // the /AESV3 crypt filter (ISO 32000-2 §7.6.4 dictionary shape)
          s" /OE <${hexUp(s.oe)}> /UE <${hexUp(s.ue)}> /Perms <${hexUp(s.perms)}>" +
            " /CF << /StdCF << /CFM /AESV3 /Length 32 >> >> /StmF /StdCF /StrF /StdCF" +
            (if (e.encryptMetadata) "" else " /EncryptMetadata false")
        else if (e.v == 4)
          " /CF << /StdCF << /CFM " + (if (e.aes) "/AESV2" else "/V2") +
            s" /Length ${e.lengthBits / 8} >> >> /StmF /StdCF /StrF /StdCF" +
            (if (e.encryptMetadata) "" else " /EncryptMetadata false")
        else ""
      obj(n) {
        ascii(
          s"<< /Filter /Standard /V ${e.v} /R ${e.r} /Length ${e.lengthBits} " +
            s"/P $encPerms /O <${hexUp(s.o)}> /U <${hexUp(s.u)}>$cfPart >>")
      }
      n
    }
    val trailerEnc = encState
      .map { s =>
        s" /Encrypt ${encNum.get} 0 R /ID [<${hexUp(s.id0)}> <${hexUp(s.id0)}>]"
      }
      .getOrElse("")

    if (!xrefStream) {
      // classic xref table + trailer
      val xrefOff = out.size()
      val byNum = offsets.sortBy(_._1)
      ascii(s"xref\n0 ${nextObj}\n")
      ascii("0000000000 65535 f \n")
      byNum.foreach { case (_, off) => ascii(f"$off%010d 00000 n \n") }
      ascii(
        s"trailer\n<< /Size $nextObj /Root $catalogNum 0 R$trailerEnc >>\nstartxref\n$xrefOff\n%%EOF\n")
    } else {
      // PDF 1.5 cross-reference stream: W=[1 4 2] binary rows for objects
      // 0..Size-1 (type 0 free head, type 1 at-offset, type 2 in-ObjStm),
      // trailer fields in the stream dict, optional PNG Up predictor
      val xrefNum = alloc()
      val xrefOff = out.size()
      val size = nextObj
      val offByNum = offsets.toMap
      val columns = 7
      val rows = new ByteArrayOutputStream()
      def row(t: Int, f2: Int, f3: Int): Unit = {
        rows.write(t)
        rows.write((f2 >>> 24) & 0xff); rows.write((f2 >>> 16) & 0xff)
        rows.write((f2 >>> 8) & 0xff); rows.write(f2 & 0xff)
        rows.write((f3 >>> 8) & 0xff); rows.write(f3 & 0xff)
      }
      (0 until size).foreach { num =>
        if (num == 0) row(0, 0, 65535)
        else if (num == xrefNum) row(1, xrefOff, 0)
        else if (stmLoc.contains(num)) row(2, objStmNum, stmLoc(num))
        else row(1, offByNum.getOrElse(num, 0), 0)
      }
      val rawRows = rows.toByteArray
      val (data, parms) =
        if (!xrefPredictor) (rawRows, "")
        else {
          // PNG Up filter (type 2) per row: value - up
          val nRows = rawRows.length / columns
          val filtered = new ByteArrayOutputStream()
          var r = 0
          while (r < nRows) {
            filtered.write(2)
            var c = 0
            while (c < columns) {
              val cur = rawRows(r * columns + c) & 0xff
              val up = if (r > 0) rawRows((r - 1) * columns + c) & 0xff else 0
              filtered.write((cur - up) & 0xff)
              c += 1
            }
            r += 1
          }
          (filtered.toByteArray,
            s" /DecodeParms << /Predictor 12 /Columns $columns >>")
        }
      val z = deflate(data)
      ascii(s"$xrefNum 0 obj\n")
      ascii(
        s"<< /Type /XRef /Size $size /W [1 4 2] /Index [0 $size] " +
          s"/Root $catalogNum 0 R$trailerEnc /Length ${z.length} /Filter /FlateDecode$parms >>\nstream\n")
      out.write(z)
      ascii("\nendstream\nendobj\n")
      ascii(s"startxref\n$xrefOff\n%%EOF\n")
    }
    out.toByteArray
  }
}
