package graft.extract

import java.nio.charset.StandardCharsets

import scala.collection.mutable

/** Minimal real-PDF (ISO 32000 subset) container reader.
  *
  * Rounds 1-3 parsed only the deterministic `%PDF-GRAFT` layout stream and
  * documented the real container as an environment-imposed boundary (no PDF
  * library ships here — and none is needed for this subset). This reader
  * shrinks that boundary to the exotic corners: it parses the actual PDF
  * object syntax from bytes and feeds the SAME positioned-run page model
  * ([[PdfExtractor.Page]]) that the layout pipeline (column segmentation,
  * reading-order sweep, per-page selective heavy reprocessing) already
  * consumes. Supported, because this is what text-bearing web PDFs are made
  * of (reference consumes the same structures via PyMuPDF,
  * processor.py:76-83):
  *
  *   - BOTH cross-reference forms, mixed freely along the /Prev chain:
  *     classic `xref` tables AND PDF 1.5+ cross-reference STREAMS (binary
  *     W-width rows, /Index subsections, PNG predictors via /DecodeParms —
  *     the modern writer default), plus /Type /ObjStm object streams
  *     (type-2 entries; packed objects unpacked and cached per stream,
  *     cycle-guarded). Lenient fallback: if the chain is truncated or
  *     corrupt — common in crawled PDFs — objects are recovered by a
  *     linear `N G obj` scan (the B8 lenient-parse discipline applied to
  *     the container itself);
  *   - the full object syntax: dictionaries, arrays, names (incl. #xx
  *     escapes), literal strings (escapes, octal, line continuations),
  *     hex strings, numbers, booleans, null, indirect references,
  *     comments, streams with direct or INDIRECT /Length;
  *   - stream filter chains in array order: /FlateDecode via java.util.zip
  *     (the compression real generators emit), /LZWDecode (TIFF-style LZW
  *     with EarlyChange, the pre-Flate-era compression old crawled PDFs
  *     carry) and the byte-level transport filters /ASCIIHexDecode,
  *     /ASCII85Decode and /RunLengthDecode; unfiltered streams;
  *     unsupported filters (DCT/JBIG2/JPX/CCITT/Crypt) fail loudly per
  *     page;
  *   - the page tree (/Root -> /Pages -> /Kids recursion, cycle-guarded)
  *     with inheritable /MediaBox;
  *   - the text-showing operator set: BT/ET, Tf, Td, TD, TL, T*, Tm, Tj,
  *     TJ (with kerning adjustments), ' and ", the text-state parameters
  *     Tc/Tw/Tz (feeding the advance model), plus the graphics-state
  *     CTM (cm within q/Q, full coefficients tracked, composed with form
  *     invocations): positions map text space -> user space; a rotated
  *     or skewed CTM is loud only when TEXT is shown under it (graphics
  *     rotations pass through harmlessly). PDF's upward y axis is flipped
  *     into the downward [[PdfExtractor.Run]] convention;
  *   - form XObjects: `Do` recurses into /Subtype /Form streams with
  *     their own /Resources (invoker's when absent) and an axis-aligned
  *     /Matrix applied to geometry (the Word/Quartz page shape: content
  *     in a form behind a tiny wrapper stream) — cycle/depth guarded;
  *     image XObjects contribute no text;
  *   - fonts: simple fonts decode 1 byte/glyph as Latin-1 (exact for the
  *     Standard/WinAnsi printable range); /Type0 composite fonts with
  *     /Encoding /Identity-H decode their 2-byte CID strings through the
  *     /ToUnicode CMap (codespacerange, bfchar, bfrange incl. the
  *     destination-array form and multi-char ligature expansions) — the
  *     dominant shape modern generators (LaTeX fontspec, MS Word) emit;
  *     the predefined UCS2 horizontal CMap families (UniGB/UniCNS/UniJIS/
  *     UniKS-UCS2-H, the common CJK crawl shape) decode without a
  *     ToUnicode map because their 2-byte codes ARE UCS-2 code points,
  *     and the UTF16 horizontal families decode their codes as UTF-16BE
  *     code units (surrogate pairs reassemble supplementary characters).
  *
  * Out of scope (fail loudly, contained as per-row failure rows):
  * image/codec filters (DCTDecode, JBIG2Decode, JPXDecode, CCITTFaxDecode),
  * TIFF predictor 2, predefined-CMap /Type0 encodings beyond Identity-H and
  * the UCS2 horizontal families, and Identity-H composite fonts WITHOUT a
  * ToUnicode map (their strings are opaque glyph ids: refusing loudly beats
  * emitting garbage for the quality gate to catch). Encrypted documents:
  * the standard security handler with an EMPTY user password (RC4-40/128
  * and AES-128, the dominant crawled "encrypted" shape — owner-password-
  * only files every real-world extractor opens) decrypts transparently;
  * a real user password, a non-Standard handler, or /V 5+ (AES-256)
  * stays a loud refusal.
  */
object PdfContainer {

  // ---- tokens / objects -----------------------------------------------------

  sealed trait Obj
  case object PNull extends Obj
  final case class PBool(v: Boolean) extends Obj
  final case class PNum(v: Double) extends Obj { def toInt: Int = v.toInt }
  final case class PStr(bytes: Array[Byte]) extends Obj
  final case class PName(v: String) extends Obj
  final case class PArr(v: Vector[Obj]) extends Obj
  final case class PDict(v: Map[String, Obj]) extends Obj {
    def get(k: String): Option[Obj] = v.get(k)
  }
  final case class PRef(num: Int, gen: Int) extends Obj
  final case class PStream(dict: PDict, raw: Array[Byte]) extends Obj

  final case class PdfError(reason: String) extends Exception(reason)

  private def isWs(b: Byte): Boolean =
    b == 0x00 || b == 0x09 || b == 0x0a || b == 0x0c || b == 0x0d || b == 0x20
  private def isDelim(b: Byte): Boolean =
    b == '(' || b == ')' || b == '<' || b == '>' || b == '[' || b == ']' ||
      b == '{' || b == '}' || b == '/' || b == '%'

  /** Byte-level lexer/parser with a cursor; one instance per document or
    * content stream.
    */
  private final class Lexer(val buf: Array[Byte], var pos: Int) {
    def atEnd: Boolean = pos >= buf.length
    def peek: Byte = buf(pos)

    def skipWs(): Unit = {
      var go = true
      while (go && !atEnd) {
        if (isWs(buf(pos))) pos += 1
        else if (buf(pos) == '%') { // comment to EOL
          while (!atEnd && buf(pos) != '\n' && buf(pos) != '\r') pos += 1
        } else go = false
      }
    }

    def token(): String = {
      skipWs()
      if (atEnd) throw PdfError("eof")
      val b = buf(pos)
      if (isDelim(b)) {
        if (b == '<' && pos + 1 < buf.length && buf(pos + 1) == '<') { pos += 2; "<<" }
        else if (b == '>' && pos + 1 < buf.length && buf(pos + 1) == '>') { pos += 2; ">>" }
        else { pos += 1; b.toChar.toString }
      } else {
        val start = pos
        while (!atEnd && !isWs(buf(pos)) && !isDelim(buf(pos))) pos += 1
        new String(buf, start, pos - start, StandardCharsets.US_ASCII)
      }
    }

    def peekToken(): String = { val p = pos; val t = token(); pos = p; t }

    /** One object at the cursor. `resolveLen` resolves an indirect /Length
      * when reading a stream body (null in content-stream context, where
      * streams cannot occur).
      */
    def obj(resolveLen: PRef => Obj): Obj = {
      val t = token()
      t match {
        case "<<" =>
          val m = Map.newBuilder[String, Obj]
          var done = false
          while (!done) {
            skipWs()
            if (peekToken() == ">>") { token(); done = true }
            else {
              val k = obj(resolveLen) match {
                case PName(n) => n
                case other    => throw PdfError(s"dict_key_not_name:$other")
              }
              m += k -> obj(resolveLen)
            }
          }
          val dict = PDict(m.result())
          // stream?
          skipWs()
          val save = pos
          if (!atEnd && peekToken() == "stream") {
            token()
            // EOL after `stream`: CRLF or LF
            if (!atEnd && buf(pos) == '\r') pos += 1
            if (!atEnd && buf(pos) == '\n') pos += 1
            val len = dict.get("Length") match {
              case Some(PNum(n)) => n.toInt
              case Some(r: PRef) =>
                if (resolveLen == null) throw PdfError("indirect_length_in_content")
                resolveLen(r) match {
                  case PNum(n) => n.toInt
                  case other   => throw PdfError(s"bad_indirect_length:$other")
                }
              case other => throw PdfError(s"missing_stream_length:$other")
            }
            if (len < 0 || pos + len > buf.length) throw PdfError("stream_overruns_buffer")
            val raw = java.util.Arrays.copyOfRange(buf, pos, pos + len)
            pos += len
            skipWs()
            val end = token()
            if (end != "endstream") throw PdfError(s"missing_endstream:$end")
            PStream(dict, raw)
          } else { pos = save; dict }
        case "[" =>
          val items = Vector.newBuilder[Obj]
          var done = false
          while (!done) {
            skipWs()
            if (peekToken() == "]") { token(); done = true }
            else items += obj(resolveLen)
          }
          PArr(items.result())
        case "/" =>
          // name: chars follow the solidus immediately (no ws skip)
          val start = pos
          while (!atEnd && !isWs(buf(pos)) && !isDelim(buf(pos))) pos += 1
          PName(decodeName(new String(buf, start, pos - start, StandardCharsets.US_ASCII)))
        case "(" => PStr(literalString())
        case "<" => PStr(hexString())
        case "true"  => PBool(true)
        case "false" => PBool(false)
        case "null"  => PNull
        case num if num.nonEmpty && (num.charAt(0).isDigit || num.charAt(0) == '+' || num.charAt(0) == '-' || num.charAt(0) == '.') =>
          // `N G R` indirect reference lookahead
          val save = pos
          if (isIntToken(num)) {
            try {
              val t2 = token()
              if (isIntToken(t2) && peekToken() == "R") {
                token()
                return PRef(num.toInt, t2.toInt)
              }
            } catch { case PdfError(_) => () }
            pos = save
          }
          PNum(java.lang.Double.parseDouble(num))
        case other => throw PdfError(s"unexpected_token:$other")
      }
    }

    private def isIntToken(s: String): Boolean =
      s.nonEmpty && s.forall(_.isDigit)

    private def decodeName(s: String): String = {
      if (!s.contains('#')) return s
      val sb = new StringBuilder
      var i = 0
      while (i < s.length) {
        if (s.charAt(i) == '#' && i + 2 < s.length) {
          sb.append(Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar)
          i += 3
        } else { sb.append(s.charAt(i)); i += 1 }
      }
      sb.toString
    }

    /** Literal string: cursor is just past `(`. Balanced parens, escapes,
      * octal, line continuations (ISO 32000-1 §7.3.4.2).
      */
    private def literalString(): Array[Byte] = {
      val out = mutable.ArrayBuilder.make[Byte]
      var depth = 1
      while (depth > 0) {
        if (atEnd) throw PdfError("unterminated_string")
        val b = buf(pos); pos += 1
        b match {
          case '(' => depth += 1; out += b
          case ')' => depth -= 1; if (depth > 0) out += b
          case '\\' =>
            if (atEnd) throw PdfError("unterminated_escape")
            val e = buf(pos); pos += 1
            e match {
              case 'n' => out += '\n'.toByte
              case 'r' => out += '\r'.toByte
              case 't' => out += '\t'.toByte
              case 'b' => out += '\b'.toByte
              case 'f' => out += '\f'.toByte
              case '(' | ')' | '\\' => out += e
              case '\r' => if (!atEnd && buf(pos) == '\n') pos += 1 // continuation
              case '\n' => () // continuation
              case d if d >= '0' && d <= '7' =>
                var v = d - '0'
                var k = 0
                while (k < 2 && !atEnd && buf(pos) >= '0' && buf(pos) <= '7') {
                  v = v * 8 + (buf(pos) - '0'); pos += 1; k += 1
                }
                out += v.toByte
              case other => out += other // spec: backslash ignored
            }
          case _ => out += b
        }
      }
      out.result()
    }

    /** Hex string: cursor just past `<`. Whitespace allowed; odd final digit
      * pads with 0.
      */
    private def hexString(): Array[Byte] = {
      val out = mutable.ArrayBuilder.make[Byte]
      var hi = -1
      var done = false
      while (!done) {
        if (atEnd) throw PdfError("unterminated_hex_string")
        val b = buf(pos); pos += 1
        if (b == '>') {
          if (hi >= 0) out += (hi << 4).toByte
          done = true
        } else if (!isWs(b)) {
          val v = Character.digit(b.toChar, 16)
          if (v < 0) throw PdfError(s"bad_hex_digit:${b.toChar}")
          if (hi < 0) hi = v
          else { out += ((hi << 4) | v).toByte; hi = -1 }
        }
      }
      out.result()
    }
  }

  // ---- document -------------------------------------------------------------

  /** Where an object lives: at a byte offset, or inside an object stream. */
  private sealed trait Loc
  private final case class AtOffset(off: Int) extends Loc
  private final case class InObjStm(stm: Int, idx: Int) extends Loc

  /** An authenticated standard-security-handler decryptor: the file key
    * plus per-class (stream/string) cipher selection — AES CBC, RC4, or
    * identity — and the /Encrypt object number (itself never decrypted).
    * `v5` selects the AES-256 object-key rule: the 32-byte file key is used
    * DIRECTLY for every object (ISO 32000-2 §7.6.3.2 — no per-object MD5
    * derivation, which only exists for /V <= 4).
    */
  private final case class Crypt(
      key: Array[Byte],
      aesStreams: Boolean,
      aesStrings: Boolean,
      identStreams: Boolean,
      identStrings: Boolean,
      encryptMetadata: Boolean,
      encObjNum: Int,
      v5: Boolean = false)

  /** (aes, identity) per CFM name legal under /V 4 and /V 5. Object-level
    * on purpose: `installPendingCrypt()` runs in Doc's CONSTRUCTOR, before
    * any Doc-level val would be initialized (a member here would be null
    * during the install and turn every V4/V5 document into a refusal).
    */
  private val V4Cfms: Map[String, (Boolean, Boolean)] =
    Map("V2" -> (false, false), "AESV2" -> (true, false), "None" -> (false, true))
  private val V5Cfms: Map[String, (Boolean, Boolean)] =
    Map("AESV3" -> (true, false), "None" -> (false, true))

  private final class Doc(buf: Array[Byte]) {
    private var rootRef: Option[PRef] = None
    // (Encrypt entry, first /ID bytes) captured from the NEWEST trailer
    // that carries one — declared before `offsets` because xrefOffsets()
    // (run in the initializer below) is what populates it
    private var encryptSrc: Option[(Obj, Array[Byte])] = None
    private val offsets: Map[Int, Loc] = xrefOffsets()
    private val cache = mutable.Map.empty[Int, Obj]
    private val objStmInProgress = mutable.Set.empty[Int]
    private var crypt: Option[Crypt] = None

    /** Record a trailer's /Encrypt (+ same-trailer /ID) — newest wins,
      * mirroring /Root capture; the xref chain walks newest-first.
      */
    private def noteEncrypt(trailerDict: PDict): Unit =
      if (encryptSrc.isEmpty) trailerDict.get("Encrypt").foreach { e =>
        val id0 = trailerDict.get("ID") match {
          case Some(PArr(items)) if items.nonEmpty =>
            items.head match {
              case PStr(b) => b
              case _       => Array.emptyByteArray
            }
          case _ => Array.emptyByteArray
        }
        encryptSrc = Some((e, id0))
      }

    /** Build + install the decryptor from a captured /Encrypt entry. The
      * Encrypt dict resolves WITHOUT decryption (crypt is still None here —
      * its /O and /U strings are never encrypted, ISO 32000-1 §7.6.2), and
      * the object cache is cleared afterwards so nothing resolved
      * pre-install leaks through undecrypted. A real user password or an
      * unsupported scheme throws — the pre-round-6 loud refusal, now fired
      * only when transparent decryption is impossible.
      */
    private def installPendingCrypt(): Unit = encryptSrc match {
      case Some((e, id0)) if crypt.isEmpty =>
        val built =
          try {
            val encDict = resolve(e) match {
              case d: PDict => d
              case other    => throw PdfError(s"encrypted_bad_dict:$other")
            }
            val encNum = e match {
              case PRef(n, _) => n
              case _          => -1
            }
            buildCrypt(encDict, id0, encNum)
          } catch {
            case ex: graft.util.StepBudget.Exceeded              => throw ex
            case ex: PdfError if ex.reason.startsWith("encrypted") => throw ex
            // an unresolvable or garbage /Encrypt dict: decryption is
            // impossible — the classic loud refusal, not a parse error
            // the lenient paths would swallow
            case _: Exception => throw PdfError("encrypted_document")
          }
        cache.clear()
        crypt = Some(built)
      case _ => ()
    }
    // constructor-time install: a healthy xref chain captures /Encrypt
    // during xrefOffsets() above; scan-mode documents capture it later
    // (trailerRoot) and install there
    installPendingCrypt()

    /** Resolve a /StmF //StrF crypt-filter name to its (aes, identity)
      * method through the /CF dictionary, accepting only the CFM set
      * legal for the document's /V; anything else is loud — guessing the
      * cipher would silently corrupt every stream.
      */
    private def cryptMethodOf(
        cf: PDict,
        cfms: Map[String, (Boolean, Boolean)],
        filterName: String): (Boolean, Boolean) =
      filterName match {
        case "Identity" => (false, true)
        case fn =>
          resolve(cf.get(fn).getOrElse(PNull)) match {
            case fd: PDict =>
              resolve(fd.get("CFM").getOrElse(PNull)) match {
                case PName(m) if cfms.contains(m) => cfms(m)
                case other =>
                  throw PdfError(s"encrypted_unsupported_cfm:$other")
              }
            case _ => throw PdfError(s"encrypted_missing_crypt_filter:$fn")
          }
      }

    /** Parse the /Encrypt dict into a decryptor (ISO 32000-1 §7.6.3) and
      * authenticate the EMPTY user password — the owner-password-only shape
      * that dominates crawled "encrypted" PDFs. Supported: /Filter
      * /Standard, /V 1/2 (RC4 40-128) with /R 2/3, /V 4 with /R 4 and
      * /CFM /V2 (RC4) / /AESV2 (AES-128-CBC) / /None, and /V 5 with
      * /R 5/6 and /CFM /AESV3 (AES-256-CBC, the modern default). Anything
      * else — including a document whose user password is NOT empty — is
      * loud.
      */
    private def buildCrypt(d: PDict, id0: Array[Byte], encNum: Int): Crypt = {
      def nameOf(k: String): Option[String] =
        resolve(d.get(k).getOrElse(PNull)) match {
          case PName(n) => Some(n)
          case _        => None
        }
      def intOf(k: String, dflt: Int): Int =
        resolve(d.get(k).getOrElse(PNull)) match {
          // some writers emit /P as the unsigned 2^32 complement: the
          // toLong.toInt wrap recovers the signed 32-bit value the key
          // derivation hashes
          case PNum(v) => v.toLong.toInt
          case _       => dflt
        }
      def strOf(k: String): Array[Byte] =
        resolve(d.get(k).getOrElse(PNull)) match {
          case PStr(b) => b
          case other   => throw PdfError(s"encrypted_bad_$k:$other")
        }
      if (!nameOf("Filter").contains("Standard"))
        throw PdfError(
          s"encrypted_unsupported_handler:${nameOf("Filter").getOrElse("?")}")
      val v = intOf("V", 0)
      val r = intOf("R", 0)
      val o = strOf("O")
      val u = strOf("U")
      val p = intOf("P", -1)
      val encryptMetadata =
        resolve(d.get("EncryptMetadata").getOrElse(PNull)) match {
          case PBool(b) => b
          case _        => true
        }
      def authenticate(keyLen: Int): Array[Byte] = {
        val key = PdfCrypto.computeKey(
          Array.emptyByteArray, o, p, id0, r, keyLen, encryptMetadata)
        // U mismatch = the user password is real (not empty): the document
        // is genuinely locked — the classic loud refusal
        if (!PdfCrypto.verifyU(key, id0, r, u))
          throw PdfError("encrypted_document")
        key
      }
      v match {
        case 1 | 2 =>
          if (r != 2 && r != 3)
            throw PdfError(s"encrypted_unsupported_revision:$r")
          val bits = if (v == 1) 40 else intOf("Length", 40)
          if (bits < 40 || bits > 128 || bits % 8 != 0)
            throw PdfError(s"encrypted_bad_length:$bits")
          val key = authenticate(bits / 8)
          Crypt(key, aesStreams = false, aesStrings = false,
            identStreams = false, identStrings = false, encryptMetadata, encNum)
        case 4 =>
          if (r != 4) throw PdfError(s"encrypted_unsupported_revision:$r")
          val bits = intOf("Length", 128)
          if (bits < 40 || bits > 128 || bits % 8 != 0)
            throw PdfError(s"encrypted_bad_length:$bits")
          val cf = resolve(d.get("CF").getOrElse(PNull)) match {
            case cd: PDict => cd
            case _         => PDict(Map.empty)
          }
          // per-CF /Length is redundant with the top-level /Length for
          // the supported CFMs (AESV2 is fixed 16-byte) and is ignored
          val (stmAes, stmIdent) = cryptMethodOf(cf, V4Cfms, nameOf("StmF").getOrElse("Identity"))
          val (strAes, strIdent) = cryptMethodOf(cf, V4Cfms, nameOf("StrF").getOrElse("Identity"))
          val key = authenticate(bits / 8)
          Crypt(key, stmAes, strAes, stmIdent, strIdent, encryptMetadata, encNum)
        case 5 =>
          // AES-256 (ISO 32000-2 §7.6.4): /R 5 is the deprecated Acrobat-9
          // single-SHA-256 revision, /R 6 the hardened-hash standard one
          if (r != 5 && r != 6)
            throw PdfError(s"encrypted_unsupported_revision:$r")
          val ue = strOf("UE")
          val cf = resolve(d.get("CF").getOrElse(PNull)) match {
            case cd: PDict => cd
            case _         => PDict(Map.empty)
          }
          // only /AESV3 (and explicit identity) are legal under /V 5; a
          // V2/AESV2 method here means a confused writer — loud, since
          // guessing the cipher silently corrupts every stream
          val (stmAes, stmIdent) = cryptMethodOf(cf, V5Cfms, nameOf("StmF").getOrElse("Identity"))
          val (strAes, strIdent) = cryptMethodOf(cf, V5Cfms, nameOf("StrF").getOrElse("Identity"))
          // authenticate the EMPTY user password and unwrap the file key
          // from /UE; a hash mismatch = a real user password = locked
          val key = PdfCrypto
            .recoverKeyV5(r, Array.emptyByteArray, u, ue)
            .getOrElse(throw PdfError("encrypted_document"))
          // /Perms carries an "adb" sentinel decryptable only by the true
          // file key — a well-formed 16-byte blob that fails it means /UE
          // is corrupt and every "decrypted" byte downstream would be
          // garbage. A WRONG-LENGTH /Perms is a broken writer, not a
          // wrong key (the /U hash already authenticated): treat it like
          // the absent case, as the reference extractors do, instead of
          // refusing a document they all open.
          resolve(d.get("Perms").getOrElse(PNull)) match {
            case PStr(perms) if perms.length == 16 =>
              if (!PdfCrypto.checkPermsV5(key, perms))
                throw PdfError("encrypted_bad_perms")
            case _ => () // absent (or malformed-length): skip the check
          }
          Crypt(key, stmAes, strAes, stmIdent, strIdent, encryptMetadata, encNum, v5 = true)
        case other =>
          // exotic /V values stay out of subset
          throw PdfError(s"encrypted_unsupported_v:$other")
      }
    }

    /** Decrypt every string and stream of a freshly parsed top-level object
      * (ISO 32000-1 §7.6.2): no-op without an installed crypt, for the
      * /Encrypt dict itself, and for never-encrypted stream classes (xref
      * streams always; /Type /Metadata when /EncryptMetadata false).
      * Objects unpacked from an ObjStm are NOT run through this — the
      * ObjStm itself was decrypted as a stream and its members' strings are
      * not encrypted individually (§7.5.7).
      */
    private def decryptObj(num: Int, gen: Int, o: Obj): Obj = crypt match {
      case Some(c) if num != c.encObjNum => decryptTree(c, num, gen, o)
      case _                             => o
    }

    private def decryptTree(c: Crypt, num: Int, gen: Int, o: Obj): Obj = o match {
      case PStr(b) =>
        // zero-length literal strings `()` are routinely left unencrypted
        // by sloppy writers (an encrypted empty string would be a 32-byte
        // AES ciphertext); refusing the whole document over one harmless
        // empty string would fail files every real extractor opens
        if (c.identStrings || b.isEmpty) o
        else if (c.aesStrings)
          PStr(PdfCrypto.aesDecrypt(aesKeyOf(c, num, gen), b))
        else PStr(PdfCrypto.rc4(PdfCrypto.objectKey(c.key, num, gen, aes = false), b))
      case PArr(v)  => PArr(v.map(decryptTree(c, num, gen, _)))
      case PDict(m) => PDict(m.map { case (k, vv) => k -> decryptTree(c, num, gen, vv) })
      case PStream(dict, raw) =>
        if (dict.get("Type").contains(PName("XRef"))) o // never encrypted (incl. its /ID)
        else if (!c.encryptMetadata && dict.get("Type").contains(PName("Metadata"))) o
        else {
          graft.util.StepBudget.tick(math.max(1L, raw.length.toLong))
          val ndict = PDict(dict.v.map { case (k, vv) => k -> decryptTree(c, num, gen, vv) })
          val nraw =
            if (c.identStreams) raw
            else if (c.aesStreams)
              PdfCrypto.aesDecrypt(aesKeyOf(c, num, gen), raw)
            else PdfCrypto.rc4(PdfCrypto.objectKey(c.key, num, gen, aes = false), raw)
          PStream(ndict, nraw)
        }
      case other => other
    }

    /** The AES key for one object (strings AND streams — for V<=4 the
      * two AES object keys are identical): V5 uses the file key directly
      * (no per-object derivation exists for AES-256); V<=4 derives the
      * MD5 object key with the AES salt.
      */
    private def aesKeyOf(c: Crypt, num: Int, gen: Int): Array[Byte] =
      if (c.v5) c.key else PdfCrypto.objectKey(c.key, num, gen, aes = true)

    /** Object locations from the cross-reference chain — classic `xref`
      * tables AND PDF 1.5+ xref STREAMS (the modern default), mixed freely
      * along the /Prev chain as incremental updates do. On ANY structural
      * failure, fall back to a linear `N G obj` scan (lenient crawled-PDF
      * discipline; the offsets in a truncated incremental update are often
      * still intact in the body).
      */
    private def xrefOffsets(): Map[Int, Loc] =
      try xrefChain()
      catch {
        // the row work budget must propagate (B3) — falling back to a
        // whole-buffer regex scan with the budget already exhausted would
        // be unbounded extra work exactly when containment should stop it
        case e: graft.util.StepBudget.Exceeded => throw e
        // an encryption-family error is a REFUSAL (real user password,
        // unsupported scheme), not a structural failure: the lenient scan
        // would "recover" the objects and then decode RC4/AES bytes as
        // silent garbage
        case e: PdfError if e.reason.startsWith("encrypted") => throw e
        case _: Exception                                    => scanOffsets()
      }

    private def xrefChain(): Map[Int, Loc] = {
      val tail = new String(
        buf,
        math.max(0, buf.length - 256),
        math.min(256, buf.length),
        StandardCharsets.US_ASCII)
      val ix = tail.lastIndexOf("startxref")
      if (ix < 0) throw PdfError("no_startxref")
      val after = tail.substring(ix + "startxref".length).trim
      val off = after.takeWhile(_.isDigit)
      if (off.isEmpty) throw PdfError("bad_startxref")
      val out = mutable.Map.empty[Int, Loc]
      // tombstones: an object marked FREE in a newer section must not be
      // resurrected by a stale 'n' entry from an older /Prev section
      // (ISO 32000-1 §7.5.4 — newest update wins, including deletions)
      val dead = mutable.Set.empty[Int]
      var next = off.toInt
      val seen = mutable.Set.empty[Int]
      while (next >= 0) {
        if (next >= buf.length || !seen.add(next)) throw PdfError("bad_xref_offset")
        val lx = new Lexer(buf, next)
        val trailerDict =
          if (lx.peekToken() == "xref") {
            // HYBRID-reference support: a classic trailer may carry
            // /XRefStm pointing at the xref stream that holds this
            // update's type-2 (ObjStm) entries, while the classic table
            // marks those objects free for pre-1.5 readers. The stream's
            // entries take precedence over the classic section's, so the
            // classic entries are collected locally, the stream applied
            // globally FIRST, then the classic leftovers merged.
            val localOut = mutable.Map.empty[Int, Loc]
            val localDead = mutable.Set.empty[Int]
            val t = classicSection(lx, localOut, localDead)
            t.get("XRefStm") match {
              case Some(PNum(so)) =>
                val sx = new Lexer(buf, so.toInt)
                xrefStreamSection(sx, out, dead)
                ()
              case _ => ()
            }
            localOut.foreach { case (num, loc) =>
              if (!out.contains(num) && !dead.contains(num)) out(num) = loc
            }
            localDead.foreach { num =>
              if (!out.contains(num) && !dead.contains(num)) dead += num
            }
            t
          } else xrefStreamSection(lx, out, dead)
        if (rootRef.isEmpty) trailerDict.get("Root") match {
          case Some(r: PRef) => rootRef = Some(r)
          case _             => ()
        }
        // an /Encrypt trailer entry means strings and streams are
        // RC4/AES-encrypted: capture it (with the same trailer's /ID) so
        // the constructor can authenticate the empty user password and
        // decrypt transparently — or refuse loudly when it can't
        noteEncrypt(trailerDict)
        next = trailerDict.get("Prev") match {
          case Some(PNum(p)) => p.toInt
          case _             => -1
        }
      }
      if (out.isEmpty) throw PdfError("empty_xref")
      out.toMap
    }

    /** One classic `xref` section at the lexer; returns the trailer dict. */
    private def classicSection(
        lx: Lexer,
        out: mutable.Map[Int, Loc],
        dead: mutable.Set[Int]): PDict = {
      if (lx.token() != "xref") throw PdfError("not_a_classic_xref")
      var trailerDict: PDict = null
      while (trailerDict == null) {
        val t = lx.token()
        if (t == "trailer") {
          trailerDict = lx.obj(null) match {
            case d: PDict => d
            case other    => throw PdfError(s"bad_trailer:$other")
          }
        } else {
          val start = t.toInt
          val count = lx.token().toInt
          var i = 0
          while (i < count) {
            val num = start + i
            val o = lx.token().toInt
            val _gen = lx.token().toInt
            val kind = lx.token()
            // earlier (later-applied) xref sections win: only add if the
            // number is neither resolved nor tombstoned yet
            if (!out.contains(num) && !dead.contains(num)) {
              if (kind == "n") out(num) = AtOffset(o) else dead += num
            }
            i += 1
          }
        }
      }
      trailerDict
    }

    /** One PDF 1.5 xref STREAM at the lexer: an indirect stream object with
      * /Type /XRef whose data is fixed-width binary rows (/W widths,
      * /Index subsections, optional PNG predictor via /DecodeParms).
      * Entry types: 0 free (tombstone), 1 at-offset, 2 in-object-stream.
      * Returns the stream dict (it carries the trailer fields). The stream
      * is the BOOTSTRAP — its own /Length must be direct (no offsets map
      * exists yet to resolve an indirect one).
      */
    private def xrefStreamSection(
        lx: Lexer,
        out: mutable.Map[Int, Loc],
        dead: mutable.Set[Int]): PDict = {
      val n = lx.token(); val g = lx.token(); val kw = lx.token()
      if (!n.forall(_.isDigit) || !g.forall(_.isDigit) || kw != "obj")
        throw PdfError("not_an_xref_stream")
      val stream = lx.obj(_ => throw PdfError("indirect_length_in_xref_stream")) match {
        case s: PStream => s
        case other      => throw PdfError(s"xref_stream_not_a_stream:$other")
      }
      if (!stream.dict.get("Type").contains(PName("XRef")))
        throw PdfError("xref_stream_wrong_type")
      val data = decodeStream(stream.dict, stream.raw, identity)
      val w = stream.dict.get("W") match {
        case Some(PArr(Vector(PNum(a), PNum(b), PNum(c)))) => (a.toInt, b.toInt, c.toInt)
        case other => throw PdfError(s"bad_xref_w:$other")
      }
      val size = stream.dict.get("Size") match {
        case Some(PNum(s)) => s.toInt
        case other         => throw PdfError(s"bad_xref_size:$other")
      }
      val index: Vector[(Int, Int)] = stream.dict.get("Index") match {
        case Some(PArr(v)) =>
          v.grouped(2).map {
            case Vector(PNum(s), PNum(c)) => (s.toInt, c.toInt)
            case other                    => throw PdfError(s"bad_xref_index:$other")
          }.toVector
        case None    => Vector((0, size))
        case other   => throw PdfError(s"bad_xref_index:$other")
      }
      val rowW = w._1 + w._2 + w._3
      if (rowW <= 0 || rowW > 32) throw PdfError("bad_xref_row_width")
      var p = 0
      def field(width: Int, default: Long): Long = {
        if (width == 0) return default
        var v = 0L
        var k = 0
        while (k < width) { v = (v << 8) | (data(p) & 0xffL); p += 1; k += 1 }
        v
      }
      index.foreach { case (start, count) =>
        var i = 0
        while (i < count) {
          if (p + rowW > data.length) throw PdfError("xref_stream_truncated")
          val num = start + i
          val tpe = field(w._1, 1L) // absent type field defaults to 1
          val f2 = field(w._2, 0L)
          val f3 = field(w._3, 0L)
          if (!out.contains(num) && !dead.contains(num)) {
            tpe match {
              case 0 => dead += num
              case 1 => out(num) = AtOffset(f2.toInt)
              case 2 => out(num) = InObjStm(f2.toInt, f3.toInt)
              // spec (§7.5.8.3): unknown types read as the NULL object —
              // they must SHADOW older /Prev entries like a tombstone,
              // not fall through and let a superseded version win
              case _ => dead += num
            }
          }
          i += 1
        }
      }
      stream.dict
    }

    /** Fallback: find every `N G obj` header in the body. First match per
      * object number wins — a later line-anchored `N G obj` byte pattern
      * INSIDE a compressed stream must not hijack the genuine object's
      * offset (the genuine header precedes its own stream data; a stream
      * earlier in the file shadowing a later object is the residual risk,
      * and resolving it fails loudly rather than silently).
      */
    private def scanOffsets(): Map[Int, Loc] = {
      val out = mutable.Map.empty[Int, Loc]
      val s = new String(buf, StandardCharsets.ISO_8859_1)
      val m = java.util.regex.Pattern
        .compile("(?m)^(\\d+)\\s+(\\d+)\\s+obj\\b")
        .matcher(s)
      while (m.find()) {
        val num = m.group(1).toInt
        if (!out.contains(num)) out(num) = AtOffset(m.start())
      }
      if (out.isEmpty) throw PdfError("no_objects_found")
      out.toMap
    }

    def resolve(o: Obj): Obj = o match {
      case PRef(num, _) =>
        cache.getOrElseUpdate(
          num,
          offsets.getOrElse(num, throw PdfError(s"missing_object:$num")) match {
            case AtOffset(off) =>
              val lx = new Lexer(buf, off)
              val n = lx.token(); val g = lx.token(); val kw = lx.token()
              if (!n.forall(_.isDigit) || !g.forall(_.isDigit) || kw != "obj")
                throw PdfError(s"bad_object_header:$num")
              decryptObj(num, g.toInt, lx.obj(r => resolve(r)))
            case InObjStm(stm, idx) =>
              loadObjStm(stm)
              cache.getOrElse(num, throw PdfError(s"objstm_$stm:missing_idx_$idx"))
          })
      case other => other
    }

    /** Decode one /Type /ObjStm and cache EVERY object it holds: a header
      * of /N (objnum, byte-offset) integer pairs, then the objects packed
      * at /First + offset. Per spec an ObjStm cannot live inside another
      * ObjStm — the in-progress guard turns such a cycle into a loud error
      * instead of infinite recursion.
      */
    private def loadObjStm(stm: Int): Unit = {
      if (cache.contains(-stm)) return // sentinel: stream already unpacked
      if (!objStmInProgress.add(stm)) throw PdfError(s"objstm_cycle:$stm")
      try {
        val s = resolve(PRef(stm, 0)) match {
          case st: PStream => st
          case other       => throw PdfError(s"objstm_not_a_stream:$other")
        }
        if (!s.dict.get("Type").contains(PName("ObjStm")))
          throw PdfError("objstm_wrong_type")
        val data = decodeStream(s.dict, s.raw, resolve)
        graft.util.StepBudget.tick(data.length.toLong)
        val n = s.dict.get("N") match {
          case Some(PNum(v)) => v.toInt
          case other         => throw PdfError(s"bad_objstm_n:$other")
        }
        val first = s.dict.get("First") match {
          case Some(PNum(v)) => v.toInt
          case other         => throw PdfError(s"bad_objstm_first:$other")
        }
        val hx = new Lexer(data, 0)
        val pairs = (0 until n).map { _ =>
          val num = hx.token().toInt
          val off = hx.token().toInt
          (num, off)
        }
        pairs.foreach { case (num, off) =>
          if (first + off < 0 || first + off >= data.length)
            throw PdfError(s"objstm_offset_out_of_range:$num")
          // only cache objects the CURRENT xref actually maps into this
          // stream: an incremental update may have rewritten (or freed) a
          // number that an older ObjStm still packs, and `resolve` checks
          // the cache before the xref map — unconditional caching would
          // let the stale packed copy shadow the newer version
          val mappedHere = offsets.get(num).exists {
            case InObjStm(s2, _) => s2 == stm
            case _               => false
          }
          if (mappedHere) {
            val ox = new Lexer(data, first + off)
            // objects inside an ObjStm are direct (no header, no streams)
            cache.getOrElseUpdate(num, ox.obj(r => resolve(r)))
            ()
          }
        }
        cache(-stm) = PNull // unpacked marker
      } finally { objStmInProgress -= stm; () }
    }

    def trailerRoot(): PDict = {
      // root discovery, strongest first: the /Root captured from the xref
      // chain (classic trailer or xref-stream dict); a literal `trailer`
      // token near EOF; the first object whose /Type is /Catalog (scan
      // mode has neither)
      val viaChain = rootRef.flatMap(r =>
        try resolve(r) match {
          case c: PDict => Some(c)
          case _        => None
        } catch {
          case e: graft.util.StepBudget.Exceeded => throw e
          case _: Exception                      => None
        })
      val viaTrailer = viaChain.orElse {
        try {
          val tail = new String(
            buf,
            math.max(0, buf.length - 2048),
            math.min(2048, buf.length),
            StandardCharsets.ISO_8859_1)
          val ti = tail.lastIndexOf("trailer")
          if (ti < 0) None
          else {
            val lx = new Lexer(buf, math.max(0, buf.length - 2048) + ti)
            lx.token() // "trailer"
            lx.obj(r => resolve(r)) match {
              case d: PDict =>
                // scan-mode reaches here when the xref chain was broken:
                // encryption must still be handled (see xrefOffsets) — a
                // late install decrypts transparently or refuses loudly
                noteEncrypt(d)
                installPendingCrypt()
                d.get("Root").map(r =>
                  resolve(r) match {
                    case c: PDict => c
                    case other    => throw PdfError(s"bad_catalog:$other")
                  })
              case _ => None
            }
          }
        } catch {
          case e: graft.util.StepBudget.Exceeded          => throw e
          case e: PdfError if e.reason.startsWith("encrypted") => throw e
          case _: Exception                               => None
        }
      }
      viaTrailer.getOrElse {
        // full catalog scan — the last-resort path for files whose xref
        // chain AND near-EOF trailer are both gone. An encrypted MODERN
        // pdf carries its /Encrypt in the xref-STREAM dict (no classic
        // 'trailer' keyword exists), which body-scan recovery sees as an
        // ordinary /Type /XRef object: the refusal must fire here too,
        // BEFORE a plaintext catalog lets extraction decode encrypted
        // streams as garbage (review finding)
        val nums = offsets.keys.toSeq.filter(_ >= 0).sorted
        // The refusal pass resolves only /XRef CANDIDATES found by a cheap
        // byte peek over each object's region — strictly resolving every
        // body-scanned object up front parsed the whole document where the
        // pre-refusal path stopped at the first Catalog. A false positive
        // (the bytes "/XRef" inside an unrelated stream body) costs one
        // extra resolve; false negatives are impossible because an xref
        // stream's dict precedes its data inside its own region.
        val regions: Seq[(Int, Int, Int)] = { // (num, start, end)
          val byOff = nums
            .flatMap(n => offsets(n) match {
              case AtOffset(o) => Some((n, o))
              case _           => None // ObjStm members can't be XRef streams
            })
            .sortBy(_._2)
          byOff.zip(byOff.drop(1).map(_._2) :+ buf.length).map {
            case ((n, o), end) => (n, o, end)
          }
        }
        val xrefPat = "/XRef".getBytes(StandardCharsets.US_ASCII)
        def regionHasXref(start: Int, end: Int): Boolean = {
          var i = start
          val last = end - xrefPat.length
          while (i <= last) {
            var k = 0
            while (k < xrefPat.length && buf(i + k) == xrefPat(k)) k += 1
            if (k == xrefPat.length) return true
            i += 1
          }
          false
        }
        regions.foreach { case (n, start, end) =>
          if (regionHasXref(start, end)) {
            graft.util.StepBudget.tick(math.max(1L, (end - start).toLong))
            val o =
              try resolve(PRef(n, 0))
              catch {
                case e: graft.util.StepBudget.Exceeded => throw e
                case _: Exception                      => PNull
              }
            o match {
              case PStream(d, _)
                  if d.get("Type").contains(PName("XRef")) &&
                    d.get("Encrypt").isDefined =>
                // the xref-stream dict doubles as the trailer: it carries
                // /Encrypt AND /ID — install (or refuse) before any
                // catalog resolution decodes encrypted streams as garbage
                noteEncrypt(d)
                installPendingCrypt()
              case d: PDict
                  if d.get("Type").contains(PName("XRef")) &&
                    d.get("Encrypt").isDefined =>
                noteEncrypt(d)
                installPendingCrypt()
              case _ => ()
            }
          }
        }
        nums.iterator
          .map(n =>
            try resolve(PRef(n, 0))
            catch {
              case e: graft.util.StepBudget.Exceeded => throw e
              case _: Exception                      => PNull
            })
          .collectFirst {
            case d: PDict if d.get("Type").contains(PName("Catalog")) => d
          }
          .getOrElse(throw PdfError("no_catalog"))
      }
    }

    /** Page dicts in document order via the /Kids tree (cycle-guarded). */
    def pages(): Vector[(PDict, PDict)] = { // (pageDict, inheritedAttrs)
      val root = trailerRoot()
      val top = resolve(root.get("Pages").getOrElse(throw PdfError("no_pages"))) match {
        case d: PDict => d
        case other    => throw PdfError(s"bad_pages:$other")
      }
      val out = Vector.newBuilder[(PDict, PDict)]
      val seen = mutable.Set.empty[Obj]
      def walk(node: PDict, inherited: Map[String, Obj], depth: Int): Unit = {
        if (depth > 64) throw PdfError("page_tree_too_deep")
        val inh = inherited ++
          node.v.view.filterKeys(k => k == "MediaBox" || k == "Resources").toMap
        resolve(node.get("Type").getOrElse(PNull)) match {
          case PName("Page") => out += ((node, PDict(inh)))
          case _ =>
            val kids = resolve(node.get("Kids").getOrElse(PArr(Vector.empty))) match {
              case PArr(v) => v
              case other   => throw PdfError(s"bad_kids:$other")
            }
            kids.foreach { k =>
              if (!seen.add(k)) throw PdfError("page_tree_cycle")
              resolve(k) match {
                case d: PDict => walk(d, inh, depth + 1)
                case other    => throw PdfError(s"bad_kid:$other")
              }
            }
        }
      }
      walk(top, Map.empty, 0)
      out.result()
    }

    def contentBytes(page: PDict): Array[Byte] = {
      def one(o: Obj): Array[Byte] = resolve(o) match {
        case PStream(dict, raw) => decodeStream(dict, raw, resolve)
        case other              => throw PdfError(s"bad_content_stream:$other")
      }
      resolve(page.get("Contents").getOrElse(PNull)) match {
        case PNull       => Array.emptyByteArray
        case PArr(parts) =>
          // parts of a split content stream concatenate with whitespace
          // between them (a token may not span streams)
          val bufs = parts.map(one)
          val total = bufs.map(_.length + 1).sum
          val out = new Array[Byte](total)
          var p = 0
          bufs.foreach { b =>
            System.arraycopy(b, 0, out, p, b.length); p += b.length
            out(p) = '\n'; p += 1
          }
          out
        case s: PStream => decodeStream(s.dict, s.raw, resolve)
        case other      => throw PdfError(s"bad_contents:$other")
      }
    }
  }

  private def decodeStream(dict: PDict, raw: Array[Byte], resolve: Obj => Obj): Array[Byte] = {
    // filter CHAIN in array order (ISO 32000-1 7.4: the first filter is
    // applied first on encode, so decode applies them first-to-last on the
    // encoded bytes): Flate, TIFF-style LZW, and the three byte-level
    // transport filters. Unsupported filters (DCT/JBIG2/JPX/CCITT/Crypt)
    // stay loud.
    val filterNames: Seq[String] =
      resolve(dict.get("Filter").getOrElse(PNull)) match {
        case PNull    => Nil
        case PName(n) => Seq(n)
        case PArr(items) =>
          items.map(resolve).map {
            case PName(n) => n
            case other    => throw PdfError(s"bad_filter_entry:$other")
          }
        case other => throw PdfError(s"bad_filter:$other")
      }
    // /DecodeParms pairs with /Filter POSITIONALLY (ISO 32000-1 Table 5:
    // with an array Filter, DecodeParms is a parallel array, null entries
    // for parameterless filters). A single parms dict is paired with a
    // single filter; with a multi-filter chain it leniently attaches to
    // the first parms-consuming filter (LZW/Flate), the shape lone
    // real-world writers emit.
    val parmsPerFilter: Seq[Option[PDict]] = {
      val parmsObj =
        resolve(dict.get("DecodeParms").orElse(dict.get("DP")).getOrElse(PNull))
      def asDict(o: Obj): Option[PDict] = o match {
        case d: PDict => Some(d)
        case PNull    => None
        case other    => throw PdfError(s"bad_decode_parms:$other")
      }
      parmsObj match {
        case PNull => Seq.fill(math.max(1, filterNames.length))(None)
        case d: PDict =>
          if (filterNames.length <= 1) Seq(Some(d))
          else {
            val at = filterNames.indexWhere(n => n == "LZWDecode" || n == "FlateDecode")
            val slot = if (at >= 0) at else 0
            filterNames.indices.map(i => if (i == slot) Some(d) else None)
          }
        case PArr(items) =>
          val resolved = items.map(resolve).map(asDict)
          resolved.padTo(math.max(1, filterNames.length), None)
        case other => throw PdfError(s"bad_decode_parms:$other")
      }
    }
    def earlyChangeOf(parms: Option[PDict]): Int =
      parms.flatMap(_.get("EarlyChange")).map(resolve) match {
        case None                            => 1
        case Some(PNum(v)) if v == 0 || v == 1 => v.toInt
        case Some(other) => throw PdfError(s"bad_early_change:$other")
      }
    // a predictor applies to its OWN filter's output (standard on xref
    // streams: Flate + Predictor 12); declaring one on a transport filter
    // is malformed and loud
    def applyPredictor(data: Array[Byte], parms: Option[PDict], name: String): Array[Byte] =
      parms.map(d => resolve(d.get("Predictor").getOrElse(PNull))) match {
        case None | Some(PNull) | Some(PNum(1)) => data
        case Some(PNum(p)) if p >= 10 =>
          if (name != "FlateDecode" && name != "LZWDecode")
            throw PdfError(s"predictor_on_$name")
          val d = parms.get
          // bytes-per-pixel != 1 would change the PNG left-neighbor
          // stride: reject loudly rather than reconstruct garbage
          resolve(d.get("Colors").getOrElse(PNum(1))) match {
            case PNum(1) => ()
            case other   => throw PdfError(s"unsupported_predictor_colors:$other")
          }
          resolve(d.get("BitsPerComponent").getOrElse(PNum(8))) match {
            case PNum(8) => ()
            case other   => throw PdfError(s"unsupported_predictor_bpc:$other")
          }
          val columns = resolve(d.get("Columns").getOrElse(PNum(1))) match {
            case PNum(c) if c >= 1 => c.toInt
            case other             => throw PdfError(s"bad_predictor_columns:$other")
          }
          unfilterPng(data, columns)
        case Some(other) => throw PdfError(s"unsupported_predictor:$other")
      }
    if (filterNames.isEmpty)
      // no filter: a predictor-bearing parms dict still applies to the
      // raw bytes (degenerate but well-formed)
      applyPredictor(raw, parmsPerFilter.head, "FlateDecode")
    else
      filterNames.zip(parmsPerFilter).foldLeft(raw) { case (acc, (name, parms)) =>
        val out = name match {
          case "FlateDecode"     => inflate(acc)
          case "LZWDecode"       => lzwDecode(acc, earlyChangeOf(parms))
          case "ASCIIHexDecode"  => asciiHexDecode(acc)
          case "ASCII85Decode"   => ascii85Decode(acc)
          case "RunLengthDecode" => runLengthDecode(acc)
          case other             => throw PdfError(s"unsupported_filter:$other")
        }
        applyPredictor(out, parms, name)
      }
  }

  /** Reverse the per-row PNG filters (ISO 32000 references PNG spec §9):
    * each row is one filter-type byte + `columns` data bytes; filters
    * None/Sub/Up/Average/Paeth, with bytes-per-pixel 1 (the PDF predictor
    * case). Row count must divide evenly.
    */
  private def unfilterPng(data: Array[Byte], columns: Int): Array[Byte] = {
    val rowLen = columns + 1
    if (data.length % rowLen != 0) throw PdfError("png_predictor_row_misalignment")
    val rows = data.length / rowLen
    val out = new Array[Byte](rows * columns)
    val prev = new Array[Byte](columns)
    var r = 0
    while (r < rows) {
      val ft = data(r * rowLen) & 0xff
      var c = 0
      while (c < columns) {
        val x = data(r * rowLen + 1 + c) & 0xff
        val a = if (c > 0) out(r * columns + c - 1) & 0xff else 0 // left
        val b = prev(c) & 0xff // up
        val cc = if (c > 0) prev(c - 1) & 0xff else 0 // up-left
        val v = ft match {
          case 0 => x
          case 1 => x + a
          case 2 => x + b
          case 3 => x + ((a + b) / 2)
          case 4 =>
            val pp = a + b - cc
            val pa = math.abs(pp - a); val pb = math.abs(pp - b); val pc = math.abs(pp - cc)
            x + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else cc)
          case other => throw PdfError(s"png_filter_unknown:$other")
        }
        out(r * columns + c) = (v & 0xff).toByte
        c += 1
      }
      System.arraycopy(out, r * columns, prev, 0, columns)
      r += 1
    }
    out
  }

  private def inflate(raw: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(raw)
      val out = new java.io.ByteArrayOutputStream(math.max(64, raw.length * 4))
      val chunk = new Array[Byte](8192)
      while (!inf.finished()) {
        val n = inf.inflate(chunk)
        graft.util.StepBudget.tick(math.max(1, n).toLong) // B3: bounded loop work
        if (n == 0) {
          // inflate() also returns 0 when a preset dictionary is required
          // (zlib FDICT bit) — without this check the loop would spin
          // forever with finished()==false and needsInput()==false
          if (inf.needsDictionary()) throw PdfError("flate_needs_dictionary")
          if (inf.needsInput()) throw PdfError("flate_truncated")
        }
        out.write(chunk, 0, n)
        if (out.size() > (64 << 20)) throw PdfError("flate_bomb") // containment
      }
      out.toByteArray
    } catch {
      case _: java.util.zip.DataFormatException => throw PdfError("flate_corrupt")
    } finally inf.end()
  }

  /** Byte-level test access to the transport decoders (the chain path is
    * exercised end to end through RealPdf round trips).
    */
  private[extract] def decodeTransportForTest(
      name: String, raw: Array[Byte], earlyChange: Int = 1): Array[Byte] =
    name match {
      case "ASCIIHexDecode"  => asciiHexDecode(raw)
      case "ASCII85Decode"   => ascii85Decode(raw)
      case "RunLengthDecode" => runLengthDecode(raw)
      case "LZWDecode"       => lzwDecode(raw, earlyChange)
      case other             => throw PdfError(s"unsupported_filter:$other")
    }

  /** /LZWDecode (ISO 32000-1 7.4.4): TIFF-style LZW — MSB-first bit
    * packing, 9-bit codes growing to 12, Clear=256 resets the table,
    * EOD=257. `earlyChange` (default 1) advances the code width one entry
    * early, the historical off-by-one both Adobe and real generators ship.
    * Corrupt code sequences, missing growth resets and output bombs are
    * loud; data ending without EOD is accepted (truncated captures).
    */
  private def lzwDecode(raw: Array[Byte], earlyChange: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(math.max(64, raw.length * 3))
    // table entries 258+ as (prefix code, appended byte); literals/controls
    // are implicit. Decoding a code walks the chain backwards.
    val prefix = new Array[Int](4096)
    val append = new Array[Byte](4096)
    var nextCode = 258
    var width = 9
    var prev = -1
    var bitBuf = 0L
    var bitCnt = 0
    var i = 0
    val scratch = new Array[Byte](4096)
    def bytesOf(code: Int): Int = { // writes into scratch, returns length
      var c = code
      var n = 0
      while (c >= 258) {
        if (n >= scratch.length) throw PdfError("lzw_chain_too_long")
        scratch(n) = append(c); n += 1
        c = prefix(c)
      }
      if (c >= 256) throw PdfError("lzw_bad_chain")
      scratch(n) = c.toByte
      n + 1
    }
    def firstByteOf(code: Int): Byte = {
      var c = code
      while (c >= 258) c = prefix(c)
      if (c >= 256) throw PdfError("lzw_bad_chain")
      c.toByte
    }
    def writeReversed(n: Int): Unit = {
      var k = n - 1
      while (k >= 0) { out.write(scratch(k) & 0xff); k -= 1 }
      if (out.size() > (64 << 20)) throw PdfError("lzw_bomb")
    }
    var done = false
    while (!done) {
      while (bitCnt < width && i < raw.length) {
        bitBuf = (bitBuf << 8) | (raw(i) & 0xffL)
        bitCnt += 8
        i += 1
      }
      if (bitCnt < width) done = true // truncated tail: accept what decoded
      else {
        val code = ((bitBuf >> (bitCnt - width)) & ((1L << width) - 1)).toInt
        bitCnt -= width
        graft.util.StepBudget.tick(1L)
        if (code == 257) done = true // EOD
        else if (code == 256) { nextCode = 258; width = 9; prev = -1 } // Clear
        else if (prev < 0) {
          if (code > 255) throw PdfError("lzw_bad_first_code")
          out.write(code)
          prev = code
        } else {
          if (code > nextCode || (code == nextCode && nextCode >= 4096))
            throw PdfError("lzw_bad_code")
          if (code == nextCode) {
            // KwKwK case: current = prev + firstByte(prev)
            val n = bytesOf(prev)
            writeReversed(n)
            out.write(firstByteOf(prev) & 0xff)
            prefix(nextCode) = prev; append(nextCode) = firstByteOf(prev)
            nextCode += 1
          } else {
            val n = bytesOf(code)
            writeReversed(n)
            if (nextCode < 4096) {
              prefix(nextCode) = prev; append(nextCode) = firstByteOf(code)
              nextCode += 1
            }
            // full table + existing code: legal — some encoders keep
            // emitting 12-bit codes from the frozen table without a Clear;
            // decode without adding an entry (the KwKwK guard above still
            // rejects code == nextCode at a full table)
          }
          prev = code
          if (nextCode + earlyChange >= (1 << width) && width < 12) width += 1
        }
      }
    }
    out.toByteArray
  }

  /** /ASCIIHexDecode (ISO 32000-1 7.4.2): hex pairs, whitespace ignored,
    * `>` is EOD; an odd final digit implies a trailing zero nibble. Data
    * ending at EOF without the EOD marker is accepted (common truncation
    * in real crawled files); a non-hex byte stays loud.
    */
  private def asciiHexDecode(raw: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(math.max(16, raw.length / 2))
    var hi = -1
    var i = 0
    var done = false
    while (i < raw.length && !done) {
      val c = raw(i) & 0xff
      if (c == '>') done = true
      else if (!Character.isWhitespace(c)) {
        val v = Character.digit(c, 16)
        if (v < 0) throw PdfError(s"bad_asciihex_byte:$c")
        if (hi < 0) hi = v
        else { out.write((hi << 4) | v); hi = -1 }
      }
      i += 1
    }
    if (hi >= 0) out.write(hi << 4)
    out.toByteArray
  }

  /** /ASCII85Decode (ISO 32000-1 7.4.3): base-85 groups of 5 chars per 4
    * bytes, `z` for an all-zero group, `~>` EOD, whitespace ignored. A
    * partial final group of n chars yields n-1 bytes (pad with 'u'). A
    * 1-char final group, an out-of-range character, or a group encoding
    * above 2^32-1 is loud.
    */
  private def ascii85Decode(raw: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(math.max(16, raw.length * 4 / 5))
    var i = 0
    // tolerate the Adobe `<~` header some producers emit
    if (raw.length >= 2 && raw(0) == '<' && raw(1) == '~') i = 2
    var tuple = 0L
    var count = 0
    var done = false
    while (i < raw.length && !done) {
      val c = raw(i) & 0xff
      if (c == '~') done = true
      else if (Character.isWhitespace(c)) ()
      else if (c == 'z' && count == 0) { out.write(0); out.write(0); out.write(0); out.write(0) }
      else if (c >= '!' && c <= 'u') {
        tuple = tuple * 85 + (c - '!')
        count += 1
        if (count == 5) {
          if (tuple > 0xffffffffL) throw PdfError("ascii85_group_overflow")
          out.write(((tuple >> 24) & 0xff).toInt)
          out.write(((tuple >> 16) & 0xff).toInt)
          out.write(((tuple >> 8) & 0xff).toInt)
          out.write((tuple & 0xff).toInt)
          tuple = 0L
          count = 0
        }
      } else throw PdfError(s"bad_ascii85_byte:$c")
      i += 1
    }
    if (count == 1) throw PdfError("ascii85_orphan_digit")
    if (count > 1) {
      var t = tuple
      var k = count
      while (k < 5) { t = t * 85 + 84; k += 1 } // pad with 'u'
      if (t > 0xffffffffL) throw PdfError("ascii85_group_overflow")
      val bytes = Array(
        ((t >> 24) & 0xff).toByte, ((t >> 16) & 0xff).toByte, ((t >> 8) & 0xff).toByte)
      out.write(bytes, 0, count - 1)
    }
    out.toByteArray
  }

  /** /RunLengthDecode (ISO 32000-1 7.4.5): length byte L — 0..127 copies
    * the next L+1 bytes, 129..255 repeats the next byte 257-L times, 128
    * is EOD (EOF-as-end accepted). A run overrunning the input is loud.
    */
  private def runLengthDecode(raw: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(math.max(16, raw.length * 2))
    var i = 0
    var done = false
    while (i < raw.length && !done) {
      val l = raw(i) & 0xff
      if (l == 128) done = true
      else if (l < 128) {
        if (i + 1 + l + 1 > raw.length) throw PdfError("runlength_truncated")
        out.write(raw, i + 1, l + 1)
        i += l + 1
      } else {
        if (i + 1 >= raw.length) throw PdfError("runlength_truncated")
        val b = raw(i + 1) & 0xff
        var k = 257 - l
        while (k > 0) { out.write(b); k -= 1 }
        i += 1
      }
      i += 1
      if (out.size() > (64 << 20)) throw PdfError("runlength_bomb") // containment
    }
    out.toByteArray
  }

  // ---- fonts: Type0/CID with ToUnicode CMaps --------------------------------

  /** How strings shown under a given font resource decode to text. */
  private sealed trait FontDec
  /** Simple fonts (Type1/TrueType/Type3): 1 byte per glyph through a
    * 256-entry table. The default table is Latin-1 (exact for the
    * Standard printable range); /WinAnsiEncoding swaps in the cp1252
    * 0x80-0x9F block, and an /Encoding dict's /Differences array remaps
    * individual codes via Adobe glyph names (AGL subset + uniXXXX).
    * `toUni` is the font's 1-byte /ToUnicode CMap when present — it takes
    * PRECEDENCE over the encoding table per code (ISO 32000-1 §9.10.2
    * lists ToUnicode first in the extraction order; every real extractor
    * prefers it because subsetted fonts carry private encodings the
    * table cannot describe), with unmapped codes falling back to the
    * table.
    */
  private final case class SimpleFont(
      table: Array[String],
      toUni: Map[Int, String] = Map.empty) extends FontDec
  /** How a composite font decodes a code with no ToUnicode entry. */
  private sealed trait CidFallback
  /** Identity-H: codes are opaque glyph ids — unmapped is U+FFFD. */
  private case object GlyphIdCodes extends CidFallback
  /** Predefined UCS2 families: the 2-byte code IS the UCS-2 code point;
    * surrogate halves cannot occur in valid UCS-2 (U+FFFD).
    */
  private case object Ucs2Codes extends CidFallback
  /** Predefined UTF16 families: codes are UTF-16BE code units — they pass
    * through verbatim, so a high+low surrogate pair of consecutive codes
    * reassembles the supplementary character in the output string (a LONE
    * half degrades to U+FFFD when the neighbor doesn't pair, judged by the
    * quality gate like any other producer defect).
    */
  private case object Utf16Codes extends CidFallback

  /** Composite font with a /ToUnicode CMap: fixed-width codes map to
    * Unicode strings (possibly multi-char, e.g. ligature expansions);
    * unmapped codes decode per the `fallback` mode of the font's
    * predefined encoding family.
    */
  private final case class CidFont(
      codeLen: Int,
      toUni: Map[Int, String],
      fallback: CidFallback = GlyphIdCodes) extends FontDec
  /** Composite font WITHOUT /ToUnicode: its strings are opaque glyph ids —
    * any attempt to show text through it fails loudly (contained per page)
    * rather than emitting garbage the quality gate must catch.
    */
  private case object CidNoToUni extends FontDec

  /** Predefined CMap names whose codespace is 2-byte UCS-2 (horizontal):
    * for these the code→Unicode map is the identity by the CMaps' own
    * definition, so extraction needs no bundled CID tables.
    */
  private val Ucs2Families: Set[String] = Set(
    "UniGB-UCS2-H", "UniCNS-UCS2-H", "UniJIS-UCS2-H", "UniKS-UCS2-H")

  /** Predefined CMap families whose codes are UTF-16BE byte sequences (the
    * modern CJK superset of UCS2: supplementary-plane characters appear as
    * surrogate pairs of 2-byte code units). Code units decode verbatim and
    * pairs reassemble in the output string.
    */
  private val Utf16Families: Set[String] = Set(
    "UniGB-UTF16-H", "UniCNS-UTF16-H", "UniJIS-UTF16-H", "UniKS-UTF16-H",
    "UniJIS2004-UTF16-H")

  private[extract] final case class ToUniCMap(
      codeLen: Int,
      map: Map[Int, String],
      sawCodespace: Boolean)

  /** Latin-1 identity table: code = codepoint (the historical default this
    * reader always used; keeps every existing fixture byte-identical when
    * no /Encoding is declared).
    */
  private val Latin1Table: Array[String] =
    Array.tabulate(256)(i => i.toChar.toString)

  /** MacRomanEncoding: the other pre-Unicode simple-font base encoding
    * real crawls carry (Mac-era generators). The table is derived from
    * the JVM's own x-MacRoman charset — authoritative, nothing
    * hand-transcribed; a JVM without the charset keeps the Latin-1
    * historical default.
    */
  private val MacRomanTable: Array[String] =
    (try Some(java.nio.charset.Charset.forName("x-MacRoman"))
    catch { case _: Exception => None }) match {
      case Some(cs) =>
        val t = Array.tabulate(256)(i =>
          if (i < 128) i.toChar.toString
          else new String(Array(i.toByte), cs))
        // PDF's MacRomanEncoding (ISO 32000 Annex D) diverges from the
        // JVM's Mac OS Roman at two codes: 0xCA is 'space' (the charset
        // says NBSP — gluing words for whitespace-based tokenizers) and
        // 0xDB is 'currency' (the post-8.5 charset says euro)
        t(0xca) = " "
        t(0xdb) = "¤"
        t
      case None => Latin1Table
    }

  /** WinAnsiEncoding = cp1252: Latin-1 with the 0x80-0x9F block holding
    * real typography (curly quotes, dashes, Euro, ellipsis) instead of C1
    * controls — the dominant simple-font encoding in the wild.
    */
  private val WinAnsiTable: Array[String] = {
    val t = Latin1Table.clone()
    val block = Map(
      0x80 -> "€", 0x82 -> "‚", 0x83 -> "ƒ", 0x84 -> "„",
      0x85 -> "…", 0x86 -> "†", 0x87 -> "‡", 0x88 -> "ˆ",
      0x89 -> "‰", 0x8A -> "Š", 0x8B -> "‹", 0x8C -> "Œ",
      0x8E -> "Ž", 0x91 -> "‘", 0x92 -> "’", 0x93 -> "“",
      0x94 -> "”", 0x95 -> "•", 0x96 -> "–", 0x97 -> "—",
      0x98 -> "˜", 0x99 -> "™", 0x9A -> "š", 0x9B -> "›",
      0x9C -> "œ", 0x9E -> "ž", 0x9F -> "Ÿ")
    block.foreach { case (c, s) => t(c) = s }
    t
  }

  /** Adobe Glyph List subset: the names real /Differences arrays carry
    * (Latin letters are their own names; digits and punctuation have word
    * names; accents/typography per AGL). `uniXXXX`/`uXXXX[XX]` decode
    * directly; anything else is U+FFFD for the quality gate to judge.
    */
  private val AglCommon: Map[String, String] = Map(
    "space" -> " ", "exclam" -> "!", "quotedbl" -> "\"", "numbersign" -> "#",
    "dollar" -> "$", "percent" -> "%", "ampersand" -> "&", "quotesingle" -> "'",
    "parenleft" -> "(", "parenright" -> ")", "asterisk" -> "*", "plus" -> "+",
    "comma" -> ",", "hyphen" -> "-", "period" -> ".", "slash" -> "/",
    "zero" -> "0", "one" -> "1", "two" -> "2", "three" -> "3", "four" -> "4",
    "five" -> "5", "six" -> "6", "seven" -> "7", "eight" -> "8", "nine" -> "9",
    "colon" -> ":", "semicolon" -> ";", "less" -> "<", "equal" -> "=",
    "greater" -> ">", "question" -> "?", "at" -> "@", "bracketleft" -> "[",
    "backslash" -> "\\", "bracketright" -> "]", "asciicircum" -> "^",
    "underscore" -> "_", "grave" -> "`", "braceleft" -> "{", "bar" -> "|",
    "braceright" -> "}", "asciitilde" -> "~",
    "adieresis" -> "ä", "odieresis" -> "ö", "udieresis" -> "ü",
    "Adieresis" -> "Ä", "Odieresis" -> "Ö", "Udieresis" -> "Ü",
    "germandbls" -> "ß", "eacute" -> "é", "egrave" -> "è", "ecircumflex" -> "ê",
    "edieresis" -> "ë", "agrave" -> "à", "aacute" -> "á", "acircumflex" -> "â",
    "atilde" -> "ã", "ccedilla" -> "ç", "ntilde" -> "ñ", "aring" -> "å",
    "oslash" -> "ø", "ograve" -> "ò", "oacute" -> "ó", "ocircumflex" -> "ô",
    "otilde" -> "õ", "igrave" -> "ì", "iacute" -> "í", "icircumflex" -> "î",
    "idieresis" -> "ï", "ugrave" -> "ù", "uacute" -> "ú", "ucircumflex" -> "û",
    "ae" -> "æ", "AE" -> "Æ", "oe" -> "œ", "OE" -> "Œ", "Eacute" -> "É",
    "Egrave" -> "È", "Agrave" -> "À", "Aacute" -> "Á", "Ccedilla" -> "Ç",
    "yacute" -> "ý", "ydieresis" -> "ÿ", "Ydieresis" -> "Ÿ",
    "quoteleft" -> "‘", "quoteright" -> "’",
    "quotedblleft" -> "“", "quotedblright" -> "”",
    "quotesinglbase" -> "‚", "quotedblbase" -> "„",
    "endash" -> "–", "emdash" -> "—", "bullet" -> "•",
    "ellipsis" -> "…", "dagger" -> "†", "daggerdbl" -> "‡",
    "perthousand" -> "‰", "guilsinglleft" -> "‹",
    "guilsinglright" -> "›", "guillemotleft" -> "«",
    "guillemotright" -> "»", "fi" -> "ﬁ", "fl" -> "ﬂ",
    "Euro" -> "€", "trademark" -> "™", "copyright" -> "©",
    "registered" -> "®", "degree" -> "°", "plusminus" -> "±",
    "multiply" -> "×", "divide" -> "÷", "micro" -> "µ",
    "paragraph" -> "¶", "section" -> "§", "cent" -> "¢",
    "sterling" -> "£", "yen" -> "¥", "florin" -> "ƒ",
    "currency" -> "¤", "exclamdown" -> "¡", "questiondown" -> "¿",
    "dotlessi" -> "ı", "circumflex" -> "ˆ", "tilde" -> "˜",
    "Scaron" -> "Š", "scaron" -> "š", "Zcaron" -> "Ž",
    "zcaron" -> "ž", "thorn" -> "þ", "Thorn" -> "Þ",
    "eth" -> "ð", "Eth" -> "Ð", "minus" -> "−",
    "fraction" -> "⁄", "dotaccent" -> "˙", "breve" -> "˘",
    "caron" -> "ˇ", "ring" -> "˚", "hungarumlaut" -> "˝",
    "ogonek" -> "˛", "macron" -> "¯", "brokenbar" -> "¦",
    "sterlingcurrency" -> "£", "nbspace" -> " ")

  private def glyphToChar(name: String): String = {
    def isHex(s: String) = s.nonEmpty && s.forall(c => Character.digit(c, 16) >= 0)
    if (name.length == 1 &&
      ((name.charAt(0) >= 'a' && name.charAt(0) <= 'z') ||
        (name.charAt(0) >= 'A' && name.charAt(0) <= 'Z'))) name
    else if (name.length == 7 && name.startsWith("uni") && isHex(name.drop(3)))
      // uniXXXX: exactly one 4-hex group (multi-group uniXXXXYYYY names
      // are out of subset and fall through to U+FFFD)
      Integer.parseInt(name.drop(3), 16).toChar.toString
    else if (name.length >= 5 && name.length <= 7 && name.startsWith("u") &&
      isHex(name.drop(1))) {
      // uXXXX[XX]: 4-6 hex digits incl. supplementary planes (AGL §3)
      val cp = Integer.parseInt(name.drop(1), 16)
      if (cp >= 0 && cp <= 0x10ffff && !(cp >= 0xd800 && cp <= 0xdfff))
        new String(Character.toChars(cp))
      else "�"
    } else AglCommon.getOrElse(name, "�")
  }

  /** The 1-byte decode table for a simple font's /Encoding entry. Absent
    * encoding keeps the Latin-1 historical default; unrecognized base
    * encodings (Standard/MacExpert) also keep it — byte-for-byte the
    * pre-round-5 behavior, exact for ASCII and judged by the quality
    * gate beyond it. Malformed /Differences structures are loud.
    */
  private def simpleTable(resolve: Obj => Obj, f: PDict): Array[String] =
    resolve(f.get("Encoding").getOrElse(PNull)) match {
      case PNull                     => Latin1Table
      case PName("WinAnsiEncoding")  => WinAnsiTable
      case PName("MacRomanEncoding") => MacRomanTable
      case PName(_)                  => Latin1Table
      case d: PDict =>
        val base = resolve(d.get("BaseEncoding").getOrElse(PNull)) match {
          case PName("WinAnsiEncoding")  => WinAnsiTable
          case PName("MacRomanEncoding") => MacRomanTable
          case _                         => Latin1Table
        }
        resolve(d.get("Differences").getOrElse(PNull)) match {
          case PNull => base
          case PArr(items) =>
            val t = base.clone()
            var code = -1
            items.map(resolve).foreach {
              case PNum(v) =>
                if (v < 0 || v > 255) throw PdfError("bad_differences_code")
                code = v.toInt
              case PName(g) =>
                if (code < 0 || code > 255) throw PdfError("bad_differences_code")
                t(code) = glyphToChar(g)
                code += 1
              case other => throw PdfError(s"bad_differences_entry:$other")
            }
            t
          case other => throw PdfError(s"bad_differences:$other")
        }
      case other => throw PdfError(s"bad_encoding:$other")
    }

  /** Parse a /ToUnicode CMap stream (ISO 32000-1 9.10.3 / Adobe CMap
    * spec): `codespacerange` fixes the code byte-width (1 or 2 supported,
    * mixed widths loud), `bfchar` maps single codes, `bfrange` maps dense
    * ranges either by incrementing the LAST BYTE of the destination (must
    * not overflow the byte, per spec) or through an explicit destination
    * array. Destinations are UTF-16BE. Everything else in the PostScript
    * wrapper is structural noise and is skipped.
    */
  private[extract] def parseToUnicode(bytes: Array[Byte]): ToUniCMap = {
    val lx = new Lexer(bytes, 0)
    val stack = mutable.ArrayBuffer.empty[Obj]
    var codeLen = -1
    val map = mutable.Map.empty[Int, String]
    def codeOf(s: Array[Byte]): Int = {
      if (codeLen < 0) {
        if (s.length < 1 || s.length > 2) throw PdfError(s"cmap_code_width_${s.length}")
        codeLen = s.length
      }
      if (s.length != codeLen) throw PdfError("cmap_mixed_code_width")
      var v = 0
      var i = 0
      while (i < s.length) { v = (v << 8) | (s(i) & 0xff); i += 1 }
      v
    }
    def uniOf(s: Array[Byte]): String = new String(s, StandardCharsets.UTF_16BE)
    def guard(): Unit =
      if (map.size > (1 << 20)) throw PdfError("cmap_bomb")
    var mode = 0 // 0 outside, 1 codespace, 2 bfchar, 3 bfrange
    var sawCodespace = false
    while (!lx.atEnd) {
      lx.skipWs()
      if (!lx.atEnd) {
        val b = lx.peek
        if (b == '(' || b == '<' || b == '[' || b == '/' || b.toChar.isDigit ||
          b == '+' || b == '-' || b == '.') {
          stack += lx.obj(null)
          mode match {
            case 1 if stack.length == 2 =>
              (stack(0), stack(1)) match {
                case (PStr(lo), PStr(hi)) =>
                  codeOf(lo); codeOf(hi); sawCodespace = true
                case other                => throw PdfError(s"cmap_bad_codespace:$other")
              }
              stack.clear()
            case 2 if stack.length == 2 =>
              (stack(0), stack(1)) match {
                case (PStr(src), PStr(dst)) => map(codeOf(src)) = uniOf(dst); guard()
                case other                  => throw PdfError(s"cmap_bad_bfchar:$other")
              }
              stack.clear()
            case 3 if stack.length == 3 =>
              (stack(0), stack(1), stack(2)) match {
                case (PStr(lo), PStr(hi), dst) =>
                  val loC = codeOf(lo)
                  val hiC = codeOf(hi)
                  if (hiC < loC) throw PdfError("cmap_bad_range")
                  dst match {
                    case PStr(d) if d.nonEmpty =>
                      var off = 0
                      while (off <= hiC - loC) {
                        val nb = d.clone()
                        val last = (nb(nb.length - 1) & 0xff) + off
                        // the spec forbids a range whose increment crosses
                        // the final byte: refuse rather than wrap
                        if (last > 0xff) throw PdfError("cmap_range_overflow")
                        nb(nb.length - 1) = last.toByte
                        map(loC + off) = uniOf(nb)
                        off += 1
                      }
                      guard()
                    case PArr(items) =>
                      if (items.length != hiC - loC + 1)
                        throw PdfError("cmap_range_array_mismatch")
                      items.zipWithIndex.foreach {
                        case (PStr(d), k) => map(loC + k) = uniOf(d)
                        case (other, _)   => throw PdfError(s"cmap_bad_range_dst:$other")
                      }
                      guard()
                    case other => throw PdfError(s"cmap_bad_range_dst:$other")
                  }
                case other => throw PdfError(s"cmap_bad_bfrange:$other")
              }
              stack.clear()
            case _ =>
              // outside a bf/codespace section the operands are never
              // consumed (cidrange bodies, wrapper numbers): cap the
              // idle stack so a huge embedded cidrange block cannot
              // accumulate its operands between clearing tokens
              if (mode == 0 && stack.length > 8) stack.clear()
          }
        } else {
          lx.token() match {
            case "begincodespacerange" => mode = 1; stack.clear()
            case "endcodespacerange"   => mode = 0; stack.clear()
            case "beginbfchar"         => mode = 2; stack.clear()
            case "endbfchar"           => mode = 0; stack.clear()
            case "beginbfrange"        => mode = 3; stack.clear()
            case "endbfrange"          => mode = 0; stack.clear()
            case _                     => stack.clear()
          }
        }
      }
    }
    ToUniCMap(if (codeLen < 0) 2 else codeLen, map.toMap, sawCodespace)
  }

  /** Code byte-width of an EMBEDDED /Encoding CMap stream (Adobe CMap
    * spec, the subsetted-CJK-font shape), from its codespacerange — the
    * same scanner as /ToUnicode parsing (the code→CID body is structural
    * noise there and is skipped). A CMap that never declares a codespace
    * cannot segment strings: loud. Mixed-width codespaces (the
    * Shift-JIS-style 1+2-byte spaces) are refused inside the scan — fixed
    * width segmentation would misalign those strings silently.
    */
  private[extract] def encodingCMapWidth(bytes: Array[Byte]): Int = {
    val cm = parseToUnicode(bytes)
    if (!cm.sawCodespace) throw PdfError("cmap_no_codespace")
    cm.codeLen
  }

  /** Resolve the page's /Resources /Font dictionary (inheritable through
    * the page tree) into per-name decode behaviors. Only /Type0 changes
    * decoding; Identity-H is the supported (modern-generator standard)
    * encoding — predefined CMap encodings are out of subset and loud.
    */
  /** The page's effective /Resources dict (inheritable through the page
    * tree), or None when neither the page nor its ancestors declare one.
    */
  private def resourcesOf(
      resolve: Obj => Obj,
      page: PDict,
      inherited: PDict): Option[PDict] =
    resolve(
      page.get("Resources").orElse(inherited.get("Resources")).getOrElse(PNull)) match {
      case d: PDict => Some(d)
      case PNull    => None
      case other    => throw PdfError(s"bad_resources:$other")
    }

  /** Named form/image XObject entries of a resources dict (UNRESOLVED, so
    * PRef identity can key the recursion cycle guard).
    */
  private def xobjectsOfRes(resolve: Obj => Obj, res: PDict): Map[String, Obj] =
    resolve(res.get("XObject").getOrElse(PNull)) match {
      case PNull    => Map.empty
      case d: PDict => d.v
      case other    => throw PdfError(s"bad_xobject_resource:$other")
    }

  private def fontsOfRes(
      resolve: Obj => Obj,
      res: PDict,
      cmapCache: mutable.Map[Obj, ToUniCMap],
      encWidthCache: mutable.Map[Obj, Int]): Map[String, FontDec] =
    resolve(res.get("Font").getOrElse(PNull)) match {
      case PNull => Map.empty
      case fd: PDict =>
        fd.v.map { case (name, fref) =>
          val dec = resolve(fref) match {
            case f: PDict =>
              resolve(f.get("Subtype").getOrElse(PNull)) match {
                case PName("Type0") =>
                  // supported composite encodings: Identity-H (codes are
                  // glyph ids — a ToUnicode CMap is REQUIRED), the
                  // predefined UCS2 horizontal families (2-byte codes ARE
                  // UCS-2 code points), the UTF16 horizontal families
                  // (codes are UTF-16BE code units; surrogate pairs
                  // reassemble) — for both Uni* classes a missing
                  // ToUnicode falls back to the codes' own Unicode
                  // meaning, exactly what those CMaps define — and
                  // EMBEDDED CMap streams (subsetted CJK fonts carry
                  // private encodings this way): their codespace fixes
                  // the code width and a ToUnicode is REQUIRED (the
                  // code→CID table carries no Unicode meaning). Vertical
                  // (-V) variants and CID-table predefined CMaps (tables
                  // we do not ship) stay loud.
                  val encRef = f.get("Encoding").getOrElse(PNull)
                  val (codeW, fallback): (Int, CidFallback) =
                    resolve(encRef) match {
                      case PName("Identity-H")                   => (2, GlyphIdCodes)
                      case PName(n) if Ucs2Families.contains(n)  => (2, Ucs2Codes)
                      case PName(n) if Utf16Families.contains(n) => (2, Utf16Codes)
                      case s: PStream =>
                        // cached like ToUnicode: shared across pages
                        val w = encWidthCache.getOrElseUpdate(
                          encRef,
                          encodingCMapWidth(decodeStream(s.dict, s.raw, resolve)))
                        (w, GlyphIdCodes)
                      case other => throw PdfError(s"unsupported_cid_encoding:$other")
                    }
                  val toUniRef = f.get("ToUnicode").getOrElse(PNull)
                  resolve(toUniRef) match {
                    case s: PStream =>
                      // one parse per document, not per page: multi-page
                      // docs share the font object (the LaTeX/Word shape),
                      // and the PRef key makes the cache hit across pages
                      val cm = cmapCache.getOrElseUpdate(
                        toUniRef,
                        parseToUnicode(decodeStream(s.dict, s.raw, resolve)))
                      // the show strings are codeW-byte codes; a CMap
                      // whose codespace disagrees would misalign every
                      // string. Checked OUTSIDE the cache insert: a
                      // stream shared between fonts of different widths
                      // must fail on EVERY mismatched use, not only the
                      // first parse (cache-hit bypass)
                      if (cm.codeLen != codeW)
                        throw PdfError(s"cid_code_width_${cm.codeLen}")
                      CidFont(cm.codeLen, cm.map, fallback)
                    case PNull if fallback != GlyphIdCodes =>
                      CidFont(2, Map.empty, fallback)
                    case PNull => CidNoToUni
                    case other => throw PdfError(s"bad_tounicode:$other")
                  }
                case _ =>
                  // a simple font's /ToUnicode (1-byte codespace) takes
                  // precedence over the encoding table — the subsetted-
                  // TrueType-with-private-encoding shape that dominates
                  // modern crawled PDFs
                  val toUniRef = f.get("ToUnicode").getOrElse(PNull)
                  resolve(toUniRef) match {
                    case s: PStream =>
                      val cm = cmapCache.getOrElseUpdate(
                        toUniRef,
                        parseToUnicode(decodeStream(s.dict, s.raw, resolve)))
                      // a 2-byte CMap on a 1-byte font would misalign
                      // every string: a producer defect, loud — checked
                      // outside the cache insert (see the Type0 twin)
                      if (cm.codeLen != 1)
                        throw PdfError(s"simple_font_code_width_${cm.codeLen}")
                      SimpleFont(simpleTable(resolve, f), cm.map)
                    case PNull  => SimpleFont(simpleTable(resolve, f))
                    case other  => throw PdfError(s"bad_tounicode:$other")
                  }
              }
            case other => throw PdfError(s"bad_font:$other")
          }
          name -> dec
        }
      case other => throw PdfError(s"bad_font_resource:$other")
    }

  // ---- content-stream text extraction --------------------------------------

  /** Nominal char advance in text-space units per point of font size for the
    * fixed-pitch fonts the generator embeds (Courier: 600/1000 em).
    */
  private val FixedPitchEm = 0.6

  /** A positioned run in PDF user space (y up), carrying the effective font
    * size so the page can be normalized to the layout pipeline's advance
    * model after all runs are known.
    */
  private final case class RawRun(x: Double, yUp: Double, fs: Double, text: String)

  private def runsOf(
      content: Array[Byte],
      fontsF: () => Map[String, FontDec] = () => Map.empty,
      onDo: String => Vector[RawRun] = _ => Vector.empty): Vector[RawRun] = {
    // resolved on the FIRST named Tf only: a malformed-but-unused /Font
    // resource must not fail a page that never shows text through it
    lazy val fonts: Map[String, FontDec] = fontsF()
    val lx = new Lexer(content, 0)
    val stack = mutable.ArrayBuffer.empty[Obj]
    val runs = Vector.newBuilder[RawRun]
    var fs = 12.0 // Tf font size
    var leading = 14.4
    // text-state parameters (ISO 32000-1 9.3): char spacing, word spacing
    // (applies per single-byte 0x20 code), horizontal scaling. They feed
    // the ADVANCE model only (justified text spreads words with Tw/Tc);
    // per spec they persist across BT/ET. q/Q save-restore of text state
    // is out of subset (graphics state here tracks the CTM only).
    var tc = 0.0
    var tw = 0.0
    var th = 1.0 // Tz/100
    // text matrix: only axis-aligned scale + translation supported. a/d
    // scale positions and advances (a generator folding the size into Tm —
    // '24 0 0 24 x y Tm' with '/F1 1 Tf' — is common); rotation/skew
    // (b or c nonzero) is out of subset and fails LOUDLY rather than
    // emitting silently scrambled geometry.
    var ma = 1.0
    var md = 1.0
    var tx = 0.0
    var ty = 0.0
    var lineX = 0.0 // line start for T*/TD/'/"
    var cursorX = 0.0

    // current transformation matrix (cm within q/Q): FULL coefficients are
    // tracked so a rotated cm used purely for GRAPHICS stays harmless —
    // the loud refusal fires only when TEXT is shown (or a form invoked)
    // under a rotated/skewed/mirrored CTM, matching the Tm discipline.
    // The ubiquitous Quartz y-FLIP (1 0 0 -1 0 H cm) is SUPPORTED: the
    // y map flips positions correctly and the font size uses |cd|; an
    // x-mirror (ca < 0) or 180-degree rotation (both negative) would
    // reverse reading order and stays loud.
    var ca = 1.0; var cb = 0.0; var cc = 0.0; var cd = 1.0
    var ce = 0.0; var cf = 0.0
    val ctmStack = mutable.ArrayBuffer.empty[(Double, Double, Double, Double, Double, Double)]
    def requireAxisCtm(): Unit =
      if (math.abs(cb) > 1e-9 || math.abs(cc) > 1e-9 || ca <= 1e-9 ||
        math.abs(cd) <= 1e-9)
        throw PdfError("rotated_text_unsupported")
    def mapX(x: Double): Double = ca * x + ce
    def mapY(y: Double): Double = cd * y + cf
    def ctmScale: Double = (ca + math.abs(cd)) / 2

    def effSize: Double = fs * ((ma + md) / 2) // axis-aligned: ma==md in practice

    // current font decode behavior, switched by Tf; a name missing from
    // the resources keeps the legacy simple-font decode (lenient — the
    // synthetic and hand-built corpora do not always declare resources)
    var curFont: FontDec = SimpleFont(Latin1Table)

    def emit(bytes: Array[Byte]): Unit = {
      // decoded text + GLYPH count: the advance model is per glyph code,
      // which for a CID ligature expansion differs from the char count
      val (text, glyphs) = curFont match {
        case SimpleFont(table, toUni) =>
          if ((table eq Latin1Table) && toUni.isEmpty) // fast path: identity
            (new String(bytes, StandardCharsets.ISO_8859_1), bytes.length)
          else {
            val sb = new StringBuilder(bytes.length)
            bytes.foreach { b =>
              val code = b & 0xff
              toUni.get(code) match {
                case Some(s) => sb.append(s)
                case None    => sb.append(table(code))
              }
            }
            (sb.toString, bytes.length)
          }
        case CidFont(len, toUni, fallback) =>
          if (bytes.length % len != 0) throw PdfError("cid_string_misaligned")
          val sb = new StringBuilder(bytes.length / len)
          var i = 0
          while (i < bytes.length) {
            var code = 0
            var k = 0
            while (k < len) { code = (code << 8) | (bytes(i + k) & 0xff); k += 1 }
            toUni.get(code) match {
              case Some(s) => sb.append(s)
              case None => fallback match {
                case Ucs2Codes if !(code >= 0xd800 && code <= 0xdfff) =>
                  // the code IS the code point (surrogate halves cannot
                  // occur in valid UCS-2 — fall through to U+FFFD)
                  sb.append(code.toChar)
                case Utf16Codes =>
                  // UTF-16BE code unit, verbatim: surrogate pairs of
                  // consecutive codes reassemble in the output string
                  sb.append(code.toChar)
                case _ =>
                  // an unmapped code is a data defect in the producer's
                  // CMap: U+FFFD keeps the page recoverable and lets the
                  // downstream quality gate judge the damage (PyMuPDF
                  // does the same)
                  sb.append('�')
              }
            }
            i += len
          }
          (sb.toString, bytes.length / len)
        case CidNoToUni => throw PdfError("cid_font_without_tounicode")
      }
      if (text.nonEmpty) {
        requireAxisCtm()
        runs += RawRun(mapX(cursorX), mapY(ty), effSize * ctmScale, text)
      }
      // per-glyph advance (ISO 32000-1 9.4.4 shape, on the fixed-pitch
      // model): (w*Tfs + Tc + Tw-per-space) * Th, scaled by the text
      // matrix. Word spacing applies to single-byte 0x20 codes only —
      // per §9.3.3 that includes a composite font whose codespace is
      // 1-byte, but never 2-byte CID strings.
      val nSpaces = curFont match {
        case CidFont(len, _, _) if len != 1 => 0
        case _                              => bytes.count(_ == ' '.toByte)
      }
      cursorX += (glyphs * (fs * FixedPitchEm + tc) + nSpaces * tw) * th * ma
    }

    def num(o: Obj): Double = o match {
      case PNum(v) => v
      case other   => throw PdfError(s"operand_not_number:$other")
    }

    while (!lx.atEnd) {
      lx.skipWs()
      if (!lx.atEnd) {
        val b = lx.peek
        if (b == '(' || b == '<' || b == '[' || b == '/' || b.toChar.isDigit || b == '+' || b == '-' || b == '.') {
          stack += lx.obj(null)
        } else {
          val op = lx.token()
          op match {
            case "BT" =>
              ma = 1.0; md = 1.0; tx = 0; ty = 0; lineX = 0; cursorX = 0
              stack.clear()
            case "ET" => stack.clear()
            case "Tf" =>
              if (stack.nonEmpty) fs = num(stack.last)
              if (stack.length >= 2) stack(stack.length - 2) match {
                case PName(n) =>
                  curFont = fonts.getOrElse(n, SimpleFont(Latin1Table))
                case _        => ()
              }
              stack.clear()
            case "TL" =>
              if (stack.nonEmpty) leading = num(stack.last)
              stack.clear()
            case "Tc" =>
              if (stack.nonEmpty) tc = num(stack.last)
              stack.clear()
            case "Tw" =>
              if (stack.nonEmpty) tw = num(stack.last)
              stack.clear()
            case "Tz" =>
              if (stack.nonEmpty) {
                val z = num(stack.last)
                if (z <= 0) throw PdfError("bad_horizontal_scaling")
                th = z / 100.0
              }
              stack.clear()
            case "Td" | "TD" =>
              if (stack.length >= 2) {
                // translation in TEXT space: scaled by the matrix diagonals
                tx += num(stack(stack.length - 2)) * ma
                ty += num(stack.last) * md
                if (op == "TD") leading = -num(stack.last)
                lineX = tx; cursorX = tx
              }
              stack.clear()
            case "Tm" =>
              if (stack.length >= 6) {
                val a = num(stack(stack.length - 6))
                val bC = num(stack(stack.length - 5))
                val c = num(stack(stack.length - 4))
                val d = num(stack(stack.length - 3))
                if (math.abs(bC) > 1e-9 || math.abs(c) > 1e-9)
                  throw PdfError("rotated_text_unsupported")
                ma = a; md = d
                tx = num(stack(stack.length - 2))
                ty = num(stack.last)
                lineX = tx; cursorX = tx
              }
              stack.clear()
            case "T*" =>
              ty -= leading * md; cursorX = lineX; stack.clear()
            case "BI" =>
              // inline image: the parameter tokens run to ID, then RAW
              // pixel bytes to the EI delimiter — tokenizing those bytes
              // would produce garbage operators or fake text strings.
              // Skip to ID at the token level, then scan bytes for a
              // whitespace-delimited EI (the standard heuristic; a false
              // EI inside pixel data degrades to contained garbage ops,
              // never silent fake text runs with valid syntax)
              stack.clear()
              var atId = false
              while (!atId && !lx.atEnd) {
                lx.skipWs()
                if (!lx.atEnd) {
                  val pb = lx.peek
                  if (pb == '(' || pb == '<' || pb == '[' || pb == '/' ||
                    pb.toChar.isDigit || pb == '+' || pb == '-' || pb == '.') {
                    lx.obj(null)
                    ()
                  } else if (lx.token() == "ID") atId = true
                }
              }
              if (!atId) throw PdfError("inline_image_unterminated")
              def isWsB(x: Byte): Boolean =
                x == ' ' || x == '\n' || x == '\r' || x == '\t' || x == '\f' || x == 0
              val ibuf = lx.buf
              var ip = lx.pos
              if (ip < ibuf.length && isWsB(ibuf(ip))) ip += 1 // single separator
              var found = -1
              while (found < 0 && ip + 1 < ibuf.length) {
                if (ibuf(ip) == 'E' && ibuf(ip + 1) == 'I' &&
                  isWsB(ibuf(ip - 1)) &&
                  (ip + 2 >= ibuf.length || isWsB(ibuf(ip + 2)))) found = ip
                ip += 1
              }
              graft.util.StepBudget.tick(math.max(1L, (ip - lx.pos).toLong))
              if (found < 0) throw PdfError("inline_image_unterminated")
              lx.pos = found + 2
            case "q" =>
              ctmStack += ((ca, cb, cc, cd, ce, cf))
              stack.clear()
            case "Q" =>
              if (ctmStack.nonEmpty) {
                val t = ctmStack.remove(ctmStack.length - 1)
                ca = t._1; cb = t._2; cc = t._3; cd = t._4; ce = t._5; cf = t._6
              } // an unbalanced Q restores nothing (lenient, as real
              // viewers treat it)
              stack.clear()
            case "cm" =>
              if (stack.length >= 6) {
                val a = num(stack(stack.length - 6))
                val b2 = num(stack(stack.length - 5))
                val c2 = num(stack(stack.length - 4))
                val d2 = num(stack(stack.length - 3))
                val e2 = num(stack(stack.length - 2))
                val f2 = num(stack.last)
                // CTM' = M × CTM (PDF premultiplies the new matrix)
                val na = a * ca + b2 * cc
                val nb = a * cb + b2 * cd
                val nc = c2 * ca + d2 * cc
                val nd = c2 * cb + d2 * cd
                val ne = e2 * ca + f2 * cc + ce
                val nf = e2 * cb + f2 * cd + cf
                ca = na; cb = nb; cc = nc; cd = nd; ce = ne; cf = nf
              }
              stack.clear()
            case "Do" =>
              // form-XObject invocation: the callback recurses into the
              // form's own content/resources and returns its runs already
              // mapped through the form /Matrix (image XObjects: empty);
              // the invoker's CTM at the Do site then applies on top
              stack.lastOption.foreach {
                case PName(n) =>
                  val sub = onDo(n)
                  if (sub.nonEmpty) {
                    requireAxisCtm()
                    runs ++= sub.map(r =>
                      RawRun(mapX(r.x), mapY(r.yUp), r.fs * ctmScale, r.text))
                  }
                case _ => ()
              }
              stack.clear()
            case "Tj" =>
              stack.lastOption.foreach { case PStr(s) => emit(s); case _ => () }
              stack.clear()
            case "'" =>
              ty -= leading * md; cursorX = lineX
              stack.lastOption.foreach { case PStr(s) => emit(s); case _ => () }
              stack.clear()
            case "\"" =>
              // ISO 32000-1 Table 107: `aw ac string "` sets word spacing
              // (Tw) and char spacing (Tc) as PERSISTENT text state before
              // showing — they stay in force for subsequent shows too
              ty -= leading * md; cursorX = lineX
              if (stack.length >= 3) {
                tw = num(stack(stack.length - 3))
                tc = num(stack(stack.length - 2))
              }
              stack.lastOption.foreach { case PStr(s) => emit(s); case _ => () }
              stack.clear()
            case "TJ" =>
              stack.lastOption.foreach {
                case PArr(items) =>
                  items.foreach {
                    case PStr(s)   => emit(s)
                    case PNum(adj) => cursorX -= adj / 1000.0 * fs * th * ma
                    case _         => ()
                  }
                case _ => ()
              }
              stack.clear()
            case _ => stack.clear() // any other operator: operands consumed
          }
        }
      }
    }
    runs.result()
  }

  /** Map PDF-space runs into the layout pipeline's page model:
    *   - shift by the /MediaBox lower-left corner (cropped pages carry a
    *     nonzero origin) and flip y downward;
    *   - normalize the whole page by the DOMINANT font size (weighted by
    *     character count) so one char advances CharWidth px — the advance
    *     model the downstream heavy sweep joins runs with. Mixed-size runs
    *     off the dominant size keep proportional geometry; exact per-glyph
    *     metrics for proportional fonts are out of subset (the reference
    *     gets them from PyMuPDF).
    */
  private def toPage(
      raw: Vector[RawRun],
      llx: Double,
      lly: Double,
      w: Double,
      h: Double): PdfExtractor.Page = {
    val dominant: Double =
      if (raw.isEmpty) 10.0
      else
        raw
          .groupBy(_.fs)
          .view
          .mapValues(_.map(_.text.length).sum)
          .maxBy { case (sz, chars) => (chars, -sz) }
          ._1
    val scale =
      if (dominant <= 0) 1.0
      else PdfExtractor.CharWidth / (dominant * FixedPitchEm)
    val runs = raw.map { r =>
      PdfExtractor.Run(
        math.round((r.x - llx) * scale).toInt,
        math.round((h - (r.yUp - lly)) * scale).toInt, // flip to downward-y
        r.text)
    }
    PdfExtractor.Page(
      math.max(1, math.round(w * scale).toInt),
      math.max(1, math.round(h * scale).toInt),
      runs)
  }

  /** Parse a real-PDF payload into the layout pipeline's page model.
    * Any structural error is contained as a `Left(reason)` failure row.
    */
  def parsePages(payload: Array[Byte]): Either[String, Vector[PdfExtractor.Page]] =
    try {
      // NOTE: no payload-length tick here — PdfExtractor.parse charged the
      // payload before routing; double-charging would make real containers
      // pay twice the budget of synthetic ones for the same bytes (B3)
      val doc = new Doc(payload)
      val cmapCache = mutable.Map.empty[Obj, ToUniCMap]
      val encWidthCache = mutable.Map.empty[Obj, Int]
      // forms carrying their OWN /Resources are invoker-independent: a
      // page stamping the same form N times (tiled watermark, table-row
      // template) decodes and parses it once, and the work budget is
      // charged once instead of N times (review finding)
      val formRunsCache = mutable.Map.empty[Obj, Vector[RawRun]]
      /** Runs of a content stream, recursing through form-XObject `Do`
        * invocations: the form's own /Resources (invoker's when absent),
        * axis-aligned /Matrix applied to positions/advance — the common
        * y-flip supported via |d|, mirrors/rotations loud — cycle- and
        * depth-guarded via the UNRESOLVED entry object (PRef identity).
        * Resources resolve LAZILY so malformed-but-unused /Font or
        * /XObject entries never fail a page that shows no text through
        * them. Image XObjects contribute no text.
        */
      def runsFor(
          content: Array[Byte],
          fontsF: () => Map[String, FontDec],
          xobjsF: () => Map[String, Obj],
          depth: Int,
          active: Set[Obj]): Vector[RawRun] =
        runsOf(content, fontsF, onDo = { name =>
          xobjsF().get(name) match {
            case None => Vector.empty // undeclared name: nothing to draw
            case Some(entry) =>
              if (active.contains(entry)) throw PdfError("form_xobject_cycle")
              if (depth >= 8) throw PdfError("form_xobject_too_deep")
              def compute(): Vector[RawRun] = doc.resolve(entry) match {
                case s @ PStream(d, _) =>
                  doc.resolve(d.get("Subtype").getOrElse(PNull)) match {
                    case PName("Form") =>
                      val inner = decodeStream(d, s.raw, doc.resolve)
                      graft.util.StepBudget.tick(inner.length.toLong)
                      val (fFonts, fXobjs): (() => Map[String, FontDec], () => Map[String, Obj]) =
                        doc.resolve(d.get("Resources").getOrElse(PNull)) match {
                          case rd: PDict =>
                            (() => fontsOfRes(doc.resolve, rd, cmapCache, encWidthCache),
                              () => xobjectsOfRes(doc.resolve, rd))
                          case PNull => (fontsF, xobjsF)
                          case other => throw PdfError(s"bad_resources:$other")
                        }
                      val sub = runsFor(inner, fFonts, fXobjs, depth + 1, active + entry)
                      doc.resolve(d.get("Matrix").getOrElse(PNull)) match {
                        case PNull => sub
                        case PArr(Vector(a0, b0, c0, d0, e0, f0)) =>
                          def n(o: Obj) = doc.resolve(o) match {
                            case PNum(v) => v
                            case other   => throw PdfError(s"bad_form_matrix:$other")
                          }
                          val a = n(a0); val b2 = n(b0); val c2 = n(c0)
                          val dd = n(d0); val e = n(e0); val f = n(f0)
                          // same discipline as the CTM: y-flip fine via
                          // |dd|, skew/mirror/degenerate scale loud
                          if (math.abs(b2) > 1e-9 || math.abs(c2) > 1e-9 ||
                            a <= 1e-9 || math.abs(dd) <= 1e-9)
                            throw PdfError("rotated_form_unsupported")
                          if (a == 1.0 && dd == 1.0 && e == 0.0 && f == 0.0) sub
                          else
                            sub.map(r => RawRun(
                              a * r.x + e, dd * r.yUp + f,
                              r.fs * (a + math.abs(dd)) / 2, r.text))
                        case other => throw PdfError(s"bad_form_matrix:$other")
                      }
                    case _ => Vector.empty // Image/other subtypes: no text
                  }
                case _ => throw PdfError("bad_xobject")
              }
              // cache only invoker-independent forms (own /Resources):
              // inherited-resource forms depend on the caller's maps
              val cacheable = doc.resolve(entry) match {
                case PStream(d, _) =>
                  doc.resolve(d.get("Resources").getOrElse(PNull)).isInstanceOf[PDict]
                case _ => false
              }
              if (cacheable) formRunsCache.getOrElseUpdate(entry, compute())
              else compute()
          }
        })
      val pages = doc.pages().map { case (page, inherited) =>
        val mb = doc.resolve(
          page.get("MediaBox").orElse(inherited.get("MediaBox")).getOrElse(PNull))
        val (llx, lly, w, h) = mb match {
          case PArr(Vector(a, b, c, d)) =>
            def n(o: Obj) = doc.resolve(o) match {
              case PNum(v) => v
              case other   => throw PdfError(s"bad_mediabox_entry:$other")
            }
            (n(a), n(b), n(c) - n(a), n(d) - n(b))
          case _ => (0.0, 0.0, 612.0, 792.0)
        }
        val content = doc.contentBytes(page)
        graft.util.StepBudget.tick(content.length.toLong)
        lazy val res = resourcesOf(doc.resolve, page, inherited)
        val fontsF = () =>
          res.map(r => fontsOfRes(doc.resolve, r, cmapCache, encWidthCache))
            .getOrElse(Map.empty)
        val xobjsF = () =>
          res.map(r => xobjectsOfRes(doc.resolve, r)).getOrElse(Map.empty)
        toPage(runsFor(content, fontsF, xobjsF, 0, Set.empty), llx, lly, w, h)
      }
      if (pages.isEmpty) Left("pdf_no_pages") else Right(pages)
    } catch {
      // the row work budget must propagate: the extractor turns it into a
      // `timeout:step_budget` failure row (B3), never a parse error
      case e: graft.util.StepBudget.Exceeded => throw e
      case PdfError(reason)                  => Left(s"pdf_$reason")
      case _: StackOverflowError             => Left("pdf_structure_too_deep")
      case e: Exception => Left(s"pdf_parse_error:${e.getClass.getSimpleName}")
    }
}
