package graft.extract

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.corpus.RealPdf
import graft.corpus.RealPdf.{PageSpec, TextRun}

/** ScalaCheck round-trip properties for the real-PDF container: ANY line
  * texts — including every literal-string metacharacter the writer must
  * escape and the reader must unescape — written through [[RealPdf]] under
  * ANY feature combination (Flate, hex strings, split /Contents, indirect
  * /Length) must come back byte-exactly in reading order through the full
  * [[PdfExtractor.extract]] path.
  */
object PdfContainerProps extends Properties("PdfContainer") {

  // printable Latin-1 incl. the chars that need literal-string escaping;
  // excludes \n/\r (a run is one visual line by construction)
  private val runChar: Gen[Char] = Gen.frequency(
    8 -> Gen.alphaNumChar,
    2 -> Gen.oneOf(' ', '.', ',', ';', '-'),
    2 -> Gen.oneOf('(', ')', '\\', '<', '>', '[', ']', '/', '%', '#'),
    1 -> Gen.choose(0xa1.toChar, 0xff.toChar)
  )

  private val lineText: Gen[String] =
    Gen.chooseNum(1, 60).flatMap(n => Gen.listOfN(n, runChar)).map(_.mkString.trim)

  private case class Shape(
      lines: List[String],
      compress: Boolean,
      split: Boolean,
      indirect: Boolean,
      hex: Boolean,
      transport: Option[String],
      encrypt: Option[RealPdf.Encryption],
      modern: Boolean, // PDF 1.5 xref stream + ObjStm + PNG predictor
      cid: Option[String]) // composite font: Identity-H / UCS2 / UTF16

  // owner-password-only encryption under every supported scheme — the
  // round-6 decryption path composed with every other feature axis
  private val encGen: Gen[Option[RealPdf.Encryption]] = Gen.oneOf(
    None, None, None,
    Some(RealPdf.Encryption.rc4_40("prop-owner")),
    Some(RealPdf.Encryption.rc4_128("prop-owner")),
    Some(RealPdf.Encryption.aes128("prop-owner")),
    Some(RealPdf.Encryption.aes256("prop-owner")),
    Some(RealPdf.Encryption.aes256r5("prop-owner")))

  private val shapeGen: Gen[Shape] = for {
    n <- Gen.chooseNum(1, 12)
    lines <- Gen.listOfN(n, lineText).map(_.filter(_.nonEmpty))
    if lines.nonEmpty
    compress <- Gen.oneOf(true, false)
    split <- Gen.oneOf(true, false)
    indirect <- Gen.oneOf(true, false)
    hex <- Gen.oneOf(true, false)
    // transport filter chained over the (possibly Flate-compressed) body;
    // compress=true + LZW/85 drives high-entropy BINARY through the codecs
    transport <- Gen.oneOf(None, None, Some("ASCIIHexDecode"),
      Some("ASCII85Decode"), Some("RunLengthDecode"), Some("LZWDecode"))
    encrypt <- encGen
    modern <- Gen.oneOf(true, false)
    // composite-font axis: Identity-H (+ToUnicode) or a ToUnicode-free
    // predefined UCS2/UTF16 family — composed with every other feature.
    // CID pages write plain hex codes, so the split/hex/transport axes
    // stay as generated; the writer handles the combination.
    cid <- Gen.oneOf(None, None, None,
      Some("Identity-H"), Some("UniGB-UCS2-H"), Some("UniJIS-UTF16-H"),
      Some("Embedded-2"), Some("Embedded-1"))
  } yield Shape(lines, compress, split, indirect, hex, transport, encrypt, modern, cid)

  property("round trip: any escaped content, any feature combination") =
    forAll(shapeGen) { shape =>
      // 12pt leading: uniform line advance, so no paragraph break fires
      // (breaks need a >1.5x-median jump) and expected text is a plain join
      val runs = shape.lines.zipWithIndex.map { case (t, i) =>
        TextRun(72, 100 + 12 * i, t)
      }
      val pdf = RealPdf.document(
        Seq(PageSpec(
          runs = runs,
          compress = shape.compress,
          splitContents = shape.split,
          indirectLength = shape.indirect,
          hexStrings = shape.hex,
          transport = shape.transport,
          cidFont = shape.cid.isDefined,
          // Identity-H and the embedded-CMap encodings need their
          // ToUnicode CMap; the Uni* predefined families decode
          // ToUnicode-free (the round-6 fallback path)
          cidToUnicode = shape.cid.exists(c =>
            c == "Identity-H" || c.startsWith("Embedded")),
          cidEncoding = shape.cid.getOrElse("Identity-H"))),
        encrypt = shape.encrypt,
        xrefStream = shape.modern,
        objStmPack = shape.modern,
        xrefPredictor = shape.modern)
      val got = PdfExtractor.extract(pdf)
      // the fast sweep joins same-y runs with spaces; distinct y per line
      // here, so equality is exact per line
      got.isRight && got.toOption.get.text == shape.lines.mkString("\n")
    }

  property("multi-page round trip preserves page order and text") =
    forAll(Gen.chooseNum(1, 5), Gen.listOfN(5, lineText)) { (nPages, texts0) =>
      val texts = texts0.map(t => if (t.isEmpty) "x" else t)
      val pages = (0 until nPages).map { p =>
        PageSpec(runs = Seq(TextRun(72, 100, s"p$p ${texts(p % texts.length)}")),
          compress = p % 2 == 0)
      }
      val pdf = RealPdf.document(pages, nestedKids = nPages > 2)
      val got = PdfExtractor.parse(pdf)
      got.isRight && {
        val ps = got.toOption.get
        ps.length == nPages &&
        ps.zipWithIndex.forall { case (pg, i) =>
          pg.runs.nonEmpty && pg.runs.head.text.startsWith(s"p$i ")
        }
      }
    }
}
