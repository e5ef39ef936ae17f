package graft.extract

import java.nio.charset.StandardCharsets

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties for the heavy PDF sweep: for ANY line texts split
  * into runs at arbitrary positions, with per-continuation-run baseline
  * jitter within YTolerance and run x placed at the exact fixed-pitch
  * advance of its prefix, the heavy engine must reconstruct every original
  * line byte-exactly — the general form of the corpus class-13 recovery the
  * unit tests pin.
  */
object PdfHeavyProps extends Properties("PdfHeavy") {

  private val word: Gen[String] =
    Gen.chooseNum(2, 12).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar)).map(_.mkString)

  private val lineGen: Gen[String] =
    Gen.chooseNum(2, 8).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))

  private case class SplitLine(text: String, cuts: List[Int], jitters: List[Int])

  private val splitLineGen: Gen[SplitLine] = for {
    text <- lineGen
    nCuts <- Gen.chooseNum(0, 4)
    cuts <- Gen.listOfN(nCuts, Gen.chooseNum(1, math.max(1, text.length - 1)))
    jitters <- Gen.listOfN(nCuts + 1, Gen.chooseNum(0, PdfExtractor.YTolerance))
  } yield SplitLine(text, cuts.distinct.sorted.filter(c => c > 0 && c < text.length), jitters)

  private def payload(lines: Seq[SplitLine]): Array[Byte] = {
    val sb = new StringBuilder("%PDF-GRAFT 1.0\nP 612 792\n")
    var y = 50
    lines.foreach { sl =>
      val bounds = (0 +: sl.cuts :+ sl.text.length).distinct.sorted
      val pieces = bounds.sliding(2).collect {
        case Seq(a, b) if b > a => (a, sl.text.substring(a, b))
      }.toVector
      pieces.zipWithIndex.foreach { case ((off, frag), pi) =>
        // first piece sits on the baseline; continuations carry the jitter
        val yy = y + (if (pi == 0) 0 else sl.jitters(pi % sl.jitters.length))
        sb.append(s"T ${50 + PdfExtractor.CharWidth * off} $yy $frag\n")
      }
      y += 40 // uniform advance: median rule joins lines with \n (no breaks)
    }
    sb.toString.getBytes(StandardCharsets.UTF_8)
  }

  property("advance-aware heavy sweep reconstructs split jittered lines") =
    forAll(Gen.chooseNum(1, 6).flatMap(n => Gen.listOfN(n, splitLineGen))) { lines0 =>
      // drop cuts that land right before a space: the parser strips nothing,
      // but a fragment starting with ' ' shifts the advance model by design
      val lines = lines0.map { sl =>
        sl.copy(cuts = sl.cuts.filter(c => sl.text.charAt(c) != ' ' && sl.text.charAt(c - 1) != ' '))
      }
      val ex = PdfExtractor.heavyExtract(payload(lines))
      val got = ex.toOption.get.text
      // uniform 40-px advances: the median-advance paragraph rule sees no
      // jump > 1.5x median, so lines join with single newlines
      val expected = lines.map(_.text).mkString("\n")
      got == expected
    }
}
