package graft.extract

import java.sql.Timestamp

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.model.RawPage

/** Error-containment fuzz (B4): at crawl scale the payload column contains
  * every kind of garbage — truncated tags, binary noise, fake PDF magic,
  * astral-plane text, empty strings. The kernel contract is that NO input
  * ever throws out of fastExtract/heavyExtract: every row comes back as a
  * DocResult (success or contained failure) with its url intact.
  */
object ContainmentProps extends Properties("Containment") {

  private val cfg = Extractor.Config()

  private val junkBytes: Gen[Array[Byte]] = Gen.frequency(
    3 -> Gen.nonEmptyListOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue)).map(_.toArray),
    2 -> Gen.alphaNumStr.map(s => s"<html><body><p>$s</p>".getBytes("UTF-8")),
    2 -> Gen.alphaNumStr.map(s => s"%PDF-GRAFT 1.0\nP 612 792\nT 50 50 $s".getBytes("UTF-8")),
    1 -> Gen.alphaNumStr.map(s => s"%PDF$s".getBytes("UTF-8")), // magic, bad container
    1 -> Gen.const("<div".getBytes("UTF-8")),
    1 -> Gen.const(Array.emptyByteArray),
    1 -> Gen.const(null: Array[Byte])
  )

  private val junkText: Gen[String] = Gen.frequency(
    3 -> Gen.asciiPrintableStr,
    2 -> Gen.listOf(Gen.chooseNum(0, 0x10ffff).suchThat(c =>
      !(0xd800 <= c && c <= 0xdfff))).map(_.map(Character.toChars(_).mkString).mkString),
    1 -> Gen.const(""),
    1 -> Gen.const(null: String)
  )

  private val rowGen: Gen[RawPage] = for {
    html <- junkBytes
    text <- junkText
    lang <- Gen.oneOf("en", "fr", "de", "el", "la")
  } yield RawPage("https://fuzz.example/doc", new Timestamp(0L), html, text, lang)

  property("fastExtract and heavyExtract never throw; url survives") =
    forAll(rowGen) { row =>
      val fast = Extractor.fastExtract(row, cfg)
      val heavy = Extractor.heavyExtract(row, fast, cfg.copy(forceHeavy = true))
      fast.url == row.url && heavy.url == row.url &&
      (fast.success || (fast.error != null && fast.error.nonEmpty)) &&
      (fast.extracted_text != null) && (heavy.extracted_text != null)
    }

  property("work budget containment holds under fuzz (tiny budget)") =
    forAll(rowGen) { row =>
      val tiny = cfg.copy(maxKernelSteps = 64)
      val d = Extractor.fastExtract(row, tiny)
      // either it finished within budget or it became a contained timeout row
      d.url == row.url && (d.success || d.error != null)
    }
}
