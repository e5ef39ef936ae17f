package graft.sources

import java.io.ByteArrayInputStream
import java.sql.Timestamp

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.corpus.WarcGen
import graft.model.RawPage

/** ScalaCheck robustness properties for the WARC reader: arbitrary binary
  * payloads round-trip exactly, and ARBITRARY byte corruption anywhere in
  * an archive never crashes the parser — records degrade to a contained
  * subset with counted errors (the crawled-archive reality).
  */
object WarcProps extends Properties("Warc") {

  private val payloadGen: Gen[Array[Byte]] =
    Gen.chooseNum(1, 2048).flatMap(n =>
      Gen.containerOfN[Array, Byte](n, Gen.choose(Byte.MinValue, Byte.MaxValue)))

  private def rowsOf(payloads: Seq[Array[Byte]]): Seq[RawPage] =
    payloads.zipWithIndex.map { case (p, i) =>
      RawPage(s"https://prop.example/$i", new Timestamp(1767225600000L + i), p, "", "en")
    }

  property("arbitrary binary payloads round-trip byte-exactly (plain and gzip)") =
    forAll(Gen.chooseNum(1, 6).flatMap(n => Gen.listOfN(n, payloadGen)), Gen.oneOf(true, false)) {
      (payloads, gz) =>
        val rows = rowsOf(payloads)
        val r = Warc.parseStream(
          new ByteArrayInputStream(WarcGen.archive(rows, gzip = gz)))
        r.errors == 0 &&
        r.records.length == rows.length &&
        r.records.zip(rows).forall { case (rec, row) =>
          java.util.Arrays.equals(rec.payload, row.html)
        }
    }

  property("random single-byte corruption never crashes; surviving records are a subset") =
    forAll(
      Gen.chooseNum(2, 5).flatMap(n => Gen.listOfN(n, payloadGen)),
      Gen.chooseNum(0, Int.MaxValue),
      Gen.choose(Byte.MinValue, Byte.MaxValue)) { (payloads, posSeed, newByte) =>
      val rows = rowsOf(payloads)
      val bytes = WarcGen.archive(rows, warcinfo = false, withRequests = false)
      val pos = math.abs(posSeed % bytes.length)
      val corrupted = bytes.clone()
      corrupted(pos) = newByte
      val r = Warc.parseStream(new ByteArrayInputStream(corrupted))
      // never throws (reaching here), never invents records
      val urls = rows.map(_.url).toSet
      r.records.length <= rows.length + 1 &&
      r.records.forall(rec => rec.targetUri.isEmpty || urls.contains(rec.targetUri) ||
        // a flipped byte inside the URI header yields a mutated uri: allowed
        rec.targetUri.length <= 64)
    }

  property("random 16-byte hole anywhere never crashes the parser") =
    forAll(
      Gen.chooseNum(2, 4).flatMap(n => Gen.listOfN(n, payloadGen)),
      Gen.chooseNum(0, Int.MaxValue)) { (payloads, posSeed) =>
      val rows = rowsOf(payloads)
      val bytes = WarcGen.archive(rows, gzip = false)
      val pos = math.abs(posSeed % math.max(1, bytes.length - 16))
      val corrupted = bytes.take(pos) ++ bytes.drop(pos + 16)
      val r = Warc.parseStream(new ByteArrayInputStream(corrupted))
      r.records.length <= rows.length
    }
}
