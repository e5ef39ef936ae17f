package graft.extract

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property tests over the standard-security-handler primitives — the
  * algebraic invariants that must hold for ANY password/key/data, beyond
  * the fixture round trips in PdfContainerSpec.
  */
object PdfCryptoProps extends Properties("PdfCrypto") {

  private val bytesGen: Gen[Array[Byte]] =
    Gen.chooseNum(0, 200).flatMap(n => Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte)))
      .map(_.toArray)
  private val keyGen: Gen[Array[Byte]] =
    Gen.chooseNum(5, 16).flatMap(n => Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte)))
      .map(_.toArray)
  private val key16Gen: Gen[Array[Byte]] =
    Gen.listOfN(16, Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray)
  private val pwdGen: Gen[String] = Gen.chooseNum(0, 40)
    .flatMap(n => Gen.listOfN(n, Gen.chooseNum(32, 126).map(_.toChar)))
    .map(_.mkString)

  property("RC4 is an involution under the same key") =
    forAll(keyGen, bytesGen) { (key, data) =>
      java.util.Arrays.equals(PdfCrypto.rc4(key, PdfCrypto.rc4(key, data)), data)
    }

  property("AES-CBC encrypt/decrypt round-trips any data") =
    forAll(key16Gen, key16Gen, bytesGen) { (key, iv, data) =>
      val enc = PdfCrypto.aesEncrypt(key, iv, data)
      enc.length % 16 == 0 && enc.length >= 32 &&
      java.util.Arrays.equals(PdfCrypto.aesDecrypt(key, enc), data)
    }

  property("padPassword is 32 bytes prefixed by the password") =
    forAll(pwdGen) { pwd =>
      val raw = pwd.getBytes("ISO-8859-1")
      val p = PdfCrypto.padPassword(raw)
      p.length == 32 && p.take(math.min(32, raw.length)).sameElements(raw.take(32))
    }

  property("derived key authenticates its own /U; wrong password rejected") =
    forAll(pwdGen.suchThat(_.nonEmpty), pwdGen, Gen.oneOf(2, 3, 4)) { (owner, user, r) =>
      val id0 = PdfCrypto.md5("prop-id".getBytes)
      val keyLen = if (r == 2) 5 else 16
      val ownerB = owner.getBytes("ISO-8859-1")
      val userB = user.getBytes("ISO-8859-1")
      val o = PdfCrypto.computeO(ownerB, userB, r, keyLen)
      val key = PdfCrypto.computeKey(userB, o, -44, id0, r, keyLen, encryptMetadata = true)
      val u = PdfCrypto.computeU(key, id0, r)
      // PREpend: passwords truncate to 32 bytes (Algorithm 2 step a), so
      // appending to a >=32-char password would not change the padded form
      val wrongKey = PdfCrypto.computeKey(
        ("x" + user).getBytes("ISO-8859-1"), o, -44, id0, r, keyLen, encryptMetadata = true)
      PdfCrypto.verifyU(key, id0, r, u) && !PdfCrypto.verifyU(wrongKey, id0, r, u)
    }

  property("objectKey: min(keyLen+5,16) bytes, unique per object, AES-salted") =
    forAll(keyGen, Gen.chooseNum(1, 1 << 20), Gen.chooseNum(0, 65535)) { (key, num, gen) =>
      val k = PdfCrypto.objectKey(key, num, gen, aes = false)
      k.length == math.min(key.length + 5, 16) &&
      !java.util.Arrays.equals(k, PdfCrypto.objectKey(key, num + 1, gen, aes = false)) &&
      !java.util.Arrays.equals(k, PdfCrypto.objectKey(key, num, gen, aes = true))
    }

  property("aesDecrypt is loud on malformed shapes") = {
    val key = Array.fill[Byte](16)(7)
    Seq(Array.emptyByteArray, new Array[Byte](16), new Array[Byte](33)).forall { bad =>
      try { PdfCrypto.aesDecrypt(key, bad); false }
      catch { case e: PdfContainer.PdfError => e.reason.startsWith("encrypted_bad_aes") }
    }
  }
}
