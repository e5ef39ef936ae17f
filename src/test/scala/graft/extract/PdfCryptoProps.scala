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

  // ---- AES-256 standard security handler (/V 5) ----------------------------

  private val salt8Gen: Gen[Array[Byte]] =
    Gen.listOfN(8, Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray)
  private val key32Gen: Gen[Array[Byte]] =
    Gen.listOfN(32, Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray)
  private val rV5Gen: Gen[Int] = Gen.oneOf(5, 6)

  property("V5: /U//UE wrap authenticates its password and unwraps the key") =
    forAll(rV5Gen, pwdGen, key32Gen, salt8Gen, salt8Gen) { (r, pwd, fileKey, vs, ks) =>
      val pwdB = pwd.getBytes("UTF-8")
      val (u, ue) = PdfCrypto.makeUV5(r, pwdB, fileKey, vs, ks)
      val back = PdfCrypto.recoverKeyV5(r, pwdB, u, ue)
      // V5 passwords are significant to 127 bytes (vs 32 for the legacy
      // pad), so ANY prefix change is a different password
      val wrong = PdfCrypto.recoverKeyV5(r, ("x" + pwd).getBytes("UTF-8"), u, ue)
      u.length == 48 && ue.length == 32 &&
      back.exists(java.util.Arrays.equals(_, fileKey)) && wrong.isEmpty
    }

  property("V5: /O//OE owner wrap recovers the same file key") =
    forAll(rV5Gen, pwdGen.suchThat(_.nonEmpty), key32Gen, salt8Gen, salt8Gen) {
      (r, owner, fileKey, vs, ks) =>
        val ownerB = owner.getBytes("UTF-8")
        val (u, _) = PdfCrypto.makeUV5(r, Array.emptyByteArray, fileKey, vs, ks)
        val (o, oe) = PdfCrypto.makeOV5(r, ownerB, fileKey, u, vs, ks)
        // owner-side unwrap mirrors Algorithm 12: hash with udata = /U
        val expect = PdfCrypto.hashV5(r, ownerB, o.slice(32, 40), u)
        val ik = PdfCrypto.hashV5(r, ownerB, o.slice(40, 48), u)
        val back = PdfCrypto.aesCbcRaw(ik, new Array[Byte](16), oe, encrypt = false)
        java.util.Arrays.equals(expect, o.take(32)) &&
        java.util.Arrays.equals(back, fileKey)
    }

  property("V5: the R6 hardened hash differs from R5's single SHA-256") =
    forAll(pwdGen, salt8Gen) { (pwd, salt) =>
      val pwdB = pwd.getBytes("UTF-8")
      val h5 = PdfCrypto.hashV5(5, pwdB, salt, Array.emptyByteArray)
      val h6 = PdfCrypto.hashV5(6, pwdB, salt, Array.emptyByteArray)
      h5.length == 32 && h6.length == 32 && !java.util.Arrays.equals(h5, h6)
    }

  property("V5: /Perms round-trips and the adb sentinel gates wrong keys") =
    forAll(key32Gen, key32Gen, Gen.chooseNum(Int.MinValue, Int.MaxValue), Gen.oneOf(true, false)) {
      (fileKey, otherKey, p, meta) =>
        val perms = PdfCrypto.makePermsV5(fileKey, p, meta)
        perms.length == 16 &&
        PdfCrypto.checkPermsV5(fileKey, perms) &&
        // a different key decrypts to a non-"adb" blob (2^-24 collision
        // odds; scalacheck seeds make a flake astronomically unlikely)
        (java.util.Arrays.equals(fileKey, otherKey) || !PdfCrypto.checkPermsV5(otherKey, perms))
    }
}
