package graft.extract

import java.security.MessageDigest

/** Standard-security-handler crypto primitives (ISO 32000-1 §7.6.3:
  * Algorithms 2-5) shared by the reader ([[PdfContainer]]: key derivation,
  * empty-user-password verification, per-object decryption) and the fixture
  * writer ([[graft.corpus.RealPdf]]: /O and /U computation, per-object
  * encryption). Sharing the arithmetic is deliberate — the writer is the
  * spec-conformance oracle for the reader, so both sides must agree on the
  * published algorithms, not on each other's bugs; every constant below is
  * from the ISO text (the 32-byte pad string is Table 7.6.3.3's published
  * value).
  *
  * Scope: /V 1/2 (RC4, 40-128 bit), /V 4 with /CFM /V2 (RC4) or /AESV2
  * (AES-128-CBC), /R 2-4, and /V 5 (AES-256) with /R 5 (the deprecated
  * Acrobat-9 SHA-256 hash) or /R 6 (ISO 32000-2 §7.6.4.3.4 Algorithm 2.B
  * hardened hash) — the modern writer default.
  * Reference analogue: PyMuPDF decrypts these transparently
  * (processor.py:76-83 opens such documents without a password).
  */
object PdfCrypto {

  /** The 32-byte password pad (ISO 32000-1 7.6.3.3). */
  val Pad: Array[Byte] = Array(
    0x28, 0xbf, 0x4e, 0x5e, 0x4e, 0x75, 0x8a, 0x41, 0x64, 0x00, 0x4e, 0x56,
    0xff, 0xfa, 0x01, 0x08, 0x2e, 0x2e, 0x00, 0xb6, 0xd0, 0x68, 0x3e, 0x80,
    0x2f, 0x0c, 0xa9, 0xfe, 0x64, 0x53, 0x69, 0x7a).map(_.toByte)

  def md5(parts: Array[Byte]*): Array[Byte] = {
    val d = MessageDigest.getInstance("MD5")
    parts.foreach(d.update)
    d.digest()
  }

  /** Truncate-or-pad a password to exactly 32 bytes (Algorithm 2 step a). */
  def padPassword(pwd: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](32)
    val n = math.min(32, pwd.length)
    System.arraycopy(pwd, 0, out, 0, n)
    System.arraycopy(Pad, 0, out, n, 32 - n)
    out
  }

  /** RC4 (hand-rolled: no provider dependency, ~20 lines, deterministic). */
  def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val s = Array.tabulate(256)(_.toByte)
    var j = 0
    var i = 0
    while (i < 256) {
      j = (j + s(i) + key(i % key.length)) & 0xff
      val t = s(i); s(i) = s(j); s(j) = t
      i += 1
    }
    val out = new Array[Byte](data.length)
    var x = 0; var y = 0; var k = 0
    while (k < data.length) {
      x = (x + 1) & 0xff
      y = (y + s(x)) & 0xff
      val t = s(x); s(x) = s(y); s(y) = t
      out(k) = (data(k) ^ s((s(x) + s(y)) & 0xff)).toByte
      k += 1
    }
    out
  }

  /** Algorithm 2: the file encryption key from the (user) password. `p` is
    * the signed 32-bit /P value, little-endian in the hash input.
    */
  def computeKey(
      userPwd: Array[Byte],
      o: Array[Byte],
      p: Int,
      id0: Array[Byte],
      r: Int,
      keyLen: Int,
      encryptMetadata: Boolean): Array[Byte] = {
    val pBytes = Array[Byte](
      (p & 0xff).toByte, ((p >> 8) & 0xff).toByte,
      ((p >> 16) & 0xff).toByte, ((p >>> 24) & 0xff).toByte)
    val noMeta: Array[Byte] =
      if (r >= 4 && !encryptMetadata) Array.fill(4)(0xff.toByte)
      else Array.emptyByteArray
    var h = md5(padPassword(userPwd), o, pBytes, id0, noMeta)
    if (r >= 3) {
      var i = 0
      while (i < 50) { h = md5(h.take(keyLen)); i += 1 }
    }
    h.take(keyLen)
  }

  /** Algorithm 3: the /O entry from owner + user passwords. */
  def computeO(
      ownerPwd: Array[Byte],
      userPwd: Array[Byte],
      r: Int,
      keyLen: Int): Array[Byte] = {
    var h = md5(padPassword(if (ownerPwd.nonEmpty) ownerPwd else userPwd))
    if (r >= 3) {
      var i = 0
      while (i < 50) { h = md5(h); i += 1 }
    }
    val key = h.take(keyLen)
    var x = rc4(key, padPassword(userPwd))
    if (r >= 3) {
      var i = 1
      while (i <= 19) {
        x = rc4(key.map(b => (b ^ i).toByte), x)
        i += 1
      }
    }
    x
  }

  /** Algorithm 4 (R2) / Algorithm 5 (R>=3): the /U entry from the file key.
    * For R>=3 only the first 16 bytes are significant; the 16-byte tail is
    * zero-padded here (verification compares 16 bytes).
    */
  def computeU(key: Array[Byte], id0: Array[Byte], r: Int): Array[Byte] =
    if (r == 2) rc4(key, Pad)
    else {
      var x = rc4(key, md5(Pad, id0))
      var i = 1
      while (i <= 19) {
        x = rc4(key.map(b => (b ^ i).toByte), x)
        i += 1
      }
      x ++ new Array[Byte](16)
    }

  /** True iff `u` (the file's /U entry) matches the key — i.e. the password
    * that derived `key` is the document's user password.
    */
  def verifyU(key: Array[Byte], id0: Array[Byte], r: Int, u: Array[Byte]): Boolean = {
    val expect = computeU(key, id0, r)
    val n = if (r == 2) 32 else 16
    u.length >= n && java.util.Arrays.equals(expect.take(n), u.take(n))
  }

  /** Algorithm 1 step a/b: the per-object key — MD5 of file key + 3
    * low-order object-number bytes + 2 generation bytes (+ `sAlT` for AES),
    * truncated to min(fileKeyLen + 5, 16).
    */
  def objectKey(key: Array[Byte], num: Int, gen: Int, aes: Boolean): Array[Byte] = {
    val ext = Array[Byte](
      (num & 0xff).toByte, ((num >> 8) & 0xff).toByte, ((num >> 16) & 0xff).toByte,
      (gen & 0xff).toByte, ((gen >> 8) & 0xff).toByte)
    val salt: Array[Byte] =
      if (aes) Array[Byte](0x73, 0x41, 0x6c, 0x54) else Array.emptyByteArray
    md5(key, ext, salt).take(math.min(key.length + 5, 16))
  }

  /** AESV2 decryption: data = 16-byte IV ++ CBC ciphertext, PKCS#7-padded.
    * Malformed shapes (not block-aligned, no room for IV + one block, bad
    * pad byte) are loud — silent truncation would feed garbage downstream.
    */
  def aesDecrypt(objKey: Array[Byte], data: Array[Byte]): Array[Byte] = {
    if (data.length < 32 || (data.length % 16) != 0)
      throw PdfContainer.PdfError(s"encrypted_bad_aes_shape:${data.length}")
    val cipher = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
    cipher.init(
      javax.crypto.Cipher.DECRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(objKey, "AES"),
      new javax.crypto.spec.IvParameterSpec(data.take(16)))
    val plain = cipher.doFinal(data, 16, data.length - 16)
    val padLen = plain(plain.length - 1) & 0xff
    if (padLen < 1 || padLen > 16 || padLen > plain.length)
      throw PdfContainer.PdfError(s"encrypted_bad_aes_pad:$padLen")
    plain.take(plain.length - padLen)
  }

  /** AESV2 encryption (writer side): PKCS#7 pad, CBC, prepend the IV. The
    * IV is caller-supplied so fixtures stay deterministic.
    */
  def aesEncrypt(objKey: Array[Byte], iv: Array[Byte], data: Array[Byte]): Array[Byte] = {
    require(iv.length == 16, "AES IV must be 16 bytes")
    val padLen = 16 - (data.length % 16)
    val padded = data ++ Array.fill(padLen)(padLen.toByte)
    val cipher = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
    cipher.init(
      javax.crypto.Cipher.ENCRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(objKey, "AES"),
      new javax.crypto.spec.IvParameterSpec(iv))
    iv ++ cipher.doFinal(padded)
  }

  // ---- AES-256 standard security handler (/V 5, ISO 32000-2 §7.6.4) -------

  private def sha2(alg: String, parts: Array[Byte]*): Array[Byte] = {
    val d = MessageDigest.getInstance(alg)
    parts.foreach(d.update)
    d.digest()
  }

  /** Raw AES-CBC without padding — the key-wrapping primitive (/UE, /OE:
    * exactly 32 ciphertext bytes, IV fixed to zero per Algorithm 2.A) and
    * the block cipher inside the 2.B hash rounds.
    */
  def aesCbcRaw(key: Array[Byte], iv: Array[Byte], data: Array[Byte], encrypt: Boolean): Array[Byte] = {
    val cipher = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
    cipher.init(
      if (encrypt) javax.crypto.Cipher.ENCRYPT_MODE else javax.crypto.Cipher.DECRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(key, "AES"),
      new javax.crypto.spec.IvParameterSpec(iv))
    cipher.doFinal(data)
  }

  /** The V5 password hash. R5 (Adobe ExtensionLevel 3, deprecated but in
    * the wild from Acrobat 9) is a single SHA-256 over password ++ salt ++
    * udata. R6 is ISO 32000-2 Algorithm 2.B: iterate { K1 = 64 copies of
    * (password ++ K ++ udata); E = AES-128-CBC(key=K[0..16), iv=K[16..32),
    * K1); K = SHA-{256,384,512}(E) picked by (sum of E's first 16 bytes)
    * mod 3 } for at least 64 rounds, stopping when the LAST byte of E
    * (unsigned) <= round - 32; the result is K's first 32 bytes. K1 is
    * always block-aligned (64 × anything is a multiple of 16), so the
    * no-padding cipher never under-runs. `udata` is empty for user-password
    * operations and the full 48-byte /U for owner-password ones.
    */
  def hashV5(r: Int, password: Array[Byte], salt: Array[Byte], udata: Array[Byte]): Array[Byte] = {
    var k = sha2("SHA-256", password, salt, udata)
    if (r == 5) k
    else {
      var round = 0
      var done = false
      while (!done) {
        round += 1
        val unit = password ++ k ++ udata
        val k1 = new Array[Byte](unit.length * 64)
        var i = 0
        while (i < 64) {
          System.arraycopy(unit, 0, k1, i * unit.length, unit.length)
          i += 1
        }
        val e = aesCbcRaw(k.take(16), k.slice(16, 32), k1, encrypt = true)
        var sum = 0
        i = 0
        while (i < 16) { sum += e(i) & 0xff; i += 1 }
        k = (sum % 3) match {
          case 0 => sha2("SHA-256", e)
          case 1 => sha2("SHA-384", e)
          case _ => sha2("SHA-512", e)
        }
        done = round >= 64 && (e(e.length - 1) & 0xff) <= round - 32
      }
      k.take(32)
    }
  }

  /** Algorithm 11 + Algorithm 2.A steps f/g: authenticate `password` as the
    * USER password against the 48-byte /U (32-byte hash ++ 8-byte
    * validation salt ++ 8-byte key salt) and unwrap the 32-byte file key
    * from /UE. None = the password is not the user password (for the empty
    * password that means the document is genuinely locked).
    */
  def recoverKeyV5(r: Int, password: Array[Byte], u: Array[Byte], ue: Array[Byte]): Option[Array[Byte]] = {
    if (u.length < 48 || ue.length != 32) return None
    val expect = hashV5(r, password, u.slice(32, 40), Array.emptyByteArray)
    if (!java.util.Arrays.equals(expect, u.take(32))) None
    else {
      val ik = hashV5(r, password, u.slice(40, 48), Array.emptyByteArray)
      Some(aesCbcRaw(ik, new Array[Byte](16), ue, encrypt = false))
    }
  }

  /** Writer side of Algorithm 8: the /U (hash ++ validation salt ++ key
    * salt) and /UE (file key wrapped under the key-salt hash) entries.
    * Salts are caller-supplied so fixtures stay deterministic.
    */
  def makeUV5(
      r: Int,
      userPwd: Array[Byte],
      fileKey: Array[Byte],
      vsalt: Array[Byte],
      ksalt: Array[Byte]): (Array[Byte], Array[Byte]) = {
    require(vsalt.length == 8 && ksalt.length == 8, "V5 salts are 8 bytes")
    require(fileKey.length == 32, "V5 file key is 32 bytes")
    val u = hashV5(r, userPwd, vsalt, Array.emptyByteArray) ++ vsalt ++ ksalt
    val ik = hashV5(r, userPwd, ksalt, Array.emptyByteArray)
    (u, aesCbcRaw(ik, new Array[Byte](16), fileKey, encrypt = true))
  }

  /** Writer side of Algorithm 9: /O and /OE — same shape as /U but the
    * hash input appends the full 48-byte /U as `udata`.
    */
  def makeOV5(
      r: Int,
      ownerPwd: Array[Byte],
      fileKey: Array[Byte],
      u48: Array[Byte],
      vsalt: Array[Byte],
      ksalt: Array[Byte]): (Array[Byte], Array[Byte]) = {
    require(u48.length == 48, "V5 /U is 48 bytes")
    val o = hashV5(r, ownerPwd, vsalt, u48) ++ vsalt ++ ksalt
    val ik = hashV5(r, ownerPwd, ksalt, u48)
    (o, aesCbcRaw(ik, new Array[Byte](16), fileKey, encrypt = true))
  }

  /** Algorithm 10: the 16-byte /Perms blob — P as a little-endian signed
    * 32-bit value, four 0xFF bytes, 'T'/'F' for /EncryptMetadata, the
    * literal "adb" sentinel, 4 filler bytes — AES-256-ECB encrypted under
    * the file key. The sentinel doubles as the reader's proof that the
    * unwrapped file key actually decrypts.
    */
  def makePermsV5(fileKey: Array[Byte], p: Int, encryptMetadata: Boolean): Array[Byte] = {
    val blob = Array[Byte](
      (p & 0xff).toByte, ((p >> 8) & 0xff).toByte,
      ((p >> 16) & 0xff).toByte, ((p >>> 24) & 0xff).toByte,
      0xff.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte,
      (if (encryptMetadata) 'T' else 'F').toByte,
      'a'.toByte, 'd'.toByte, 'b'.toByte,
      'g'.toByte, 'r'.toByte, 'f'.toByte, 't'.toByte)
    val cipher = javax.crypto.Cipher.getInstance("AES/ECB/NoPadding")
    cipher.init(
      javax.crypto.Cipher.ENCRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(fileKey, "AES"))
    cipher.doFinal(blob)
  }

  /** Reader side of Algorithm 13 (subset): decrypt /Perms and check the
    * "adb" sentinel — a mismatch means the unwrapped key is wrong (a
    * corrupted /UE), which must be loud before it silently decodes every
    * stream to garbage. P/metadata consistency is NOT enforced (writers
    * get those wrong in the wild without affecting extraction).
    */
  def checkPermsV5(fileKey: Array[Byte], perms: Array[Byte]): Boolean = {
    if (perms.length != 16) return false
    val cipher = javax.crypto.Cipher.getInstance("AES/ECB/NoPadding")
    cipher.init(
      javax.crypto.Cipher.DECRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(fileKey, "AES"))
    val blob = cipher.doFinal(perms)
    blob(9) == 'a'.toByte && blob(10) == 'd'.toByte && blob(11) == 'b'.toByte
  }
}
