package graft.core

import java.security.MessageDigest

/** Standard security handler (PDF 32000-1 §7.6.3): RC4 (V1/V2, R2/R3) and
  * AES-128/256 (V4/V5) decryption. The reference corpus fixture
  * `encrypted.pdf` uses /V 2 /R 3 /Length 128 (see /root/repo/FIXTURES.md);
  * passwords are authenticated like PDFium does — user password first, then
  * owner password (reference: tests/test_document.py:106-146 semantics).
  */
object Crypto {

  private val PadBytes: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E, 0x56,
    0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

  def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val s = new Array[Int](256)
    var i = 0
    while (i < 256) { s(i) = i; i += 1 }
    var j = 0
    i = 0
    while (i < 256) {
      j = (j + s(i) + (key(i % key.length) & 0xff)) & 0xff
      val t = s(i); s(i) = s(j); s(j) = t
      i += 1
    }
    val out = new Array[Byte](data.length)
    var x = 0; var y = 0
    var k = 0
    while (k < data.length) {
      x = (x + 1) & 0xff
      y = (y + s(x)) & 0xff
      val t = s(x); s(x) = s(y); s(y) = t
      out(k) = (data(k) ^ s((s(x) + s(y)) & 0xff)).toByte
      k += 1
    }
    out
  }

  private def md5(parts: Array[Byte]*): Array[Byte] = {
    val d = MessageDigest.getInstance("MD5")
    parts.foreach(d.update)
    d.digest()
  }

  private def pad(pwd: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](32)
    val n = math.min(32, pwd.length)
    System.arraycopy(pwd, 0, out, 0, n)
    System.arraycopy(PadBytes, 0, out, n, 32 - n)
    out
  }

  /** Decryption state for one document. V4 security handlers name separate
    * crypt filters for streams (/StmF) and strings (/StrF) — each may be
    * Identity, V2 (RC4) or AESV2/AESV3 — so the two paths are kept apart
    * (§7.6.5). `encryptMetadata=false` additionally exempts /Type /Metadata
    * streams from decryption. */
  final case class Decryptor(fileKey: Array[Byte], revision: Int,
                             streamCfm: String, stringCfm: String,
                             encryptMetadata: Boolean = true) {
    /** Decrypt stream bytes (per /StmF). */
    def decrypt(data: Array[Byte], num: Int, gen: Int): Array[Byte] =
      applyCfm(streamCfm, data, num, gen)
    /** Decrypt string bytes (per /StrF). */
    def decryptString(data: Array[Byte], num: Int, gen: Int): Array[Byte] =
      applyCfm(stringCfm, data, num, gen)

    private def applyCfm(cfm: String, data: Array[Byte], num: Int, gen: Int): Array[Byte] = {
      if (cfm == "Identity") return data
      if (revision >= 5) return aesDecrypt(fileKey, data) // AES-256: key used directly
      val useAes = cfm.startsWith("AESV")
      val ext = new Array[Byte](fileKey.length + (if (useAes) 9 else 5))
      System.arraycopy(fileKey, 0, ext, 0, fileKey.length)
      ext(fileKey.length) = (num & 0xff).toByte
      ext(fileKey.length + 1) = ((num >> 8) & 0xff).toByte
      ext(fileKey.length + 2) = ((num >> 16) & 0xff).toByte
      ext(fileKey.length + 3) = (gen & 0xff).toByte
      ext(fileKey.length + 4) = ((gen >> 8) & 0xff).toByte
      if (useAes) { // sAlT
        ext(fileKey.length + 5) = 0x73; ext(fileKey.length + 6) = 0x41
        ext(fileKey.length + 7) = 0x6c; ext(fileKey.length + 8) = 0x54
      }
      val objKey = md5(ext).take(math.min(fileKey.length + 5, 16))
      if (useAes) aesDecrypt(objKey, data) else rc4(objKey, data)
    }
  }

  private def aesDecrypt(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    if (data.length < 16) return Array.emptyByteArray
    try {
      val cipher = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
      val iv = new javax.crypto.spec.IvParameterSpec(data, 0, 16)
      cipher.init(javax.crypto.Cipher.DECRYPT_MODE,
        new javax.crypto.spec.SecretKeySpec(key, "AES"), iv)
      val out = cipher.doFinal(data, 16, ((data.length - 16) / 16) * 16)
      // strip PKCS#5 padding
      if (out.nonEmpty) {
        val padN = out(out.length - 1) & 0xff
        if (padN >= 1 && padN <= 16 && padN <= out.length) out.dropRight(padN) else out
      } else out
    } catch { case _: Exception => Array.emptyByteArray }
  }

  sealed trait AuthResult
  case object AuthFailed extends AuthResult
  final case class AuthOk(decryptor: Decryptor) extends AuthResult

  /** Authenticate a password against the /Encrypt dict and derive the file key.
    * Tries the password as user password, then as owner password (matching
    * FPDF_LoadDocument behavior). Empty password is the common web-PDF case.
    */
  def authenticate(encrypt: PdfDict, firstId: Array[Byte], password: Array[Byte],
                   resolve: PdfObject => PdfObject): AuthResult = {
    def str(key: String): Array[Byte] = resolve(encrypt(key)) match {
      case PdfString(b) => b
      case _ => Array.emptyByteArray
    }
    def int(key: String, dflt: Int): Int = resolve(encrypt(key)) match {
      case PdfNumber(v) => v.toInt
      case _ => dflt
    }
    val filter = resolve(encrypt("Filter")) match { case PdfName(n) => n; case _ => "" }
    if (filter != "Standard") return AuthFailed
    val v = int("V", 0)
    val r = int("R", 2)
    val o = str("O")
    val u = str("U")
    val p = int("P", -1)
    val lengthBits = int("Length", 40)

    // V4+ crypt-filter indirection (§7.6.5): /StmF names the stream filter,
    // /StrF the string filter; both default to Identity. Each filter dict
    // carries its own /CFM and /Length (bytes per spec; bits tolerated —
    // both spellings occur in the wild).
    def cryptFilterDict(fname: String): Option[PdfDict] =
      resolve(encrypt("CF")) match {
        case cf: PdfDict => resolve(cf(fname)) match { case d: PdfDict => Some(d); case _ => None }
        case _ => None
      }
    def cfmOf(fname: String): String =
      if (fname == "Identity") "Identity"
      else cryptFilterDict(fname).map { d =>
        resolve(d("CFM")) match { case PdfName(m) => m; case _ => "V2" }
      }.getOrElse("Identity")
    def cfLengthBytes(fname: String): Option[Int] =
      cryptFilterDict(fname).flatMap { d =>
        resolve(d("Length")) match {
          case PdfNumber(len) if len > 0 =>
            Some(if (len >= 40) (len / 8).toInt else len.toInt) // >=40 → bits
          case _ => None
        }
      }
    val stmfName = resolve(encrypt("StmF")) match { case PdfName(n) => n; case _ => "Identity" }
    val strfName = resolve(encrypt("StrF")) match { case PdfName(n) => n; case _ => "Identity" }
    val (stmCfm, strCfm) =
      if (v >= 4) (cfmOf(stmfName), cfmOf(strfName)) else ("V2", "V2")

    // Key length: CFM dictates it for AES; V4 RC4 filters carry /Length in
    // the CF dict (the top-level /Length default of 40 bits must NOT win
    // over an AESV2 filter — that would derive a 5-byte AES key and turn
    // every stream into silent empty output).
    def lenForCfm(cfm: String, fname: String): Option[Int] = cfm match {
      case "AESV3" => Some(32)
      case "AESV2" => Some(16)
      case "V2" | "V3" => cfLengthBytes(fname)
      case _ => None
    }
    val keyLen =
      if (v <= 1) 5
      else if (v >= 4)
        lenForCfm(stmCfm, stmfName).orElse(lenForCfm(strCfm, strfName)).getOrElse(lengthBits / 8)
      else lengthBits / 8
    val encMeta = metadataEncrypted(encrypt, resolve)

    if (r >= 5) return authenticateV5(encrypt, password, str, r, stmCfm, strCfm, encMeta)

    def computeKey(pwd: Array[Byte]): Array[Byte] = {
      val d = MessageDigest.getInstance("MD5")
      d.update(pad(pwd))
      d.update(o, 0, math.min(32, o.length))
      d.update(Array((p & 0xff).toByte, ((p >> 8) & 0xff).toByte, ((p >> 16) & 0xff).toByte, ((p >> 24) & 0xff).toByte))
      d.update(firstId)
      if (r >= 4 && !metadataEncrypted(encrypt, resolve)) d.update(Array(0xff.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte))
      var key = d.digest()
      if (r >= 3) {
        var i = 0
        while (i < 50) { key = md5(key.take(keyLen)); i += 1 }
      }
      key.take(keyLen)
    }

    def checkUser(key: Array[Byte]): Boolean = {
      if (r == 2) {
        val expected = rc4(key, PadBytes)
        java.util.Arrays.equals(expected, u.take(32))
      } else {
        var x = md5(PadBytes, firstId)
        x = rc4(key, x)
        var i = 1
        while (i <= 19) {
          val k2 = key.map(b => (b ^ i).toByte)
          x = rc4(k2, x)
          i += 1
        }
        java.util.Arrays.equals(x, u.take(16))
      }
    }

    // 1) try as user password
    val userKey = computeKey(password)
    if (checkUser(userKey)) return AuthOk(Decryptor(userKey, r, stmCfm, strCfm, encMeta))
    // 2) try as owner password: recover user password from O
    val od = MessageDigest.getInstance("MD5")
    od.update(pad(password))
    var okey = od.digest()
    if (r >= 3) { var i = 0; while (i < 50) { okey = md5(okey); i += 1 } }
    val rc4Key = okey.take(keyLen)
    var userPwd = o.take(32)
    if (r == 2) userPwd = rc4(rc4Key, userPwd)
    else {
      var i = 19
      while (i >= 0) {
        val k2 = rc4Key.map(b => (b ^ i).toByte)
        userPwd = rc4(k2, userPwd)
        i -= 1
      }
    }
    // userPwd is now the padded user password; feed through algorithm 2 directly
    val d2 = MessageDigest.getInstance("MD5")
    d2.update(userPwd.take(32))
    d2.update(o, 0, math.min(32, o.length))
    d2.update(Array((p & 0xff).toByte, ((p >> 8) & 0xff).toByte, ((p >> 16) & 0xff).toByte, ((p >> 24) & 0xff).toByte))
    d2.update(firstId)
    if (r >= 4 && !metadataEncrypted(encrypt, resolve)) d2.update(Array(0xff.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte))
    var key2 = d2.digest()
    if (r >= 3) { var i = 0; while (i < 50) { key2 = md5(key2.take(keyLen)); i += 1 } }
    val ownerKey = key2.take(keyLen)
    if (checkUser(ownerKey)) AuthOk(Decryptor(ownerKey, r, stmCfm, strCfm, encMeta)) else AuthFailed
  }

  private def metadataEncrypted(encrypt: PdfDict, resolve: PdfObject => PdfObject): Boolean =
    resolve(encrypt("EncryptMetadata")) match { case PdfBool(b) => b; case _ => true }

  /** AES-256 (R5/R6) authentication, §7.6.4.3.3/4. */
  private def authenticateV5(encrypt: PdfDict, password: Array[Byte],
                             str: String => Array[Byte], r: Int,
                             stmCfm: String, strCfm: String, encMeta: Boolean): AuthResult = {
    val u = str("U"); val o = str("O"); val ue = str("UE"); val oe = str("OE")
    if (u.length < 48) return AuthFailed
    val sha256 = MessageDigest.getInstance("SHA-256")
    def hash(pwd: Array[Byte], salt: Array[Byte], userData: Array[Byte]): Array[Byte] = {
      var k = { sha256.reset(); sha256.update(pwd); sha256.update(salt); sha256.update(userData); sha256.digest() }
      if (r == 6) { // SHA-2 iteration (algorithm 2.B)
        var round = 0
        var done = false
        while (!done) {
          val k1 = new Array[Byte]((pwd.length + k.length + userData.length) * 64)
          var off = 0
          var i = 0
          while (i < 64) {
            System.arraycopy(pwd, 0, k1, off, pwd.length); off += pwd.length
            System.arraycopy(k, 0, k1, off, k.length); off += k.length
            System.arraycopy(userData, 0, k1, off, userData.length); off += userData.length
            i += 1
          }
          val cipher = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
          cipher.init(javax.crypto.Cipher.ENCRYPT_MODE,
            new javax.crypto.spec.SecretKeySpec(k, 0, 16, "AES"),
            new javax.crypto.spec.IvParameterSpec(k, 16, 16))
          val e = cipher.doFinal(k1)
          var mod = 0
          var j = 0
          while (j < 16) { mod += e(j) & 0xff; j += 1 }
          mod %= 3
          k = mod match {
            case 0 => { val d = MessageDigest.getInstance("SHA-256"); d.digest(e) }
            case 1 => { val d = MessageDigest.getInstance("SHA-384"); d.digest(e) }
            case _ => { val d = MessageDigest.getInstance("SHA-512"); d.digest(e) }
          }
          round += 1
          if (round >= 64 && (e(e.length - 1) & 0xff) <= round - 32) done = true
        }
        k.take(32)
      } else k
    }
    val uValidSalt = u.slice(32, 40); val uKeySalt = u.slice(40, 48)
    if (java.util.Arrays.equals(hash(password, uValidSalt, Array.emptyByteArray), u.take(32))) {
      val ik = hash(password, uKeySalt, Array.emptyByteArray)
      val cipher = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
      cipher.init(javax.crypto.Cipher.DECRYPT_MODE,
        new javax.crypto.spec.SecretKeySpec(ik, "AES"),
        new javax.crypto.spec.IvParameterSpec(new Array[Byte](16)))
      val fileKey = cipher.doFinal(ue.take(32))
      return AuthOk(Decryptor(fileKey, r, stmCfm, strCfm, encMeta))
    }
    if (o.length >= 48) {
      val oValidSalt = o.slice(32, 40); val oKeySalt = o.slice(40, 48)
      if (java.util.Arrays.equals(hash(password, oValidSalt, u.take(48)), o.take(32))) {
        val ik = hash(password, oKeySalt, u.take(48))
        val cipher = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
        cipher.init(javax.crypto.Cipher.DECRYPT_MODE,
          new javax.crypto.spec.SecretKeySpec(ik, "AES"),
          new javax.crypto.spec.IvParameterSpec(new Array[Byte](16)))
        val fileKey = cipher.doFinal(oe.take(32))
        return AuthOk(Decryptor(fileKey, r, stmCfm, strCfm, encMeta))
      }
    }
    AuthFailed
  }
}
