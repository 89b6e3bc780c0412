package graft.core.html

/** Declared-vs-actual charset audit — the mojibake early-warning a crawl
  * corpus runs BEFORE extraction trusts [[HtmlExtract.decodeBytes]]'s
  * routing. Pages that declare latin-1 while shipping valid UTF-8 bytes
  * double-decode into Ã©-style artifacts downstream; pages that declare
  * nothing and fail UTF-8 validation fall to the Latin-1 guess. Both are
  * flagged here per payload so the text_mojibake repair can be targeted
  * instead of corpus-wide. Per-row byte walk, zero shuffle.
  */
object CharsetAudit {

  final case class Audit(declared: String,    // meta charset, '' if none
                         bom: String,         // utf-8 | utf-16le | utf-16be | ''
                         validUtf8: Boolean,  // bytes decode cleanly as UTF-8
                         route: String,       // decodeBytes' actual routing
                         mismatch: Boolean)

  /** Strict UTF-8 validation without allocating the decoded string. */
  private[graft] def isValidUtf8(bytes: Array[Byte]): Boolean = {
    var i = 0
    val n = bytes.length
    while (i < n) {
      val b = bytes(i) & 0xFF
      val len =
        if (b < 0x80) 1
        else if (b >= 0xC2 && b <= 0xDF) 2
        else if (b >= 0xE0 && b <= 0xEF) 3
        else if (b >= 0xF0 && b <= 0xF4) 4
        else return false
      if (i + len > n) return false
      var j = 1
      while (j < len) {
        val c = bytes(i + j) & 0xFF
        if (c < 0x80 || c > 0xBF) return false
        // reject overlong/surrogate/out-of-range second bytes
        if (j == 1) {
          if (b == 0xE0 && c < 0xA0) return false
          if (b == 0xED && c > 0x9F) return false
          if (b == 0xF0 && c < 0x90) return false
          if (b == 0xF4 && c > 0x8F) return false
        }
        j += 1
      }
      i += len
    }
    true
  }

  private def declaredCharset(bytes: Array[Byte]): String = {
    val head = new String(bytes, 0, math.min(2048, bytes.length),
      java.nio.charset.StandardCharsets.ISO_8859_1).toLowerCase(java.util.Locale.ROOT)
    val at = head.indexOf("charset=")
    if (at < 0) return ""
    head.substring(at + 8, math.min(at + 40, head.length))
      .dropWhile(c => c == '"' || c == '\'' || c == ' ')
      .takeWhile(c => c.isLetterOrDigit || c == '-' || c == '_')
  }

  def scan(bytes: Array[Byte]): Audit = {
    val bom =
      if (bytes.length >= 3 && (bytes(0) & 0xFF) == 0xEF &&
        (bytes(1) & 0xFF) == 0xBB && (bytes(2) & 0xFF) == 0xBF) "utf-8"
      else if (bytes.length >= 2 && (bytes(0) & 0xFF) == 0xFF &&
        (bytes(1) & 0xFF) == 0xFE) "utf-16le"
      else if (bytes.length >= 2 && (bytes(0) & 0xFF) == 0xFE &&
        (bytes(1) & 0xFF) == 0xFF) "utf-16be"
      else ""
    val declared = declaredCharset(bytes)
    val valid = isValidUtf8(bytes)
    // decodeBytes' actual routing: declared non-UTF-8 charset wins, else
    // strict UTF-8, else Latin-1 fallback
    val declaredWins = declared.nonEmpty &&
      declared != "utf-8" && declared != "utf8" &&
      (try { java.nio.charset.Charset.forName(declared); true }
       catch { case _: Exception => false })
    val route =
      if (declaredWins) "declared"
      else if (valid) "utf-8"
      else "latin-1"
    // mismatch cases worth flagging:
    //  - declared single-byte charset over bytes that ARE valid UTF-8 with
    //    multibyte content → double-decode mojibake ahead
    //  - no declaration and invalid UTF-8 → the Latin-1 guess is blind
    val hasMultibyte = bytes.exists(b => (b & 0x80) != 0)
    val mismatch =
      (declaredWins && valid && hasMultibyte) ||
      (declared.isEmpty && !valid && bom.isEmpty)
    Audit(declared, bom, valid, route, mismatch)
  }
}
