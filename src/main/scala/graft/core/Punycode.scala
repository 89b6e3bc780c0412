package graft.core

/** Punycode decoding (RFC 3492) for IDN host labels — the homograph-audit
  * primitive: an `xn--` label decodes to the unicode the USER sees, which
  * is what lookalike checks must run on (url_hygiene flags the presence;
  * this reveals the content). Decode only — a crawler never needs to
  * encode. Bounded and total: malformed input returns None, never throws.
  */
object Punycode {

  private val Base = 36
  private val TMin = 1
  private val TMax = 26
  private val Skew = 38
  private val Damp = 700
  private val InitialBias = 72
  private val InitialN = 128

  private def adapt(delta0: Int, numPoints: Int, firstTime: Boolean): Int = {
    var delta = if (firstTime) delta0 / Damp else delta0 / 2
    delta += delta / numPoints
    var k = 0
    while (delta > ((Base - TMin) * TMax) / 2) {
      delta /= Base - TMin
      k += Base
    }
    k + (((Base - TMin + 1) * delta) / (delta + Skew))
  }

  private def digitOf(c: Char): Int =
    if (c >= 'a' && c <= 'z') c - 'a'
    else if (c >= 'A' && c <= 'Z') c - 'A'
    else if (c >= '0' && c <= '9') c - '0' + 26
    else -1

  /** Decode one punycode label BODY (after the `xn--` prefix is stripped). */
  def decodeLabel(input: String): Option[String] = {
    val out = new java.lang.StringBuilder
    val lastDelim = input.lastIndexOf('-')
    var pos = 0
    if (lastDelim > 0) {
      var i = 0
      while (i < lastDelim) {
        val c = input.charAt(i)
        if (c >= 128) return None // basic code points must be ASCII
        out.append(c)
        i += 1
      }
      pos = lastDelim + 1
    }
    var n = InitialN
    var bias = InitialBias
    var idx = 0
    var first = true
    while (pos < input.length) {
      val oldIdx = idx
      var w = 1
      var k = Base
      var done = false
      while (!done) {
        if (pos >= input.length) return None
        val digit = digitOf(input.charAt(pos)); pos += 1
        if (digit < 0) return None
        val ni = idx.toLong + digit.toLong * w
        if (ni > Int.MaxValue) return None
        idx = ni.toInt
        val t = if (k <= bias) TMin else if (k >= bias + TMax) TMax else k - bias
        if (digit < t) done = true
        else {
          val nw = w.toLong * (Base - t)
          if (nw > Int.MaxValue) return None
          w = nw.toInt
          k += Base
        }
      }
      val outLen = out.codePointCount(0, out.length)
      bias = adapt(idx - oldIdx, outLen + 1, first)
      first = false
      val nn = n.toLong + idx / (outLen + 1)
      if (nn > 0x10FFFF) return None
      n = nn.toInt
      idx %= (outLen + 1)
      if (n < 128) return None // basic code points can't be encoded
      // insert code point n at position idx (in code points)
      val insertAt = out.offsetByCodePoints(0, idx)
      out.insert(insertAt, Character.toChars(n))
      idx += 1
    }
    Some(out.toString)
  }

  /** Decode every `xn--` label of a host; non-IDN labels pass through.
    * (host, wasIdn). Malformed labels stay as-is (wasIdn still true). */
  def decodeHost(host: String): (String, Boolean) = {
    var idn = false
    val parts = host.split('.').map { label =>
      val l = label.toLowerCase(java.util.Locale.ROOT)
      if (l.startsWith("xn--")) {
        idn = true
        decodeLabel(l.substring(4)).getOrElse(label)
      } else label
    }
    (parts.mkString("."), idn)
  }

  /** Script-mixing homograph signal over a DECODED host: true when a label
    * mixes Latin letters with Cyrillic/Greek confusables — the classic
    * аpple.com shape. Pure-Cyrillic (legitimately Russian) hosts do NOT
    * flag. */
  def mixedScript(host: String): Boolean =
    host.split('.').exists { label =>
      var latin = false; var confusable = false
      label.foreach { c =>
        if (c >= 'a' && c <= 'z' || c >= 'A' && c <= 'Z') latin = true
        val block = Character.UnicodeBlock.of(c)
        if (block == Character.UnicodeBlock.CYRILLIC ||
            block == Character.UnicodeBlock.GREEK) confusable = true
      }
      latin && confusable
    }
}
