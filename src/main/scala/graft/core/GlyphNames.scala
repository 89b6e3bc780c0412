package graft.core

/** Glyph-name → unicode (Adobe Glyph List subset + uniXXXX/uXXXXXX forms) and
  * the Standard/WinAnsi/MacRoman encoding tables (PDF 32000-1 Annex D).
  * Covers the Latin repertoire that simple (non-ToUnicode) web fonts use;
  * anything unmapped degrades to an empty string, matching the reference's
  * errors="ignore" decode policy (textpage.py:85). */
object GlyphNames {

  /** AGL subset: ASCII + Latin-1 + common publishing glyphs. */
  private val agl: Map[String, String] = {
    val b = Map.newBuilder[String, String]
    // letters + digits map to themselves via names
    val named = Seq(
      "space" -> " ", "exclam" -> "!", "quotedbl" -> "\"", "numbersign" -> "#",
      "dollar" -> "$", "percent" -> "%", "ampersand" -> "&", "quotesingle" -> "'",
      "parenleft" -> "(", "parenright" -> ")", "asterisk" -> "*", "plus" -> "+",
      "comma" -> ",", "hyphen" -> "-", "period" -> ".", "slash" -> "/",
      "zero" -> "0", "one" -> "1", "two" -> "2", "three" -> "3", "four" -> "4",
      "five" -> "5", "six" -> "6", "seven" -> "7", "eight" -> "8", "nine" -> "9",
      "colon" -> ":", "semicolon" -> ";", "less" -> "<", "equal" -> "=",
      "greater" -> ">", "question" -> "?", "at" -> "@", "bracketleft" -> "[",
      "backslash" -> "\\", "bracketright" -> "]", "asciicircum" -> "^",
      "underscore" -> "_", "grave" -> "`", "braceleft" -> "{", "bar" -> "|",
      "braceright" -> "}", "asciitilde" -> "~",
      "quoteleft" -> "‘", "quoteright" -> "’", "quotedblleft" -> "“",
      "quotedblright" -> "”", "quotesinglbase" -> "‚", "quotedblbase" -> "„",
      "endash" -> "–", "emdash" -> "—", "bullet" -> "•",
      "ellipsis" -> "…", "dagger" -> "†", "daggerdbl" -> "‡",
      "perthousand" -> "‰", "guilsinglleft" -> "‹", "guilsinglright" -> "›",
      "guillemotleft" -> "«", "guillemotright" -> "»", "florin" -> "ƒ",
      "fraction" -> "⁄", "currency" -> "¤", "cent" -> "¢",
      "sterling" -> "£", "yen" -> "¥", "Euro" -> "€",
      "section" -> "§", "paragraph" -> "¶", "copyright" -> "©",
      "registered" -> "®", "trademark" -> "™", "degree" -> "°",
      "plusminus" -> "±", "multiply" -> "×", "divide" -> "÷",
      "exclamdown" -> "¡", "questiondown" -> "¿",
      "fi" -> "ﬁ", "fl" -> "ﬂ", "ff" -> "ﬀ", "ffi" -> "ﬃ", "ffl" -> "ﬄ",
      "dotlessi" -> "ı", "oe" -> "œ", "OE" -> "Œ", "ae" -> "æ",
      "AE" -> "Æ", "oslash" -> "ø", "Oslash" -> "Ø",
      "germandbls" -> "ß", "eth" -> "ð", "Thorn" -> "Þ", "thorn" -> "þ",
      "Lslash" -> "Ł", "lslash" -> "ł",
      "circumflex" -> "ˆ", "caron" -> "ˇ", "breve" -> "˘",
      "dotaccent" -> "˙", "ring" -> "˚", "ogonek" -> "˛",
      "tilde" -> "˜", "hungarumlaut" -> "˝", "macron" -> "¯",
      "cedilla" -> "¸", "dieresis" -> "¨", "acute" -> "´",
      "brokenbar" -> "¦", "logicalnot" -> "¬", "mu" -> "µ",
      "middot" -> "·", "periodcentered" -> "·", "onesuperior" -> "¹",
      "twosuperior" -> "²", "threesuperior" -> "³", "onequarter" -> "¼",
      "onehalf" -> "½", "threequarters" -> "¾", "minus" -> "−",
      "nbspace" -> " ", "softhyphen" -> "­", "sfthyphen" -> "­")
    b ++= named
    // single letters a..z A..Z map to themselves
    ('a' to 'z').foreach(c => b += c.toString -> c.toString)
    ('A' to 'Z').foreach(c => b += c.toString -> c.toString)
    // accented Latin-1: Aacute etc.
    val accents = Seq("grave" -> "̀", "acute" -> "́", "circumflex" -> "̂",
      "tilde" -> "̃", "dieresis" -> "̈", "ring" -> "̊", "cedilla" -> "̧")
    val accentedPairs = Seq(
      "Agrave" -> "À", "Aacute" -> "Á", "Acircumflex" -> "Â", "Atilde" -> "Ã",
      "Adieresis" -> "Ä", "Aring" -> "Å", "Ccedilla" -> "Ç", "Egrave" -> "È",
      "Eacute" -> "É", "Ecircumflex" -> "Ê", "Edieresis" -> "Ë", "Igrave" -> "Ì",
      "Iacute" -> "Í", "Icircumflex" -> "Î", "Idieresis" -> "Ï", "Ntilde" -> "Ñ",
      "Ograve" -> "Ò", "Oacute" -> "Ó", "Ocircumflex" -> "Ô", "Otilde" -> "Õ",
      "Odieresis" -> "Ö", "Ugrave" -> "Ù", "Uacute" -> "Ú", "Ucircumflex" -> "Û",
      "Udieresis" -> "Ü", "Yacute" -> "Ý", "agrave" -> "à", "aacute" -> "á",
      "acircumflex" -> "â", "atilde" -> "ã", "adieresis" -> "ä", "aring" -> "å",
      "ccedilla" -> "ç", "egrave" -> "è", "eacute" -> "é", "ecircumflex" -> "ê",
      "edieresis" -> "ë", "igrave" -> "ì", "iacute" -> "í", "icircumflex" -> "î",
      "idieresis" -> "ï", "ntilde" -> "ñ", "ograve" -> "ò", "oacute" -> "ó",
      "ocircumflex" -> "ô", "otilde" -> "õ", "odieresis" -> "ö", "ugrave" -> "ù",
      "uacute" -> "ú", "ucircumflex" -> "û", "udieresis" -> "ü", "yacute" -> "ý",
      "ydieresis" -> "ÿ", "scaron" -> "š", "Scaron" -> "Š", "zcaron" -> "ž",
      "Zcaron" -> "Ž", "ydieresis" -> "ÿ")
    val _ = accents
    b ++= accentedPairs
    b.result()
  }

  /** Glyph name → unicode string. Handles uniXXXX[XXXX], uXXXX–uXXXXXX, AGL,
    * and gXX/cidXX (unmappable → None). */
  def toUnicode(glyphName: String): Option[String] = {
    if (glyphName.isEmpty) return None
    val base = glyphName.takeWhile(_ != '.') // "a.sc" → "a"
    if (base.startsWith("uni") && base.length >= 7) {
      val hexes = base.drop(3).grouped(4).toSeq
      if (hexes.forall(h => h.length == 4 && h.forall(isHex))) {
        return Some(hexes.map(h => Integer.parseInt(h, 16).toChar).mkString)
      }
    }
    if (base.startsWith("u") && base.length >= 5 && base.length <= 7 && base.drop(1).forall(isHex)) {
      val cp = Integer.parseInt(base.drop(1), 16)
      return Some(new String(Character.toChars(cp)))
    }
    agl.get(base)
  }

  @inline private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  /** WinAnsiEncoding (CP1252-like). */
  def winAnsi(code: Int): Option[String] = {
    if (code >= 32 && code <= 126) Some(code.toChar.toString)
    else if (code >= 0xA0 && code <= 0xFF) Some(code.toChar.toString)
    else winAnsiHigh.get(code)
  }
  private val winAnsiHigh: Map[Int, String] = Map(
    0x80 -> "€", 0x82 -> "‚", 0x83 -> "ƒ", 0x84 -> "„",
    0x85 -> "…", 0x86 -> "†", 0x87 -> "‡", 0x88 -> "ˆ",
    0x89 -> "‰", 0x8A -> "Š", 0x8B -> "‹", 0x8C -> "Œ",
    0x8E -> "Ž", 0x91 -> "‘", 0x92 -> "’", 0x93 -> "“",
    0x94 -> "”", 0x95 -> "•", 0x96 -> "–", 0x97 -> "—",
    0x98 -> "˜", 0x99 -> "™", 0x9A -> "š", 0x9B -> "›",
    0x9C -> "œ", 0x9E -> "ž", 0x9F -> "Ÿ")

  /** MacRomanEncoding — ASCII range only plus common high cases. */
  def macRoman(code: Int): Option[String] = {
    if (code >= 32 && code <= 126) Some(code.toChar.toString)
    else macHigh.get(code)
  }
  private val macHigh: Map[Int, String] = Map(
    0x80 -> "Ä", 0x81 -> "Å", 0x82 -> "Ç", 0x83 -> "É",
    0x84 -> "Ñ", 0x85 -> "Ö", 0x86 -> "Ü", 0x87 -> "á",
    0x88 -> "à", 0x89 -> "â", 0x8A -> "ä", 0x8B -> "ã",
    0x8C -> "å", 0x8D -> "ç", 0x8E -> "é", 0x8F -> "è",
    0x90 -> "ê", 0x91 -> "ë", 0x92 -> "í", 0x93 -> "ì",
    0x94 -> "î", 0x95 -> "ï", 0x96 -> "ñ", 0x97 -> "ó",
    0x98 -> "ò", 0x99 -> "ô", 0x9A -> "ö", 0x9B -> "õ",
    0x9C -> "ú", 0x9D -> "ù", 0x9E -> "û", 0x9F -> "ü",
    0xA5 -> "•", 0xC9 -> "…", 0xD0 -> "–", 0xD1 -> "—",
    0xD2 -> "“", 0xD3 -> "”", 0xD4 -> "‘", 0xD5 -> "’")

  /** StandardEncoding — ASCII printable range (quotes differ but web PDFs
    * using StandardEncoding for non-ASCII are rare; degrade gracefully). */
  def standard(code: Int): Option[String] =
    if (code >= 32 && code <= 126) Some(code.toChar.toString) else None
}
