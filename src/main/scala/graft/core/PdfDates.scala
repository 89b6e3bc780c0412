package graft.core

/** PDF date-string parsing (ISO 32000-1 §7.9.4, the `D:YYYYMMDDHHmmSSOHH'mm'`
  * form the reference surfaces raw via `metadata["CreationDate"]` —
  * document.py get_metadata_value returns the uninterpreted string; this is
  * the typed projection a corpus timeline needs on top of it).
  *
  * Lenient exactly where the spec is: the `D:` prefix is optional, every
  * field after the year defaults (month/day → 01, time → 00, offset → UTC),
  * and the offset minute quotes may be absent. Strict everywhere else: a
  * field that is present but out of range (month 13, Feb 30, second 61)
  * makes the whole string invalid — no silent clamping, so downstream
  * timeline filters never see fabricated instants.
  */
object PdfDates {

  final case class Parsed(epochSec: Long, tzOffsetMin: Int)

  private val cumDays = Array(0, 31, 59, 90, 120, 151, 181, 212, 243, 273, 304, 334)

  private def isLeap(y: Int): Boolean = (y % 4 == 0 && y % 100 != 0) || y % 400 == 0

  private def daysInMonth(y: Int, m: Int): Int = m match {
    case 2 => if (isLeap(y)) 29 else 28
    case 4 | 6 | 9 | 11 => 30
    case _ => 31
  }

  /** Days from 1970-01-01 to y-m-d (proleptic Gregorian), integer-exact. */
  private def epochDays(y: Int, m: Int, d: Int): Long = {
    // days from year 1 to Jan 1 of year y
    val py = y - 1
    val toYear = py.toLong * 365 + py / 4 - py / 100 + py / 400
    val toMonth = cumDays(m - 1) + (if (m > 2 && isLeap(y)) 1 else 0)
    toYear + toMonth + (d - 1) - 719162L // 719162 = days 0001-01-01..1970-01-01
  }

  /** ISO-8601 parse (the web-metadata sibling of [[parse]]):
    * `YYYY-MM-DD[THH:MM[:SS][Z|±HH:MM]]`, same integer-exact civil-day
    * arithmetic, same range strictness (no clamping). Fractional seconds
    * are accepted and truncated. */
  def parseIso(raw: String): Option[Parsed] = {
    if (raw == null) return None
    val s = raw.trim
    val re = ("^(\\d{4})-(\\d{2})-(\\d{2})" +
      "(?:[Tt ](\\d{2}):(\\d{2})(?::(\\d{2})(?:\\.\\d+)?)?" +
      "(Z|z|[+-]\\d{2}:?\\d{2})?)?$").r
    s match {
      case re(y, mo, d, h, mi, sec, off) =>
        val year = y.toInt; val month = mo.toInt; val day = d.toInt
        if (year < 1 || month < 1 || month > 12) return None
        if (day < 1 || day > daysInMonth(year, month)) return None
        val hour = Option(h).map(_.toInt).getOrElse(0)
        val min = Option(mi).map(_.toInt).getOrElse(0)
        val ss = Option(sec).map(_.toInt).getOrElse(0)
        if (hour > 23 || min > 59 || ss > 59) return None
        val offMin = Option(off) match {
          case Some("Z") | Some("z") | None => 0
          case Some(o) =>
            val sign = if (o.charAt(0) == '-') -1 else 1
            val digits = o.substring(1).replace(":", "")
            val oh = digits.substring(0, 2).toInt
            val om = digits.substring(2, 4).toInt
            if (oh > 23 || om > 59) return None
            sign * (oh * 60 + om)
        }
        Some(Parsed(epochDays(year, month, day) * 86400L +
          hour * 3600L + min * 60L + ss - offMin * 60L, offMin))
      case _ => None
    }
  }

  private val MonthNames = Map(
    "jan" -> 1, "feb" -> 2, "mar" -> 3, "apr" -> 4, "may" -> 5, "jun" -> 6,
    "jul" -> 7, "aug" -> 8, "sep" -> 9, "oct" -> 10, "nov" -> 11, "dec" -> 12)

  /** HTTP-date parse (RFC 7231 §7.1.1.1): IMF-fixdate preferred, obsolete
    * RFC 850 (2-digit year: 70-99 → 19xx else 20xx) and asctime accepted —
    * the third date family a crawl sees (headers), same integer-exact
    * arithmetic and strictness. All HTTP dates are GMT. */
  def parseHttpDate(raw: String): Option[Parsed] = {
    if (raw == null) return None
    val s = raw.trim
    val imf = ("^[A-Za-z]{3}, (\\d{2}) ([A-Za-z]{3}) (\\d{4}) " +
      "(\\d{2}):(\\d{2}):(\\d{2}) GMT$").r
    val rfc850 = ("^[A-Za-z]+, (\\d{2})-([A-Za-z]{3})-(\\d{2}) " +
      "(\\d{2}):(\\d{2}):(\\d{2}) GMT$").r
    val asctime = ("^[A-Za-z]{3} ([A-Za-z]{3}) {1,2}(\\d{1,2}) " +
      "(\\d{2}):(\\d{2}):(\\d{2}) (\\d{4})$").r
    def mk(y: Int, moName: String, d: Int, h: Int, mi: Int, sec: Int): Option[Parsed] = {
      val mo = MonthNames.getOrElse(moName.toLowerCase(java.util.Locale.ROOT), return None)
      if (y < 1 || d < 1 || d > daysInMonth(y, mo)) return None
      if (h > 23 || mi > 59 || sec > 59) return None
      Some(Parsed(epochDays(y, mo, d) * 86400L + h * 3600L + mi * 60L + sec, 0))
    }
    s match {
      case imf(d, mo, y, h, mi, sec) =>
        mk(y.toInt, mo, d.toInt, h.toInt, mi.toInt, sec.toInt)
      case rfc850(d, mo, y2, h, mi, sec) =>
        val y = y2.toInt
        mk(if (y >= 70) 1900 + y else 2000 + y, mo, d.toInt, h.toInt, mi.toInt, sec.toInt)
      case asctime(mo, d, h, mi, sec, y) =>
        mk(y.toInt, mo, d.toInt, h.toInt, mi.toInt, sec.toInt)
      case _ => None
    }
  }

  /** Parse a PDF date string. None = malformed or out-of-range. */
  def parse(raw: String): Option[Parsed] = {
    if (raw == null) return None
    var s = raw.trim
    if (s.startsWith("D:")) s = s.substring(2)
    if (s.length < 4) return None

    var pos = 0
    def digits(k: Int, default: Int): Option[Int] = {
      if (pos >= s.length) Some(default)
      else if (pos + k > s.length) None
      else {
        var v = 0
        var j = pos
        while (j < pos + k) {
          val c = s.charAt(j)
          if (c < '0' || c > '9') return None
          v = v * 10 + (c - '0')
          j += 1
        }
        pos += k
        Some(v)
      }
    }

    val year = digits(4, -1) match { case Some(y) if y >= 1 => y; case _ => return None }
    val month = digits(2, 1) match { case Some(m) => m; case None => return None }
    val day = digits(2, 1) match { case Some(d) => d; case None => return None }
    val hour = digits(2, 0) match { case Some(h) => h; case None => return None }
    val min = digits(2, 0) match { case Some(m) => m; case None => return None }
    val sec = digits(2, 0) match { case Some(x) => x; case None => return None }
    if (month < 1 || month > 12) return None
    if (day < 1 || day > daysInMonth(year, month)) return None
    if (hour > 23 || min > 59 || sec > 59) return None

    var offMin = 0
    if (pos < s.length) {
      val o = s.charAt(pos); pos += 1
      o match {
        case 'Z' =>
          // Z may be followed by 00'00' per some writers; accept and ignore
          ()
        case '+' | '-' =>
          val oh = digits(2, 0) match { case Some(v) => v; case None => return None }
          // spec writes HH'mm' — accept with or without quotes
          if (pos < s.length && s.charAt(pos) == '\'') pos += 1
          val om = digits(2, 0) match { case Some(v) => v; case None => return None }
          if (pos < s.length && s.charAt(pos) == '\'') pos += 1
          if (oh > 23 || om > 59) return None
          offMin = (oh * 60 + om) * (if (o == '-') -1 else 1)
        case _ => return None
      }
    }

    val epoch = epochDays(year, month, day) * 86400L +
      hour * 3600L + min * 60L + sec - offMin * 60L
    Some(Parsed(epoch, offMin))
  }
}
