package graft.core

/** Approximate Standard-14 advance widths (units/1000) for documents that
  * reference base fonts without /Widths. Values follow the published Adobe
  * core AFMs for the ASCII range (Helvetica/Times/Courier families); they
  * drive word-gap decisions and fallback charboxes only — no golden output
  * depends on them (fixture fonts are all embedded), so approximation is
  * acceptable and clearly better than a flat default. */
object Standard14 {

  private val helvetica: Map[Char, Int] = {
    val m = Map.newBuilder[Char, Int]
    m ++= Seq(' ' -> 278, '!' -> 278, '"' -> 355, '#' -> 556, '$' -> 556, '%' -> 889,
      '&' -> 667, '\'' -> 191, '(' -> 333, ')' -> 333, '*' -> 389, '+' -> 584,
      ',' -> 278, '-' -> 333, '.' -> 278, '/' -> 278, ':' -> 278, ';' -> 278,
      '<' -> 584, '=' -> 584, '>' -> 584, '?' -> 556, '@' -> 1015,
      '[' -> 278, '\\' -> 278, ']' -> 278, '^' -> 469, '_' -> 556, '`' -> 333,
      '{' -> 334, '|' -> 260, '}' -> 334, '~' -> 584)
    ('0' to '9').foreach(c => m += c -> 556)
    m ++= "ABCDEFGHIJKLMNOPQRSTUVWXYZ".zip(Seq(
      667, 667, 722, 722, 667, 611, 778, 722, 278, 500, 667, 556, 833,
      722, 778, 667, 778, 722, 667, 611, 722, 667, 944, 667, 667, 611))
    m ++= "abcdefghijklmnopqrstuvwxyz".zip(Seq(
      556, 556, 500, 556, 556, 278, 556, 556, 222, 222, 500, 222, 833,
      556, 556, 556, 556, 333, 500, 278, 556, 500, 722, 500, 500, 500))
    m.result()
  }

  private val times: Map[Char, Int] = {
    val m = Map.newBuilder[Char, Int]
    m ++= Seq(' ' -> 250, '!' -> 333, '"' -> 408, '#' -> 500, '$' -> 500, '%' -> 833,
      '&' -> 778, '\'' -> 180, '(' -> 333, ')' -> 333, '*' -> 500, '+' -> 564,
      ',' -> 250, '-' -> 333, '.' -> 250, '/' -> 278, ':' -> 278, ';' -> 278,
      '<' -> 564, '=' -> 564, '>' -> 564, '?' -> 444, '@' -> 921,
      '[' -> 333, '\\' -> 278, ']' -> 333, '^' -> 469, '_' -> 500, '`' -> 333,
      '{' -> 480, '|' -> 200, '}' -> 480, '~' -> 541)
    ('0' to '9').foreach(c => m += c -> 500)
    m ++= "ABCDEFGHIJKLMNOPQRSTUVWXYZ".zip(Seq(
      722, 667, 667, 722, 611, 556, 722, 722, 333, 389, 722, 611, 889,
      722, 722, 556, 722, 667, 556, 611, 722, 722, 944, 722, 722, 611))
    m ++= "abcdefghijklmnopqrstuvwxyz".zip(Seq(
      444, 500, 444, 500, 444, 333, 500, 500, 278, 278, 500, 278, 778,
      500, 500, 500, 500, 333, 389, 278, 500, 500, 722, 500, 500, 444))
    m.result()
  }

  /** Advance width (units/1000) for a base-font family + unicode char, or
    * None when unknown. Courier is fixed-pitch 600. */
  def width(baseFont: String, ch: Char): Option[Int] = {
    val n = baseFont.toLowerCase
    if (n.contains("courier") || n.contains("mono")) Some(600)
    else if (n.contains("times") || n.contains("roman") || n.contains("serif") && !n.contains("sans"))
      times.get(ch).orElse(Some(500))
    else if (n.contains("helvetica") || n.contains("arial") || n.contains("sans"))
      helvetica.get(ch).orElse(Some(556))
    else None
  }
}
