package graft.core

/** Minimal recursive-descent JSON parser (RFC 8259) for embedded-metadata
  * extraction (JSON-LD blocks, WAT-style sidecars). Values map to plain
  * Scala: Map[String, Any], Vector[Any], String, Double, Boolean, null.
  *
  * Depth- and error-bounded for untrusted web content: malformed input
  * returns None (never throws), nesting beyond `MaxDepth` is rejected
  * (stack-safety against `[[[[…` bombs). Numbers parse as Double (JSON
  * interop semantics); strings decode the standard escapes incl.
  * \\uXXXX surrogate pairs. */
object MiniJson {

  val MaxDepth = 64

  def parse(s: String): Option[Any] = {
    val p = new P(s)
    try {
      p.ws()
      val v = p.value(0)
      p.ws()
      if (p.pos == s.length) Some(v) else None
    } catch { case _: JsonErr | _: StackOverflowError => None }
  }

  private final class JsonErr extends RuntimeException(null, null, false, false)

  private final class P(s: String) {
    var pos = 0
    private def fail(): Nothing = throw new JsonErr
    private def peek: Char = if (pos < s.length) s.charAt(pos) else fail()
    private def next(): Char = { val c = peek; pos += 1; c }
    def ws(): Unit =
      while (pos < s.length && (s.charAt(pos) == ' ' || s.charAt(pos) == '\t' ||
        s.charAt(pos) == '\n' || s.charAt(pos) == '\r')) pos += 1

    def value(depth: Int): Any = {
      if (depth > MaxDepth) fail()
      peek match {
        case '{' => obj(depth)
        case '[' => arr(depth)
        case '"' => str()
        case 't' => lit("true", true)
        case 'f' => lit("false", false)
        case 'n' => lit("null", null)
        case c if c == '-' || (c >= '0' && c <= '9') => num()
        case _ => fail()
      }
    }

    private def lit(word: String, v: Any): Any = {
      if (!s.startsWith(word, pos)) fail()
      pos += word.length; v
    }

    private def obj(depth: Int): Map[String, Any] = {
      pos += 1; ws()
      val b = Map.newBuilder[String, Any]
      if (peek == '}') { pos += 1; return b.result() }
      while (true) {
        ws()
        if (peek != '"') fail()
        val k = str(); ws()
        if (next() != ':') fail()
        ws()
        b += k -> value(depth + 1)
        ws()
        next() match {
          case ',' => ()
          case '}' => return b.result()
          case _   => fail()
        }
      }
      b.result() // unreachable
    }

    private def arr(depth: Int): Vector[Any] = {
      pos += 1; ws()
      val b = Vector.newBuilder[Any]
      if (peek == ']') { pos += 1; return b.result() }
      while (true) {
        ws()
        b += value(depth + 1)
        ws()
        next() match {
          case ',' => ()
          case ']' => return b.result()
          case _   => fail()
        }
      }
      b.result() // unreachable
    }

    private def str(): String = {
      if (next() != '"') fail()
      val sb = new java.lang.StringBuilder
      while (true) {
        next() match {
          case '"' => return sb.toString
          case '\\' => next() match {
            case '"'  => sb.append('"')
            case '\\' => sb.append('\\')
            case '/'  => sb.append('/')
            case 'b'  => sb.append('\b')
            case 'f'  => sb.append('\f')
            case 'n'  => sb.append('\n')
            case 'r'  => sb.append('\r')
            case 't'  => sb.append('\t')
            case 'u'  =>
              if (pos + 4 > s.length) fail()
              val h = s.substring(pos, pos + 4)
              if (!h.forall(c => Character.digit(c, 16) >= 0)) fail()
              sb.append(Integer.parseInt(h, 16).toChar)
              pos += 4
            case _ => fail()
          }
          case c if c < ' ' => fail() // raw control chars are invalid JSON
          case c => sb.append(c)
        }
      }
      sb.toString // unreachable
    }

    private def num(): Double = {
      val start = pos
      if (peek == '-') pos += 1
      while (pos < s.length && { val c = s.charAt(pos)
        (c >= '0' && c <= '9') || c == '.' || c == 'e' || c == 'E' || c == '+' || c == '-' }) pos += 1
      val t = s.substring(start, pos)
      if (t.isEmpty) fail()
      try t.toDouble catch { case _: NumberFormatException => fail() }
    }
  }
}
