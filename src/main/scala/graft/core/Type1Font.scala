package graft.core

import scala.collection.mutable

/** Classic Type1 font program parser (/FontFile): the Adobe Type 1 Font
  * Format spec — eexec-encrypted private portion, charstring decryption
  * (lenIV), Subrs, and the Type1 charstring language interpreted to glyph
  * outlines/widths. The reference reaches these through FreeType inside
  * PDFium; this is an independent from-spec implementation covering what
  * extraction + rasterization need: per-glyph advance width (hsbw), control
  * box, and flattened contours, plus the font's builtin encoding.
  *
  * seac accented glyphs compose base + shifted accent (StandardEncoding
  * names). Not implemented: hints (pure rendering quality), othersubr hint
  * replacement beyond arg plumbing. Flex (othersubrs 0/1/2) renders the
  * collected points as two cubic curves, the standard minimal treatment. */
final class Type1Font(
    val encoding: Map[Int, String],         // builtin code → glyph name
    charstrings: Map[String, Array[Byte]],  // decrypted charstrings
    subrs: Array[Array[Byte]],
    val fontMatrixScale: Double) {          // usually 0.001

  def hasGlyph(name: String): Boolean = charstrings.contains(name)
  def glyphNames: Set[String] = charstrings.keySet

  private val memo = new java.util.concurrent.ConcurrentHashMap[String, Option[Type1Glyph]]()

  /** Interpret a glyph; results are in FONT units (÷ by 1/fontMatrixScale
    * for em fractions — callers use emContours/emBBox/emAdvance). */
  def glyph(name: String): Option[Type1Glyph] = {
    val cached = memo.get(name)
    if (cached != null) return cached
    val computed = charstrings.get(name).flatMap { cs =>
      try Some(compose(new Type1Interp(subrs).run(cs), 0))
      catch { case _: Exception => None }
    }
    memo.put(name, computed)
    computed
  }

  /** seac composition: the base and accent glyphs are named through
    * StandardEncoding codes; the accent shifts by (adx - asb + base sbx, ady).
    * The sidebearing correction uses adx directly (the common approximation —
    * asb equals the accent's own sidebearing in well-formed fonts). */
  private def compose(g: Type1Glyph, depth: Int): Type1Glyph = g.seac match {
    case Some((_, adx, ady, bchar, achar)) if depth < 3 =>
      val baseName = CffFont.standardName(bchar)
      val accName = CffFont.standardName(achar)
      val baseG = baseName.flatMap(charstrings.get).flatMap { cs =>
        try Some(compose(new Type1Interp(subrs).run(cs), depth + 1)) catch { case _: Exception => None }
      }
      val accG = accName.flatMap(charstrings.get).flatMap { cs =>
        try Some(compose(new Type1Interp(subrs).run(cs), depth + 1)) catch { case _: Exception => None }
      }
      val shifted = accG.map(_.contours.map { c =>
        val a = new Array[Double](c.length)
        var i = 0
        while (i + 1 < c.length) { a(i) = c(i) + adx; a(i + 1) = c(i + 1) + ady; i += 2 }
        a
      }).getOrElse(Vector.empty)
      Type1Glyph(g.width, baseG.map(_.contours).getOrElse(Vector.empty) ++ shifted, None)
    case _ => g
  }

  def emAdvance(name: String): Option[Double] = glyph(name).map(_.width * fontMatrixScale)

  def emBBox(name: String): Option[Rect] = glyph(name).flatMap { g =>
    if (g.contours.isEmpty) None
    else {
      var minX = Double.MaxValue; var minY = Double.MaxValue
      var maxX = Double.MinValue; var maxY = Double.MinValue
      g.contours.foreach { c =>
        var i = 0
        while (i + 1 < c.length) {
          if (c(i) < minX) minX = c(i)
          if (c(i) > maxX) maxX = c(i)
          if (c(i + 1) < minY) minY = c(i + 1)
          if (c(i + 1) > maxY) maxY = c(i + 1)
          i += 2
        }
      }
      val s = fontMatrixScale
      Some(Rect(minX * s, minY * s, maxX * s, maxY * s))
    }
  }

  def emContours(name: String): Vector[Array[Double]] = glyph(name) match {
    case Some(g) =>
      val s = fontMatrixScale
      g.contours.map { c =>
        val a = new Array[Double](c.length)
        var i = 0
        while (i < c.length) { a(i) = c(i) * s; i += 1 }
        a
      }
    case None => Vector.empty
  }
}

final case class Type1Glyph(width: Double, contours: Vector[Array[Double]],
    seac: Option[(Double, Double, Double, Int, Int)] = None) // asb adx ady bchar achar

/** Type1 charstring interpreter (font-unit coordinates). */
private final class Type1Interp(subrs: Array[Array[Byte]]) {
  private val stack = new mutable.ArrayBuffer[Double](32)
  private val ps = new mutable.ArrayBuffer[Double](8) // othersubr result stack
  private var x = 0.0
  private var y = 0.0
  private var width = 0.0
  private var sbx = 0.0
  private val contours = Vector.newBuilder[Array[Double]]
  private var cur = new mutable.ArrayBuffer[Double](64)
  private var seacInfo: Option[(Double, Double, Double, Int, Int)] = None
  private var inFlex = false
  private val flexPts = new mutable.ArrayBuffer[Double](16)
  private var done = false

  private def moveTo(nx: Double, ny: Double): Unit = {
    closeContour()
    x = nx; y = ny
    cur += x += y
  }
  private def lineTo(nx: Double, ny: Double): Unit = {
    if (cur.isEmpty) { cur += x += y }
    x = nx; y = ny
    cur += x += y
  }
  private def curveTo(x1: Double, y1: Double, x2: Double, y2: Double, x3: Double, y3: Double): Unit = {
    if (cur.isEmpty) { cur += x += y }
    val (x0, y0) = (x, y)
    var i = 1
    val n = 8
    while (i <= n) {
      val t = i.toDouble / n
      val mt = 1 - t
      cur += mt * mt * mt * x0 + 3 * mt * mt * t * x1 + 3 * mt * t * t * x2 + t * t * t * x3
      cur += mt * mt * mt * y0 + 3 * mt * mt * t * y1 + 3 * mt * t * t * y2 + t * t * t * y3
      i += 1
    }
    x = x3; y = y3
  }
  private def closeContour(): Unit = {
    if (cur.length >= 4) contours += cur.toArray
    cur = new mutable.ArrayBuffer[Double](64)
  }

  def run(cs: Array[Byte]): Type1Glyph = {
    exec(cs, 0)
    closeContour()
    Type1Glyph(width, contours.result(), seacInfo)
  }

  private def exec(cs: Array[Byte], depth: Int): Unit = {
    if (depth > 10) return
    var i = 0
    while (i < cs.length && !done) {
      val v = cs(i) & 0xff
      if (v >= 32) {
        if (v <= 246) { stack += (v - 139).toDouble; i += 1 }
        else if (v <= 250) { stack += ((v - 247) * 256 + (cs(i + 1) & 0xff) + 108).toDouble; i += 2 }
        else if (v <= 254) { stack += (-(v - 251) * 256 - (cs(i + 1) & 0xff) - 108).toDouble; i += 2 }
        else { // 255: 32-bit
          stack += (((cs(i + 1) & 0xff) << 24) | ((cs(i + 2) & 0xff) << 16) |
            ((cs(i + 3) & 0xff) << 8) | (cs(i + 4) & 0xff)).toDouble
          i += 5
        }
      } else {
        i += 1
        v match {
          case 13 => // hsbw: sbx wx
            if (stack.length >= 2) { sbx = stack(0); width = stack(1); x = sbx; y = 0 }
            stack.clear()
          case 9 => closeContour(); stack.clear() // closepath
          case 1 | 3 => stack.clear() // hstem / vstem
          case 21 => // rmoveto
            if (inFlex) { if (stack.length >= 2) { x += stack(stack.length - 2); y += stack.last; flexPts += x += y } }
            else if (stack.length >= 2) moveTo(x + stack(stack.length - 2), y + stack.last)
            stack.clear()
          case 22 => if (stack.nonEmpty) { if (inFlex) { x += stack.last; flexPts += x += y } else moveTo(x + stack.last, y) }; stack.clear()
          case 4 => if (stack.nonEmpty) { if (inFlex) { y += stack.last; flexPts += x += y } else moveTo(x, y + stack.last) }; stack.clear()
          case 5 => if (stack.length >= 2) lineTo(x + stack(stack.length - 2), y + stack.last); stack.clear()
          case 6 => if (stack.nonEmpty) lineTo(x + stack.last, y); stack.clear()
          case 7 => if (stack.nonEmpty) lineTo(x, y + stack.last); stack.clear()
          case 8 => // rrcurveto
            if (stack.length >= 6) {
              val b = stack.length - 6
              val x1 = x + stack(b); val y1 = y + stack(b + 1)
              val x2 = x1 + stack(b + 2); val y2 = y1 + stack(b + 3)
              curveTo(x1, y1, x2, y2, x2 + stack(b + 4), y2 + stack(b + 5))
            }
            stack.clear()
          case 30 => // vhcurveto: dy1 dx2 dy2 dx3
            if (stack.length >= 4) {
              val b = stack.length - 4
              val x1 = x; val y1 = y + stack(b)
              val x2 = x1 + stack(b + 1); val y2 = y1 + stack(b + 2)
              curveTo(x1, y1, x2, y2, x2 + stack(b + 3), y2)
            }
            stack.clear()
          case 31 => // hvcurveto: dx1 dx2 dy2 dy3
            if (stack.length >= 4) {
              val b = stack.length - 4
              val x1 = x + stack(b); val y1 = y
              val x2 = x1 + stack(b + 1); val y2 = y1 + stack(b + 2)
              curveTo(x1, y1, x2, y2, x2, y2 + stack(b + 3))
            }
            stack.clear()
          case 10 => // callsubr
            if (stack.nonEmpty) {
              val idx = stack.remove(stack.length - 1).toInt
              if (idx >= 0 && idx < subrs.length) exec(subrs(idx), depth + 1)
            }
          case 11 => return // return
          case 14 => done = true // endchar
          case 12 =>
            val v2 = cs(i) & 0xff
            i += 1
            v2 match {
              case 12 => // div
                if (stack.length >= 2) {
                  val b2 = stack.remove(stack.length - 1)
                  val a2 = stack.remove(stack.length - 1)
                  stack += (if (b2 != 0) a2 / b2 else 0.0)
                }
              case 6 => // seac: asb adx ady bchar achar (accent composition)
                if (stack.length >= 5) {
                  val b5 = stack.length - 5
                  seacInfo = Some((stack(b5), stack(b5 + 1), stack(b5 + 2),
                    stack(b5 + 3).toInt, stack(b5 + 4).toInt))
                }
                stack.clear(); done = true
              case 7 => // sbw: sbx sby wx wy
                if (stack.length >= 4) { sbx = stack(0); width = stack(2); x = sbx; y = stack(1) }
                stack.clear()
              case 16 => // callothersubr: args... n idx
                if (stack.length >= 2) {
                  val idx = stack.remove(stack.length - 1).toInt
                  val n = stack.remove(stack.length - 1).toInt
                  val args = (0 until math.min(n, stack.length)).map(_ => stack.remove(stack.length - 1)).reverse
                  idx match {
                    case 1 => inFlex = true; flexPts.clear()
                    case 0 => // flex end: draw two curves from the 7 collected points
                      inFlex = false
                      if (flexPts.length >= 16) {
                        // points 1..7 (first is the flex reference); each (x,y)
                        val p = flexPts
                        val b2 = p.length - 14
                        val (sx, sy) = (x, y)
                        val _ = (sx, sy)
                        x = p(b2 - 2); y = p(b2 - 1) // reset to point 0
                        curveTo(p(b2), p(b2 + 1), p(b2 + 2), p(b2 + 3), p(b2 + 4), p(b2 + 5))
                        curveTo(p(b2 + 6), p(b2 + 7), p(b2 + 8), p(b2 + 9), p(b2 + 10), p(b2 + 11))
                      }
                      ps.clear(); ps += y += x // flex returns endpoint coords
                    case 3 => ps.clear(); ps += 3 // hint replacement: dummy subr#
                    case _ => ps.clear(); args.reverse.foreach(ps += _)
                  }
                }
              case 17 => // pop: retrieve othersubr result
                stack += (if (ps.nonEmpty) ps.remove(ps.length - 1) else 0.0)
              case 33 => // setcurrentpoint
                if (stack.length >= 2) { x = stack(stack.length - 2); y = stack.last }
                stack.clear()
              case 0 | 1 | 2 => stack.clear() // dotsection / vstem3 / hstem3
              case _ => stack.clear()
            }
          case 18 | 19 | 20 | 23 => stack.clear() // (Type2 hint ops, defensive)
          case _ => stack.clear()
        }
      }
    }
  }
}

object Type1Font {

  /** eexec / charstring decryption (Type1 spec §7.2). */
  def decrypt(data: Array[Byte], r0: Int, skip: Int): Array[Byte] = {
    var r = r0
    val out = new Array[Byte](math.max(0, data.length - skip))
    var i = 0
    while (i < data.length) {
      val c = data(i) & 0xff
      val p = c ^ (r >> 8)
      r = ((c + r) * 52845 + 22719) & 0xffff
      if (i >= skip) out(i - skip) = p.toByte
      i += 1
    }
    out
  }

  /** Parse a /FontFile stream (cleartext + eexec portion). `len1` = cleartext
    * length (/Length1), `len2` = encrypted length (/Length2); when absent the
    * split is located by the `eexec` keyword. */
  def parse(data: Array[Byte], len1: Int = 0, len2: Int = 0): Option[Type1Font] = {
    try {
      val text = new String(data, java.nio.charset.StandardCharsets.ISO_8859_1)
      val eexecAt = {
        val k = text.indexOf("eexec")
        if (k < 0) return None
        var p = k + 5
        while (p < data.length && (data(p) == '\r' || data(p) == '\n' || data(p) == ' ' || data(p) == '\t')) p += 1
        p
      }
      val clearLen = if (len1 > 0) math.min(len1, eexecAt) else eexecAt
      val clear = text.substring(0, math.min(clearLen, text.length))

      // encrypted portion: binary, or ASCII-hex (spec allows both)
      val encEnd = if (len2 > 0) math.min(eexecAt + len2, data.length) else data.length
      val encRaw = java.util.Arrays.copyOfRange(data, eexecAt, encEnd)
      val isHex = encRaw.take(4).forall(b =>
        (b >= '0' && b <= '9') || (b >= 'a' && b <= 'f') || (b >= 'A' && b <= 'F') ||
          b == '\r' || b == '\n' || b == ' ' || b == '\t')
      val encBytes = if (isHex) {
        val sb = new mutable.ArrayBuffer[Byte](encRaw.length / 2)
        var hi = -1
        encRaw.foreach { b =>
          val d = Character.digit(b.toChar, 16)
          if (d >= 0) {
            if (hi < 0) hi = d
            else { sb += ((hi << 4) | d).toByte; hi = -1 }
          }
        }
        sb.toArray
      } else encRaw
      val priv = decrypt(encBytes, 55665, 4)
      val privText = new String(priv, java.nio.charset.StandardCharsets.ISO_8859_1)

      val lenIV = {
        val m = "/lenIV\\s+(\\d+)".r.findFirstMatchIn(privText)
        m.map(_.group(1).toInt).getOrElse(4)
      }

      // Sequential scans that step OVER each entry's binary payload — a
      // window regex could otherwise match garbage inside charstring bytes.
      // Subrs: "dup <i> <len> RD <bytes> NP"
      val subrsCount = "/Subrs\\s+(\\d+)".r.findFirstMatchIn(privText).map(_.group(1).toInt).getOrElse(0)
      val subrs = Array.fill(subrsCount)(Array.emptyByteArray)
      locally {
        var from = privText.indexOf("/Subrs")
        var found = 0
        val re = "^dup\\s+(\\d+)\\s+(\\d+)\\s+(RD|-\\|) ".r
        while (from >= 0 && found < subrsCount && from < privText.length) {
          val dupAt = privText.indexOf("dup ", from)
          if (dupAt < 0 || dupAt - from > 64) { found = subrsCount } // entries are adjacent
          else re.findFirstMatchIn(privText.substring(dupAt, math.min(privText.length, dupAt + 64))) match {
            case Some(m) =>
              val idx = m.group(1).toInt
              val len = m.group(2).toInt
              val start = dupAt + m.end
              if (idx >= 0 && idx < subrsCount && start + len <= priv.length)
                subrs(idx) = decrypt(java.util.Arrays.copyOfRange(priv, start, start + len), 4330, lenIV)
              found += 1
              from = start + len
            case None => found = subrsCount
          }
        }
      }

      // CharStrings: "/<name> <len> RD <bytes> ND", entries adjacent
      val charstrings = mutable.Map[String, Array[Byte]]()
      locally {
        val csAt = privText.indexOf("/CharStrings")
        var from = if (csAt < 0) privText.length else privText.indexOf("begin", csAt) match {
          case -1 => csAt + 12
          case b => b + 5
        }
        val re = "^/([^\\s/{}()\\[\\]<>]+)\\s+(\\d+)\\s+(RD|-\\|) ".r
        var going = true
        while (going && from < privText.length) {
          val slashAt = privText.indexOf('/', from)
          if (slashAt < 0 || slashAt - from > 64) going = false
          else re.findFirstMatchIn(privText.substring(slashAt, math.min(privText.length, slashAt + 128))) match {
            case Some(m) =>
              val name = m.group(1)
              val len = m.group(2).toInt
              val start = slashAt + m.end
              if (start + len <= priv.length)
                charstrings(name) = decrypt(java.util.Arrays.copyOfRange(priv, start, start + len), 4330, lenIV)
              from = start + len
            case None => going = false
          }
        }
      }
      if (charstrings.isEmpty) return None

      // builtin encoding from the cleartext: "dup <code> /<name> put"
      val encoding = mutable.Map[Int, String]()
      "dup\\s+(\\d+)\\s*/([^\\s/]+)\\s+put".r.findAllMatchIn(clear).foreach { m =>
        encoding(m.group(1).toInt) = m.group(2)
      }

      val scale = {
        val m = "/FontMatrix\\s*\\[\\s*([0-9.eE+-]+)".r.findFirstMatchIn(clear)
        m.map(_.group(1).toDouble).filter(v => v > 0 && v < 1).getOrElse(0.001)
      }
      Some(new Type1Font(encoding.toMap, charstrings.toMap, subrs, scale))
    } catch { case _: Exception => None }
  }
}
