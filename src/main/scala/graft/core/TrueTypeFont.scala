package graft.core

/** Minimal sfnt (TrueType) reader: head / maxp / loca / glyf bounding boxes,
  * cmap (formats 0/4/6/12), hhea/hmtx advances, OS/2 weight, name table
  * family. This is the metrics source for tight charboxes (reference
  * textpage.py:196-221; golden first-rect test tests/test_textpage.py:50-69).
  * Parses from the decoded /FontFile2 stream of a font descriptor.
  */
final class TrueTypeFont private (
    data: Array[Byte],
    tables: Map[String, (Int, Int)],
    val unitsPerEm: Int,
    locaLong: Boolean,
    numGlyphs: Int) {

  @inline private def u8(i: Int): Int = data(i) & 0xff
  @inline private def u16(i: Int): Int = ((data(i) & 0xff) << 8) | (data(i + 1) & 0xff)
  @inline private def s16(i: Int): Int = (u16(i) << 16) >> 16
  @inline private def u32(i: Int): Long =
    ((data(i) & 0xffL) << 24) | ((data(i + 1) & 0xffL) << 16) | ((data(i + 2) & 0xffL) << 8) | (data(i + 3) & 0xffL)

  def hasCmap: Boolean = tables.contains("cmap")

  /** charcode→glyph via a cmap subtable of the given platform id (any fmt we
    * support); falls back across encodings within the platform. */
  def cmapLookup(platformId: Int, code: Int): Option[Int] = {
    cmapSubtables.collectFirst {
      case (pid, _, off) if pid == platformId => lookupInSubtable(off, code)
    }.flatten
  }

  private lazy val cmapSubtables: Vector[(Int, Int, Int)] = tables.get("cmap") match {
    case Some((base, _)) =>
      val n = u16(base + 2)
      (0 until n).map { i =>
        val rec = base + 4 + 8 * i
        (u16(rec), u16(rec + 2), base + u32(rec + 4).toInt)
      }.toVector
    case None => Vector.empty
  }

  private def lookupInSubtable(sub: Int, code: Int): Option[Int] = {
    if (sub < 0 || sub + 2 > data.length) return None
    u16(sub) match {
      case 0 =>
        if (code < 0 || code > 255) None
        else { val g = u8(sub + 6 + code); if (g != 0) Some(g) else None }
      case 4 =>
        val segX2 = u16(sub + 6)
        val segs = segX2 / 2
        val endBase = sub + 14
        val startBase = endBase + segX2 + 2
        val deltaBase = startBase + segX2
        val rangeBase = deltaBase + segX2
        var i = 0
        while (i < segs) {
          val end = u16(endBase + 2 * i)
          if (code <= end) {
            val start = u16(startBase + 2 * i)
            if (code < start) return None
            val delta = s16(deltaBase + 2 * i)
            val rngOff = u16(rangeBase + 2 * i)
            val g =
              if (rngOff == 0) (code + delta) & 0xffff
              else {
                val idx = rangeBase + 2 * i + rngOff + 2 * (code - start)
                if (idx + 1 >= data.length) 0
                else {
                  val gi = u16(idx)
                  if (gi == 0) 0 else (gi + delta) & 0xffff
                }
              }
            return if (g != 0) Some(g) else None
          }
          i += 1
        }
        None
      case 6 =>
        val first = u16(sub + 6)
        val cnt = u16(sub + 8)
        if (code >= first && code < first + cnt) {
          val g = u16(sub + 10 + 2 * (code - first))
          if (g != 0) Some(g) else None
        } else None
      case 12 =>
        val nGroups = u32(sub + 12).toInt
        var i = 0
        while (i < nGroups) {
          val g = sub + 16 + 12 * i
          val startC = u32(g).toInt; val endC = u32(g + 4).toInt; val startG = u32(g + 8).toInt
          if (code >= startC && code <= endC) return Some(startG + (code - startC))
          i += 1
        }
        None
      case _ => None
    }
  }

  // glyph bboxes are looked up once per char per document; the font object
  // itself is shared across documents via FontCache, so memoize per glyph
  // (idempotent writes — benign under concurrency)
  private val bboxMemo = new java.util.concurrent.ConcurrentHashMap[Integer, Option[Rect]]()

  /** Glyph bbox in em fractions; None for empty outlines (e.g. space). */
  def glyphBBox(gid: Int): Option[Rect] = {
    if (gid < 0 || gid >= numGlyphs) return None
    val cached = bboxMemo.get(Integer.valueOf(gid))
    if (cached != null) return cached
    val computed = glyphBBoxUncached(gid)
    bboxMemo.put(Integer.valueOf(gid), computed)
    computed
  }

  private def glyphBBoxUncached(gid: Int, depth: Int = 0): Option[Rect] = {
    if (depth > 4) return None
    (tables.get("loca"), tables.get("glyf")) match {
      case (Some((loca, _)), Some((glyf, _))) =>
        val (o1, o2) =
          if (locaLong) (u32(loca + 4 * gid).toInt, u32(loca + 4 * gid + 4).toInt)
          else (u16(loca + 2 * gid) * 2, u16(loca + 2 * gid + 2) * 2)
        if (o1 >= o2) None // empty outline
        else {
          val g = glyf + o1
          if (g + 10 > data.length) None
          else {
            val nContours = s16(g)
            // control box from the outline POINTS (FreeType semantics; the
            // glyf header can lie), then PDFium's TT2PDF normalization:
            // int(v*1000/upem + 0.5) — C truncation toward zero, so -188
            // becomes -187 (golden pageobjects_images.txt pins this)
            @inline def tt2pdf(v: Double): Double =
              (v * 1000.0 / unitsPerEm + 0.5).toInt / 1000.0
            val fromPoints =
              if (nContours >= 0) simpleGlyphCBox(g, nContours)
              else compositeCBox(g, o2 - o1, depth)
            fromPoints.map { case (x0, y0, x1, y1) =>
              Rect(tt2pdf(x0), tt2pdf(y0), tt2pdf(x1), tt2pdf(y1))
            }.orElse(Some(Rect(tt2pdf(s16(g + 2)), tt2pdf(s16(g + 4)), tt2pdf(s16(g + 6)), tt2pdf(s16(g + 8)))))
          }
        }
      case _ => None
    }
  }

  /** Control box of a simple glyph from its point array (sfnt glyf format). */
  private def simpleGlyphCBox(g: Int, nContours: Int): Option[(Double, Double, Double, Double)] = {
    try {
      var p = g + 10
      if (nContours == 0) return None
      val endPts = (0 until nContours).map(i => u16(p + 2 * i))
      val nPoints = endPts.last + 1
      p += 2 * nContours
      val insLen = u16(p); p += 2 + insLen
      // flags (with repeat)
      val flags = new Array[Int](nPoints)
      var i = 0
      while (i < nPoints) {
        val f = u8(p); p += 1
        flags(i) = f; i += 1
        if ((f & 8) != 0) { // repeat
          val rep = u8(p); p += 1
          var r = 0
          while (r < rep && i < nPoints) { flags(i) = f; i += 1; r += 1 }
        }
      }
      var minX = Double.MaxValue; var maxX = Double.MinValue
      var x = 0
      i = 0
      while (i < nPoints) {
        val f = flags(i)
        if ((f & 2) != 0) { val d = u8(p); p += 1; x += (if ((f & 16) != 0) d else -d) }
        else if ((f & 16) == 0) { x += s16(p); p += 2 }
        if (x < minX) minX = x
        if (x > maxX) maxX = x
        i += 1
      }
      var minY = Double.MaxValue; var maxY = Double.MinValue
      var y = 0
      i = 0
      while (i < nPoints) {
        val f = flags(i)
        if ((f & 4) != 0) { val d = u8(p); p += 1; y += (if ((f & 32) != 0) d else -d) }
        else if ((f & 32) == 0) { y += s16(p); p += 2 }
        if (y < minY) minY = y
        if (y > maxY) maxY = y
        i += 1
      }
      Some((minX, minY, maxX, maxY))
    } catch { case _: Exception => None }
  }

  /** Control box of a composite glyph: union of transformed component boxes. */
  private def compositeCBox(g: Int, len: Int, depth: Int): Option[(Double, Double, Double, Double)] = {
    try {
      var p = g + 10
      var minX = Double.MaxValue; var minY = Double.MaxValue
      var maxX = Double.MinValue; var maxY = Double.MinValue
      var more = true
      while (more && p < g + len) {
        val flags = u16(p); val glyphIndex = u16(p + 2); p += 4
        var dx = 0.0; var dy = 0.0
        if ((flags & 1) != 0) { dx = s16(p); dy = s16(p + 2); p += 4 }
        else { dx = (data(p) << 24 >> 24); dy = (data(p + 1) << 24 >> 24); p += 2 }
        var a = 1.0; var b = 0.0; var c = 0.0; var d = 1.0
        if ((flags & 8) != 0) { a = f2dot14(p); d = a; p += 2 }
        else if ((flags & 0x40) != 0) { a = f2dot14(p); d = f2dot14(p + 2); p += 4 }
        else if ((flags & 0x80) != 0) { a = f2dot14(p); b = f2dot14(p + 2); c = f2dot14(p + 4); d = f2dot14(p + 6); p += 8 }
        // ARGS_ARE_XY_VALUES assumed (flags & 2) — point-matching is rare
        glyphBBoxUncached(glyphIndex, depth + 1).foreach { r =>
          val upm = unitsPerEm.toDouble
          val corners = Seq((r.left * upm, r.bottom * upm), (r.right * upm, r.bottom * upm),
            (r.left * upm, r.top * upm), (r.right * upm, r.top * upm))
          corners.foreach { case (x0, y0) =>
            val x = a * x0 + c * y0 + dx
            val y = b * x0 + d * y0 + dy
            if (x < minX) minX = x
            if (x > maxX) maxX = x
            if (y < minY) minY = y
            if (y > maxY) maxY = y
          }
        }
        more = (flags & 0x20) != 0
      }
      if (minX == Double.MaxValue) None else Some((minX, minY, maxX, maxY))
    } catch { case _: Exception => None }
  }

  @inline private def f2dot14(i: Int): Double = s16(i) / 16384.0

  // ---- glyph outlines (for the rasterizer) ---------------------------------

  private val contourMemo =
    new java.util.concurrent.ConcurrentHashMap[Integer, Vector[Array[Double]]]()

  /** Glyph outline as closed contours in EM FRACTIONS (x0,y0,x1,y1,... pairs,
    * quadratics flattened). Empty vector = no outline (space / missing). */
  def glyphContours(gid: Int): Vector[Array[Double]] = {
    if (gid < 0 || gid >= numGlyphs) return Vector.empty
    val cached = contourMemo.get(Integer.valueOf(gid))
    if (cached != null) return cached
    val raw = contoursUncached(gid, 0) // font units
    val s = 1.0 / unitsPerEm
    val out = raw.map { c =>
      val a = new Array[Double](c.length)
      var i = 0
      while (i < c.length) { a(i) = c(i) * s; i += 1 }
      a
    }
    contourMemo.put(Integer.valueOf(gid), out)
    out
  }

  private def contoursUncached(gid: Int, depth: Int): Vector[Array[Double]] = {
    if (depth > 4) return Vector.empty
    (tables.get("loca"), tables.get("glyf")) match {
      case (Some((loca, _)), Some((glyf, _))) =>
        try {
          val (o1, o2) =
            if (locaLong) (u32(loca + 4 * gid).toInt, u32(loca + 4 * gid + 4).toInt)
            else (u16(loca + 2 * gid) * 2, u16(loca + 2 * gid + 2) * 2)
          if (o1 >= o2) return Vector.empty
          val g = glyf + o1
          if (g + 10 > data.length) return Vector.empty
          val nContours = s16(g)
          if (nContours >= 0) simpleContours(g, nContours)
          else compositeContours(g, o2 - o1, depth)
        } catch { case _: Exception => Vector.empty }
      case _ => Vector.empty
    }
  }

  private def simpleContours(g: Int, nContours: Int): Vector[Array[Double]] = {
    if (nContours == 0) return Vector.empty
    var p = g + 10
    val endPts = (0 until nContours).map(i => u16(p + 2 * i))
    val nPoints = endPts.last + 1
    p += 2 * nContours
    val insLen = u16(p); p += 2 + insLen
    val flags = new Array[Int](nPoints)
    var i = 0
    while (i < nPoints) {
      val f = u8(p); p += 1
      flags(i) = f; i += 1
      if ((f & 8) != 0) {
        val rep = u8(p); p += 1
        var r = 0
        while (r < rep && i < nPoints) { flags(i) = f; i += 1; r += 1 }
      }
    }
    val xs = new Array[Double](nPoints)
    var x = 0
    i = 0
    while (i < nPoints) {
      val f = flags(i)
      if ((f & 2) != 0) { val d = u8(p); p += 1; x += (if ((f & 16) != 0) d else -d) }
      else if ((f & 16) == 0) { x += s16(p); p += 2 }
      xs(i) = x
      i += 1
    }
    val ys = new Array[Double](nPoints)
    var y = 0
    i = 0
    while (i < nPoints) {
      val f = flags(i)
      if ((f & 4) != 0) { val d = u8(p); p += 1; y += (if ((f & 32) != 0) d else -d) }
      else if ((f & 32) == 0) { y += s16(p); p += 2 }
      ys(i) = y
      i += 1
    }
    val out = Vector.newBuilder[Array[Double]]
    var start = 0
    endPts.foreach { end =>
      val n = end - start + 1
      if (n >= 2) {
        val pts = new scala.collection.mutable.ArrayBuffer[Double](n * 4)
        @inline def onCurve(k: Int): Boolean = (flags(start + (k % n)) & 1) != 0
        @inline def px(k: Int): Double = xs(start + (k % n))
        @inline def py(k: Int): Double = ys(start + (k % n))
        // starting on-curve anchor (implied midpoint if none at index 0)
        var anchorX = 0.0; var anchorY = 0.0; var first = 0
        if (onCurve(0)) { anchorX = px(0); anchorY = py(0); first = 1 }
        else if (onCurve(n - 1)) { anchorX = px(n - 1); anchorY = py(n - 1); first = 0 }
        else { anchorX = (px(0) + px(n - 1)) / 2; anchorY = (py(0) + py(n - 1)) / 2; first = 0 }
        pts += anchorX += anchorY
        var cx0 = anchorX; var cy0 = anchorY // current on-curve point
        var k = first
        val stop = first + n
        var pendCx = 0.0; var pendCy = 0.0; var havePend = false
        @inline def quad(ctrlX: Double, ctrlY: Double, endX: Double, endY: Double): Unit = {
          var s = 1
          val nSeg = 8
          while (s <= nSeg) {
            val t = s.toDouble / nSeg
            val mt = 1 - t
            pts += mt * mt * cx0 + 2 * mt * t * ctrlX + t * t * endX
            pts += mt * mt * cy0 + 2 * mt * t * ctrlY + t * t * endY
            s += 1
          }
          cx0 = endX; cy0 = endY
        }
        while (k < stop) {
          val qx = px(k); val qy = py(k)
          if (onCurve(k)) {
            if (havePend) { quad(pendCx, pendCy, qx, qy); havePend = false }
            else { pts += qx += qy; cx0 = qx; cy0 = qy }
          } else {
            if (havePend) { // implied on-curve midpoint between two controls
              val mx = (pendCx + qx) / 2; val my = (pendCy + qy) / 2
              quad(pendCx, pendCy, mx, my)
            }
            pendCx = qx; pendCy = qy; havePend = true
          }
          k += 1
        }
        if (havePend) quad(pendCx, pendCy, anchorX, anchorY)
        out += pts.toArray
      }
      start = end + 1
    }
    out.result()
  }

  private def compositeContours(g: Int, len: Int, depth: Int): Vector[Array[Double]] = {
    var p = g + 10
    val out = Vector.newBuilder[Array[Double]]
    var more = true
    while (more && p < g + len) {
      val flags = u16(p); val glyphIndex = u16(p + 2); p += 4
      var dx = 0.0; var dy = 0.0
      if ((flags & 1) != 0) { dx = s16(p); dy = s16(p + 2); p += 4 }
      else { dx = (data(p) << 24 >> 24); dy = (data(p + 1) << 24 >> 24); p += 2 }
      var a = 1.0; var b = 0.0; var c = 0.0; var d = 1.0
      if ((flags & 8) != 0) { a = f2dot14(p); d = a; p += 2 }
      else if ((flags & 0x40) != 0) { a = f2dot14(p); d = f2dot14(p + 2); p += 4 }
      else if ((flags & 0x80) != 0) { a = f2dot14(p); b = f2dot14(p + 2); c = f2dot14(p + 4); d = f2dot14(p + 6); p += 8 }
      contoursUncached(glyphIndex, depth + 1).foreach { child =>
        // child contours are in font units; apply the component transform
        val t = new Array[Double](child.length)
        var i = 0
        while (i + 1 < child.length) {
          val x0 = child(i); val y0 = child(i + 1)
          t(i) = a * x0 + c * y0 + dx
          t(i + 1) = b * x0 + d * y0 + dy
          i += 2
        }
        out += t
      }
      more = (flags & 0x20) != 0
    }
    out.result()
  }

  /** hmtx advance in em fractions. */
  def advance(gid: Int): Double = {
    (tables.get("hhea"), tables.get("hmtx")) match {
      case (Some((hhea, _)), Some((hmtx, _))) =>
        val numH = u16(hhea + 34)
        val idx = math.min(gid, math.max(0, numH - 1))
        u16(hmtx + 4 * idx) / unitsPerEm.toDouble
      case _ => 0.5
    }
  }

  def ascent1000: Double = tables.get("hhea") match {
    case Some((hhea, _)) => s16(hhea + 4) * 1000.0 / unitsPerEm
    case None => 750.0
  }
  def descent1000: Double = tables.get("hhea") match {
    case Some((hhea, _)) => s16(hhea + 6) * 1000.0 / unitsPerEm
    case None => -250.0
  }

  def os2Weight: Option[Int] = tables.get("OS/2").map { case (os2, _) => u16(os2 + 4) }

  /** Family name (name table id 1), preferring Windows-platform UTF-16BE. */
  lazy val familyName: Option[String] = tables.get("name").flatMap { case (base, _) =>
    val count = u16(base + 2)
    val strBase = base + u16(base + 4)
    val recs = (0 until count).map { i =>
      val r = base + 6 + 12 * i
      (u16(r), u16(r + 1 * 2), u16(r + 3 * 2), u16(r + 4 * 2), u16(r + 5 * 2))
    }
    def read(platform: Int): Option[String] = recs.collectFirst {
      case (pid, _, nameId, len, off) if nameId == 1 && pid == platform =>
        val s = strBase + off
        if (s + len <= data.length) {
          if (platform == 3 || platform == 0)
            new String(data, s, len, java.nio.charset.StandardCharsets.UTF_16BE)
          else new String(data, s, len, java.nio.charset.StandardCharsets.ISO_8859_1)
        } else ""
    }.filter(_.nonEmpty)
    read(3).orElse(read(1)).orElse(read(0))
  }
}

object TrueTypeFont {
  def parse(data: Array[Byte]): Option[TrueTypeFont] = {
    if (data.length < 12) return None
    def u16(i: Int): Int = ((data(i) & 0xff) << 8) | (data(i + 1) & 0xff)
    def u32(i: Int): Long =
      ((data(i) & 0xffL) << 24) | ((data(i + 1) & 0xffL) << 16) | ((data(i + 2) & 0xffL) << 8) | (data(i + 3) & 0xffL)
    val magic = u32(0)
    // 0x00010000 (TrueType), 'true'; 'OTTO' (CFF outlines) has no glyf — reject
    if (magic != 0x00010000L && magic != 0x74727565L) return None
    val numTables = u16(4)
    if (numTables <= 0 || numTables > 64) return None
    val tables = (0 until numTables).flatMap { i =>
      val rec = 12 + 16 * i
      if (rec + 16 > data.length) None
      else {
        val tag = new String(data, rec, 4, java.nio.charset.StandardCharsets.ISO_8859_1)
        val off = u32(rec + 8).toInt
        val len = u32(rec + 12).toInt
        if (off >= 0 && off < data.length) Some(tag -> (off, len)) else None
      }
    }.toMap
    tables.get("head").map { case (head, _) =>
      val unitsPerEm = u16(head + 18)
      val locFmt = u16(head + 50)
      val numGlyphs = tables.get("maxp").map { case (mx, _) => u16(mx + 4) }.getOrElse(0)
      new TrueTypeFont(data, tables, if (unitsPerEm > 0) unitsPerEm else 1000, locFmt == 1, numGlyphs)
    }
  }
}
