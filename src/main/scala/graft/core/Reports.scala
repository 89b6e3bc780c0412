package graft.core

/** Report/CLI-adjacent utilities mirrored from the reference's parsers
  * (src/pypdfium2_cli/_parsers.py) and fonts report (src/pypdfium2_cli/fonts.py). */
object Reports {

  /** Parse a 1-based page-range spec like "2,1-3,2" into 0-based indices.
    * Preserves user order including duplicates; descending ranges ("5-3")
    * count down (reference _parsers.py:10-28; tested at
    * tests/test_document.py:220-236 via import-pages sequences). */
  def pageRanges(spec: String, pageCount: Int): Either[String, Vector[Int]] = {
    try {
      val out = Vector.newBuilder[Int]
      spec.split(',').filter(_.nonEmpty).foreach { part =>
        val p = part.trim
        val dash = p.indexOf('-', 1) // allow leading '-'? spec uses plain ints
        if (dash > 0) {
          val a = p.substring(0, dash).trim.toInt
          val b = p.substring(dash + 1).trim.toInt
          val step = if (a <= b) 1 else -1
          var i = a
          while (i != b + step) { out += (i - 1); i += step }
        } else out += (p.toInt - 1)
      }
      val v = out.result()
      if (v.exists(i => i < 0 || i >= pageCount)) Left(s"page index out of bounds for count $pageCount")
      else Right(v)
    } catch { case e: Exception => Left(s"bad page spec: ${e.getMessage}") }
  }

  /** Compress sorted 1-based page numbers into "1-3, 7" form
    * (reference _parsers.py:40-61 + fonts report formatting). */
  def rangeCompress(pageNums: Seq[Int]): String = {
    if (pageNums.isEmpty) return ""
    val sb = new StringBuilder
    var runStart = pageNums.head
    var prev = pageNums.head
    def emit(): Unit = {
      if (sb.nonEmpty) sb.append(", ")
      if (runStart == prev) sb.append(runStart)
      else sb.append(runStart).append('-').append(prev)
    }
    pageNums.tail.foreach { n =>
      if (n == prev + 1) prev = n
      else { emit(); runStart = n; prev = n }
    }
    emit()
    sb.toString
  }

  /** Quad points of a rect: 4 (x,y) corners CCW from bottom-left
    * (reference pageobjects.py:108-129). */
  def quadPoints(r: Rect): Vector[(Double, Double)] =
    Vector((r.left, r.bottom), (r.right, r.bottom), (r.right, r.top), (r.left, r.top))

  /** Fonts used on a page: distinct by (baseName, embedded, weight), with
    * the text-object count (reference fonts.py report groups fonts by
    * identity across pages). */
  def pageFonts(page: PdfPage): Vector[(String, String, Boolean, Int)] = {
    val tp = page.textPage
    tp.textObjects
      .filter(_.chars.nonEmpty)
      .map(o => (o.font.baseNameNoSubset, o.font.familyName, o.font.isEmbedded, o.font.weight))
      .distinct
      .map { case (bn, fam, emb, w) => (bn, fam, emb, w) }
  }
}

/** Device↔page coordinate transforms (reference page.py device coords,
  * tested by tests/test_page.py:64-80 round trip). Device space: origin
  * top-left, y down, within a (width, height) viewport after rotation. */
object PageCoords {

  /** Page (PDF canvas) point → device pixel point. */
  def pageToDevice(page: PdfPage, deviceW: Double, deviceH: Double,
                   x: Double, y: Double): (Double, Double) = {
    val b = page.bbox
    val rot = page.rotation
    // normalize into [0,1]² of the unrotated page
    val nx = (x - b.left) / b.width
    val ny = (y - b.bottom) / b.height
    rot match {
      case 0 => (nx * deviceW, (1 - ny) * deviceH)
      case 90 => (ny * deviceW, nx * deviceH)
      case 180 => ((1 - nx) * deviceW, ny * deviceH)
      case _ => ((1 - ny) * deviceW, (1 - nx) * deviceH) // 270
    }
  }

  def deviceToPage(page: PdfPage, deviceW: Double, deviceH: Double,
                   dx: Double, dy: Double): (Double, Double) = {
    val b = page.bbox
    val rot = page.rotation
    val (nx, ny) = rot match {
      case 0 => (dx / deviceW, 1 - dy / deviceH)
      case 90 => (dy / deviceH, dx / deviceW)
      case 180 => (1 - dx / deviceW, dy / deviceH)
      case _ => (1 - dy / deviceH, 1 - dx / deviceW) // 270
    }
    (b.left + nx * b.width, b.bottom + ny * b.height)
  }
}
