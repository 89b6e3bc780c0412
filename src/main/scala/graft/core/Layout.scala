package graft.core

/** Layout analysis over TextPage geometry — the "layout parse / DOM
  * heuristics" leg of the extraction pipeline for UNTAGGED PDFs (the
  * structure-tree reading order in [[StructTree]] covers tagged ones):
  * line assembly from the PDFium-order rect runs, vertical-gap paragraph
  * block segmentation, and x-projection column detection with
  * column-major reading order.
  *
  * The reference exposes the geometry primitives (textpage.py
  * get_rectboxes/get_text_bounded); block/column assembly is the standard
  * downstream composition of them (what a Common-Crawl PDF corpus needs
  * before paragraph-level dedup or chunking). All thresholds are ratios
  * of the measured leading, not absolute points, so the segmentation is
  * scale-invariant. */
object Layout {

  final case class Line(rect: Rect, text: String)
  final case class Block(rect: Rect, lines: Vector[Line]) {
    def text: String = lines.map(_.text).mkString(" ")
  }

  /** Lines = the TextPage rect runs (FPDFText_CountRects segmentation)
    * with each run's bounded text, newline artifacts collapsed. */
  def lines(tp: TextPage): Vector[Line] =
    tp.rects().map { r =>
      val t = tp.textBounded(Some(r.left - 0.5), Some(r.bottom - 0.5),
        Some(r.right + 0.5), Some(r.top + 0.5))
      Line(r, t.replace("\r\n", " ").replace("\n", " ").trim)
    }

  /** Median positive top-to-top delta of consecutive lines = the page's
    * leading estimate (0 for single-line pages). */
  def leadingOf(ls: Vector[Line]): Double = {
    val sorted = ls.map(_.rect.top).sorted(Ordering[Double].reverse)
    val deltas = sorted.zip(sorted.drop(1)).map { case (a, b) => a - b }
      .filter(_ > 0.01).sorted
    if (deltas.isEmpty) 0.0 else deltas(deltas.length / 2)
  }

  /** Paragraph blocks: lines in top-down order start a new block when the
    * top-to-top jump exceeds `ratio` × the median leading (the classic
    * XY-cut vertical rule). Single-leading pages come back as one block. */
  def blocks(tp: TextPage, ratio: Double = 1.8): Vector[Block] =
    blocksOf(lines(tp), ratio)

  def blocksOf(ls0: Vector[Line], ratio: Double = 1.8): Vector[Block] = {
    val ls = ls0.sortBy(l => (-l.rect.top, l.rect.left))
    if (ls.isEmpty) return Vector.empty
    val leading = leadingOf(ls)
    val out = Vector.newBuilder[Block]
    var cur = Vector(ls.head)
    for (l <- ls.tail) {
      val jump = cur.last.rect.top - l.rect.top
      if (leading > 0 && jump > ratio * leading) {
        out += Block(cur.map(_.rect).reduce(_ union _), cur)
        cur = Vector(l)
      } else cur = cur :+ l
    }
    out += Block(cur.map(_.rect).reduce(_ union _), cur)
    out.result()
  }

  /** Columns by x-projection: sort lines by left edge and merge
    * overlapping [left, right] intervals; each merged interval is one
    * column, ordered left-to-right, its lines top-down. */
  def columns(tp: TextPage): Vector[Vector[Line]] = columnsOf(lines(tp))

  def columnsOf(ls: Vector[Line]): Vector[Vector[Line]] = {
    if (ls.isEmpty) return Vector.empty
    val sorted = ls.sortBy(_.rect.left)
    var intervals = Vector.empty[(Double, Double)]
    for (l <- sorted) {
      intervals.lastOption match {
        case Some((a, b)) if l.rect.left <= b + 0.5 =>
          intervals = intervals.init :+ ((a, math.max(b, l.rect.right)))
        case _ => intervals = intervals :+ ((l.rect.left, l.rect.right))
      }
    }
    intervals.map { case (a, b) =>
      sorted.filter(l => l.rect.left >= a - 0.25 && l.rect.left <= b)
        .sortBy(l => (-l.rect.top, l.rect.left))
    }
  }

  /** Column-major reading order: (n_columns, text with lines joined by
    * `lineSep` inside a column and columns joined by `colSep`). */
  def readingOrder(tp: TextPage, lineSep: String = "\n",
                   colSep: String = "\n\n"): (Int, String) = {
    val cols = columns(tp)
    (cols.length, cols.map(_.map(_.text).mkString(lineSep)).mkString(colSep))
  }
}
