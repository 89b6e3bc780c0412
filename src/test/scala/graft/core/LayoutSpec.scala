package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Layout analysis: line assembly, paragraph block segmentation,
  * column detection + reading order. */
class LayoutSpec extends AnyFunSuite {

  private def pageOf(bytes: Array[Byte]): TextPage =
    PdfDocument.load(bytes, "").toOption.get.pages.head.textPage

  test("paragraphs fixture: two blocks of 3 and 2 lines, texts intact") {
    val tp = pageOf(SynthPdf.paragraphsPdf)
    val ls = Layout.lines(tp)
    assert(ls.length == 5)
    info(ls.map(l => f"(${l.rect.left}%.2f,${l.rect.bottom}%.2f,${l.rect.right}%.2f,${l.rect.top}%.2f) '${l.text}'").mkString("\n"))
    val bs = Layout.blocks(tp)
    assert(bs.length == 2)
    assert(bs(0).lines.map(_.text) == Vector(
      "data tables merge under the fast scan",
      "the hash join groups every key",
      "batch rows spill to sorted runs"))
    assert(bs(1).lines.map(_.text) == Vector(
      "a second paragraph starts here",
      "its lines pack into one block"))
    info(bs.map(b => f"block (${b.rect.left}%.3f,${b.rect.bottom}%.3f,${b.rect.right}%.3f,${b.rect.top}%.3f)").mkString("\n"))
  }

  test("two-column fixture: columns detected, reading order column-major") {
    val tp = pageOf(SynthPdf.twoColumnPdf)
    val (n, text) = Layout.readingOrder(tp, lineSep = " | ", colSep = " || ")
    assert(n == 2)
    assert(text ==
      "left column first line | left column second line | left column third line" +
      " || right column first line | right column second line")
  }

  test("single-column page is one column; naive top-sort would interleave") {
    val tp = pageOf(SynthPdf.paragraphsPdf)
    assert(Layout.columns(tp).length == 1)
    // sanity on the two-column page: top-sorted lines DO interleave
    val tp2 = pageOf(SynthPdf.twoColumnPdf)
    val topSorted = Layout.lines(tp2).sortBy(l => (-l.rect.top, l.rect.left)).map(_.text)
    assert(topSorted.take(2) == Vector("left column first line", "right column first line"))
  }

  test("ruled table: 3x2 lattice cells with centered-charbox text assignment") {
    val doc = PdfDocument.load(SynthPdf.tablePdf, "").toOption.get
    val cells = Layout.tables(doc.pages.head)
    assert(cells.length == 6)
    val byPos = cells.map(c => (c.row, c.col) -> c).toMap
    assert(byPos((0, 0)).text == "name")
    assert(byPos((0, 1)).text == "count")
    assert(byPos((1, 0)).text == "alpha")
    assert(byPos((1, 1)).text == "12")
    assert(byPos((2, 0)).text == "beta")
    assert(byPos((2, 1)).text == "7")
    val c00 = byPos((0, 0)).rect
    assert(c00.left == 50.0 && c00.right == 200.0 && c00.top == 700.0 && c00.bottom == 670.0)
  }

  test("ruled table: multi-run and multi-line cells get space separators") {
    // Same 3x2 lattice as tablePdf, but cell (1,0) holds two separate runs
    // ("big" then "dog" placed 30pt right) and cell (2,0) holds two lines.
    // Adjacent chars within one run must NOT gain separators.
    val doc = PdfDocument.load(SynthPdf.onePage(
      """0.7 w
        |50 700 m 350 700 l S
        |50 670 m 350 670 l S
        |50 640 m 350 640 l S
        |50 610 m 350 610 l S
        |50 610 m 50 700 l S
        |200 610 m 200 700 l S
        |350 610 m 350 700 l S
        |BT /F1 10 Tf
        |60 680 Td (name) Tj 150 0 Td (count) Tj
        |-150 -30 Td (big) Tj 30 0 Td (dog) Tj 120 0 Td (12) Tj
        |-150 -26 Td (two) Tj 0 -12 Td (lines) Tj 150 12 Td (7) Tj
        |ET""".stripMargin), "").toOption.get
    val byPos = Layout.tables(doc.pages.head).map(c => (c.row, c.col) -> c.text).toMap
    assert(byPos((0, 0)) == "name", "single run untouched")
    assert(byPos((1, 0)) == "big dog", "gap between runs becomes one space")
    assert(byPos((2, 0)) == "two lines", "line break inside a cell becomes one space")
    assert(byPos((1, 1)) == "12" && byPos((2, 1)) == "7")
  }

  test("ruled table: pages without a grid return empty") {
    val doc = PdfDocument.load(SynthPdf.paragraphsPdf, "").toOption.get
    assert(Layout.tables(doc.pages.head).isEmpty)
    // a single ruling (no lattice) is also not a table
    val one = PdfDocument.load(SynthPdf.onePage(
      "50 700 m 350 700 l S BT /F1 10 Tf 60 680 Td (x) Tj ET"), "").toOption.get
    assert(Layout.tables(one.pages.head).isEmpty)
  }

  test("headings: modal body size, levels by size rank, top-down order") {
    val doc = PdfDocument.load(SynthPdf.headingsPdf, "").toOption.get
    val hs = Layout.headings(doc.pages.head)
    info(hs.map(h => f"L${h.level} ${h.fontSize}%.1f top=${h.top}%.3f '${h.text}'").mkString("\n"))
    assert(hs.map(h => (h.level, h.text)) == Vector(
      (1, "document title"), (2, "first section"), (2, "second section")))
    // body lines (10 pt) never surface as headings
    assert(hs.forall(_.fontSize > 10.0))
  }

  test("headings: single-size pages have none; empty pages are safe") {
    val doc = PdfDocument.load(SynthPdf.paragraphsPdf, "").toOption.get
    assert(Layout.headings(doc.pages.head).isEmpty)
    val empty = PdfDocument.load(SynthPdf.onePage(""), "").toOption.get
    assert(Layout.headings(empty.pages.head).isEmpty)
  }

  test("markdown export: headings, paragraph, pipe table in top-down order") {
    val doc = PdfDocument.load(SynthPdf.articlePdf, "").toOption.get
    val md = Layout.markdown(doc.pages.head)
    info("---\n" + md + "\n---")
    assert(md ==
      """# spark graft report
        |
        |## results
        |
        |the scan results hold steady joins stay fast at scale
        |
        || name | count |
        || --- | --- |
        || alpha | 12 |""".stripMargin)
  }

  test("markdown export: table-less and heading-less pages degrade to paragraphs") {
    val doc = PdfDocument.load(SynthPdf.paragraphsPdf, "").toOption.get
    val md = Layout.markdown(doc.pages.head)
    assert(!md.contains("#") && !md.contains("|"))
    assert(md.split("\n\n").length == 2, "two paragraph blocks")
  }

  test("sections: headings own the lines below them; preamble and no-heading pages") {
    val doc = PdfDocument.load(SynthPdf.headingsPdf, "").toOption.get
    val ss = Layout.sections(doc.pages.head)
    info(ss.map(s => s"[${s.idx}] L${s.level} '${s.title}' -> '${s.text}'").mkString("\n"))
    assert(ss.map(s => (s.idx, s.title, s.level, s.lines.length)) == Vector(
      (0, "document title", 1, 0),
      (1, "first section", 2, 2),
      (2, "second section", 2, 1)))
    assert(ss(1).text == "body line one about scans body line two about joins")
    assert(ss(2).text == "more body text here")
    // no headings -> single untitled section holding everything
    val para = PdfDocument.load(SynthPdf.paragraphsPdf, "").toOption.get
    val ps = Layout.sections(para.pages.head)
    assert(ps.length == 1 && ps.head.title == "" && ps.head.lines.length == 5)
  }

  test("rotated text: stream-order extraction with transformed geometry") {
    val doc = PdfDocument.load(SynthPdf.rotatedTextPdf, "").toOption.get
    val tp = doc.pages.head.textPage
    val ls = Layout.lines(tp)
    info(ls.map(l => f"(${l.rect.left}%.1f,${l.rect.bottom}%.1f,${l.rect.right}%.1f,${l.rect.top}%.1f) '${l.text}'").mkString("\n"))
    assert(ls.map(_.text) == Vector("rotated upward text", "horizontal baseline text"))
    val rot = ls(0).rect
    val hor = ls(1).rect
    assert(rot.height > rot.width * 5, s"rotated line is tall: $rot")
    assert(hor.width > hor.height * 5, s"horizontal line is wide: $hor")
    // rotated run climbs from y=100 at x≈300
    assert(math.abs(rot.left - 300) < 15 && rot.bottom >= 100 - 3)
  }

  test("leading estimate and degenerate inputs") {
    val tp = pageOf(SynthPdf.paragraphsPdf)
    val leading = Layout.leadingOf(Layout.lines(tp))
    assert(math.abs(leading - 14.0) < 0.5, s"leading=$leading")
    assert(Layout.blocksOf(Vector.empty) == Vector.empty)
    assert(Layout.columnsOf(Vector.empty) == Vector.empty)
    // single line: one block, one column, leading 0
    val one = Layout.lines(pageOf(SynthPdf.onePage("BT /F1 12 Tf 50 700 Td (only line) Tj ET")))
    assert(Layout.leadingOf(one) == 0.0)
    assert(Layout.blocksOf(one).length == 1)
    assert(Layout.columnsOf(one).length == 1)
  }
}
