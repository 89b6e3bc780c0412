package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Tagged-PDF structure walk: DFS order, content counting, bounds. */
class StructTreeSpec extends AnyFunSuite {

  private def docWith(objs: Seq[String]): PdfDocument =
    PdfDocument.load(RawPdf.assemble(objs)).toOption.get

  private val pageObjs = Seq(
    "<</Type/Pages/Kids[3 0 R]/Count 1>>",
    "<</Type/Page/Parent 2 0 R/MediaBox[0 0 100 100]>>")

  test("DFS pre-order with roles, Alt, ActualText, MCID counts") {
    val doc = docWith(Seq(
      "<</Type/Catalog/Pages 2 0 R/StructTreeRoot 4 0 R>>") ++ pageObjs ++ Seq(
      "<</Type/StructTreeRoot/K 5 0 R>>",
      "<</Type/StructElem/S/Document/K[6 0 R 7 0 R]>>",
      "<</Type/StructElem/S/Figure/Alt(chart)/K[<</Type/MCR/MCID 0>> 1 <</Type/OBJR/Obj 3 0 R>>]>>",
      "<</Type/StructElem/S/P/ActualText(hi)/K 2>>"))
    val nodes = StructTree.walk(doc)
    assert(nodes.map(n => (n.idx, n.depth, n.sType, n.nMcids)) == Vector(
      (0, 0, "Document", 0), (1, 1, "Figure", 3), (2, 1, "P", 1)))
    assert(nodes(1).alt == "chart")
    assert(nodes(2).actualText == "hi")
  }

  test("K cycle terminates; depth/node caps bound adversarial trees") {
    val doc = docWith(Seq(
      "<</Type/Catalog/Pages 2 0 R/StructTreeRoot 4 0 R>>") ++ pageObjs ++ Seq(
      "<</Type/StructTreeRoot/K 5 0 R>>",
      "<</Type/StructElem/S/A/K[6 0 R]>>",
      "<</Type/StructElem/S/B/K[5 0 R]>>"))
    val nodes = StructTree.walk(doc)
    assert(nodes.map(_.sType) == Vector("A", "B"))
    // self-cycle
    val self = docWith(Seq(
      "<</Type/Catalog/Pages 2 0 R/StructTreeRoot 4 0 R>>") ++ pageObjs ++ Seq(
      "<</Type/StructTreeRoot/K 5 0 R>>",
      "<</Type/StructElem/S/Loop/K[5 0 R]>>"))
    assert(StructTree.walk(self).map(_.sType) == Vector("Loop"))
    // node cap
    assert(StructTree.walk(doc, maxNodes = 1).length == 1)
  }

  test("readingOrderText: ActualText overrides mcid runs; missing mcids drop out") {
    val cs =
      """BT
        |/F1 10 Tf
        |/Span <</MCID 0>> BDC
        |1 0 0 1 72 700 Tm
        |(shown glyphs) Tj
        |EMC
        |/P <</MCID 1>> BDC
        |1 0 0 1 72 680 Tm
        |(kept text) Tj
        |EMC
        |ET""".stripMargin
    val doc = docWith(Seq(
      "<</Type/Catalog/Pages 2 0 R/StructTreeRoot 6 0 R>>",
      "<</Type/Pages/Kids[3 0 R]/Count 1>>",
      "<</Type/Page/Parent 2 0 R/MediaBox[0 0 612 792]/Contents 4 0 R/Resources<</Font<</F1 5 0 R>>>>>>",
      s"<</Length ${cs.length}>>\nstream\n$cs\nendstream",
      "<</Type/Font/Subtype/Type1/BaseFont/Helvetica>>",
      "<</Type/StructTreeRoot/K 7 0 R>>",
      "<</Type/StructElem/S/Document/K[8 0 R 9 0 R]>>",
      // ActualText replaces the shown glyphs (e.g. a drop-cap or ligature)
      "<</Type/StructElem/S/Span/ActualText(replacement)/K[0]>>",
      // references mcid 1 AND a dangling mcid 9 (no such marked content)
      "<</Type/StructElem/S/P/K[1 9]>>"))
    assert(StructTree.readingOrderText(doc).contains("replacement\nkept text"))
    // struct nodes carry their ordered (page, mcid) lists; /Pg absent -> -1
    val nodes = StructTree.walk(doc)
    assert(nodes.map(_.mcids) ==
      Vector(Vector(), Vector((-1, 0)), Vector((-1, 1), (-1, 9))))
  }

  test("no StructTreeRoot, or garbage K shapes, yield empty/partial without throwing") {
    val bare = docWith(Seq("<</Type/Catalog/Pages 2 0 R>>") ++ pageObjs)
    assert(StructTree.walk(bare).isEmpty)
    val junk = docWith(Seq(
      "<</Type/Catalog/Pages 2 0 R/StructTreeRoot 4 0 R>>") ++ pageObjs ++ Seq(
      "<</Type/StructTreeRoot/K[(notanode) 99 /Name <</Type/StructElem/S/Ok>>]>>"))
    assert(StructTree.walk(junk).map(_.sType) == Vector("Ok"))
  }

  test("readingOrderText: multi-page docs key MCIDs per page (/Pg), no cross-page collisions") {
    def pageCs(txt: String) =
      s"BT /F1 10 Tf 1 0 0 1 72 700 Tm /P <</MCID 0>> BDC ($txt) Tj EMC ET"
    val cs1 = pageCs("page one text")
    val cs2 = pageCs("page two text")
    val doc = docWith(Seq(
      "<</Type/Catalog/Pages 2 0 R/StructTreeRoot 8 0 R>>",
      "<</Type/Pages/Kids[3 0 R 4 0 R]/Count 2>>",
      "<</Type/Page/Parent 2 0 R/MediaBox[0 0 612 792]/Contents 5 0 R/Resources<</Font<</F1 7 0 R>>>>>>",
      "<</Type/Page/Parent 2 0 R/MediaBox[0 0 612 792]/Contents 6 0 R/Resources<</Font<</F1 7 0 R>>>>>>",
      s"<</Length ${cs1.length}>>\nstream\n$cs1\nendstream",
      s"<</Length ${cs2.length}>>\nstream\n$cs2\nendstream",
      "<</Type/Font/Subtype/Type1/BaseFont/Helvetica>>",
      "<</Type/StructTreeRoot/K 9 0 R>>",
      // BOTH pages use MCID 0 — the per-page key must disambiguate;
      // note the struct order reads page TWO first
      "<</Type/StructElem/S/Document/K[10 0 R 11 0 R]>>",
      "<</Type/StructElem/S/P/Pg 4 0 R/K[0]>>",
      "<</Type/StructElem/S/P/Pg 3 0 R/K[0]>>"))
    assert(StructTree.readingOrderText(doc).contains("page two text\npage one text"))
    val nodes = StructTree.walk(doc)
    assert(nodes.map(_.mcids) == Vector(Vector(), Vector((1, 0)), Vector((0, 0))))
  }
}
