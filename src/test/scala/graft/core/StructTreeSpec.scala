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

  test("no StructTreeRoot, or garbage K shapes, yield empty/partial without throwing") {
    val bare = docWith(Seq("<</Type/Catalog/Pages 2 0 R>>") ++ pageObjs)
    assert(StructTree.walk(bare).isEmpty)
    val junk = docWith(Seq(
      "<</Type/Catalog/Pages 2 0 R/StructTreeRoot 4 0 R>>") ++ pageObjs ++ Seq(
      "<</Type/StructTreeRoot/K[(notanode) 99 /Name <</Type/StructElem/S/Ok>>]>>"))
    assert(StructTree.walk(junk).map(_.sType) == Vector("Ok"))
  }
}
