package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** XMP metadata-stream scanner: container flattening, both RDF shapes,
  * entity decode, adversarial tolerance. */
class XmpSpec extends AnyFunSuite {

  test("element form: Alt/Seq/Bag flatten, entities decode, tags strip") {
    val xml =
      """<rdf:Description>
        |<dc:title><rdf:Alt><rdf:li xml:lang="x-default">A &lt;b&gt; &amp; &#233;</rdf:li></rdf:Alt></dc:title>
        |<dc:creator><rdf:Seq><rdf:li>X</rdf:li><rdf:li>Y</rdf:li></rdf:Seq></dc:creator>
        |<xmp:CreateDate>2020-05-05</xmp:CreateDate>
        |</rdf:Description>""".stripMargin
    val m = Xmp.properties(xml).toMap
    assert(m("dc:title") == "A <b> & é")
    assert(m("dc:creator") == "X; Y")
    assert(m("xmp:CreateDate") == "2020-05-05")
  }

  test("attribute form and mixed quoting") {
    val xml = """<rdf:Description pdf:Producer="P&amp;Q" xmp:CreatorTool='tool'/>"""
    val m = Xmp.properties(xml).toMap
    assert(m("pdf:Producer") == "P&Q")
    assert(m("xmp:CreatorTool") == "tool")
  }

  test("adversarial packets never throw, yield at most intact props") {
    for (bad <- Seq("", "<", "<dc:title>", "<dc:title><rdf:li>x", "&#xZZ; &unknown; &#; trailing&",
                    "<dc:title></wrong>", "a" * 100, "<rdf:li>" * 100))
      Xmp.properties(bad) // must not throw
    // self-closing empty element
    assert(Xmp.properties("<dc:title/>").toMap.get("dc:title").contains(""))
    // unterminated entity passes through verbatim
    assert(Xmp.properties("<xmp:CreateDate>a&b</xmp:CreateDate>").toMap
      .apply("xmp:CreateDate") == "a&b")
  }

  test("fromDocument reads the catalog /Metadata stream; absent -> empty") {
    val xmp = "<rdf:Description xmpMM:DocumentID='id-1'><dc:title><rdf:Alt><rdf:li>T</rdf:li></rdf:Alt></dc:title></rdf:Description>"
    val pdf = RawPdf.assemble(Seq(
      "<</Type/Catalog/Pages 2 0 R/Metadata 4 0 R>>",
      "<</Type/Pages/Kids[3 0 R]/Count 1>>",
      "<</Type/Page/Parent 2 0 R/MediaBox[0 0 100 100]>>",
      s"<</Type/Metadata/Subtype/XML/Length ${xmp.length}>>\nstream\n$xmp\nendstream"))
    val doc = PdfDocument.load(pdf).toOption.get
    val m = Xmp.fromDocument(doc).toMap
    assert(m == Map("dc:title" -> "T", "xmpMM:DocumentID" -> "id-1"))

    val bare = RawPdf.assemble(Seq(
      "<</Type/Catalog/Pages 2 0 R>>",
      "<</Type/Pages/Kids[3 0 R]/Count 1>>",
      "<</Type/Page/Parent 2 0 R/MediaBox[0 0 100 100]>>"))
    assert(Xmp.fromDocument(PdfDocument.load(bare).toOption.get).isEmpty)
  }
}
