package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Ports reference document-level literals: tests/test_document.py,
  * test_toc.py, test_attachments.py, test_page.py + pdfinfo goldens. */
class DocumentSpec extends AnyFunSuite {

  def fixture(name: String): Array[Byte] =
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"/root/reference/tests/resources/$name"))
  def load(name: String): PdfDocument = PdfDocument.load(fixture(name)).toOption.get

  test("empty.pdf: version 15, exact file id, formtype/pagemode (test_document.py:149-158)") {
    val d = load("empty.pdf")
    assert(d.version == 15)
    val expId = Array(0xec, 0xe5, 0x21, 0x04, 0xd6, 0x1b, 0x28, 0x52, 0x1a, 0x89, 0x66, 0x85, 0x0a, 0xbe, 0xa4).map(_.toByte)
    // reference get_identifier drops the trailing byte (document.py:278-292)
    assert(java.util.Arrays.equals(d.identifiers._1.dropRight(1), expId))
    assert(d.formType == "None")
    assert(d.pageMode == "UseNone")
    assert(d.pageLabel(0) == "1") // no labels → reference returns "" but pdfinfo shows 1-based fallback
  }

  test("empty.pdf metadata (test_document.py:181-189)") {
    val m = load("empty.pdf").metadata()
    assert(m("Producer") == "LibreOffice 6.4")
    assert(m("Creator") == "Writer")
    assert(m("CreationDate") == "D:20220520145414+02'00'")
    assert(m("Title") == "" && m("Author") == "" && m("Subject") == "" && m("Keywords") == "")
    assert(m.size == 8)
    val skipped = load("empty.pdf").metadata(skipEmpty = true)
    assert(skipped.keySet == Set("Producer", "Creator", "CreationDate"))
  }

  test("toc.pdf: bookmark tree with levels/counts/dests (test_toc.py:27-57)") {
    val toc = load("toc.pdf").toc()
    assert(toc.length == 9)
    val first = toc.head
    assert(first.title == "One" && first.count == -2 && first.level == 0)
    assert(first.dest.exists(d => d.pageIndex == 0 && d.viewMode == "XYZ"))
    assert(first.dest.get.params.flatten.take(2).map(math.round) == Vector(89L, 758L))
    val last = toc.last
    assert(last.title == "Three-B" && last.count == 0)
    assert(last.dest.exists(d => d.pageIndex == 1))
    toc.foreach(bm => assert(bm.dest.forall(_.viewMode == "XYZ")))
  }

  test("toc_circular.pdf: cycle cut, 2 bookmarks (golden toc_circular.txt)") {
    val toc = load("toc_circular.pdf").toc()
    assert(toc.map(_.title) == Vector("A Good Beginning", "A Good Ending"))
  }

  test("toc_maxdepth.pdf: depth bound (golden toc_maxdepth.txt: 20 at depth 15)") {
    assert(load("toc_maxdepth.pdf").toc(maxDepth = 15).length == 20)
  }

  def golden(name: String): String =
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"/root/reference/tests/expectations/$name")), "UTF-8")

  test("toc CLI reports byte-identical to goldens (tests/test_cli.py:86-93)") {
    for (fx <- Seq("toc", "toc_viewmodes", "toc_maxdepth", "toc_circular")) {
      val got = Reports.tocReport(load(s"$fx.pdf"))
      val exp = golden(s"$fx.txt")
      assert(got == exp, {
        val g = got.linesIterator.toVector; val e = exp.linesIterator.toVector
        val firstDiff = g.zipAll(e, "<missing>", "<missing>").indexWhere(p => p._1 != p._2)
        s"$fx diff at line $firstDiff:\nGOT: ${g.lift(firstDiff)}\nEXP: ${e.lift(firstDiff)}"
      })
    }
  }

  test("pdfinfo CLI reports byte-identical to goldens (tests/test_cli.py:127-129)") {
    for (fx <- Seq("multipage", "attachments", "forms")) {
      val got = Reports.pdfinfoReport(load(s"$fx.pdf"))
      val exp = golden(s"pdfinfo_$fx.txt")
      assert(got == exp, {
        val g = got.linesIterator.toVector; val e = exp.linesIterator.toVector
        val firstDiff = g.zipAll(e, "<missing>", "<missing>").indexWhere(p => p._1 != p._2)
        s"$fx diff at line $firstDiff:\nGOT: ${g.lift(firstDiff)}\nEXP: ${e.lift(firstDiff)}"
      })
    }
  }

  test("pageobjects CLI report byte-identical (tests/test_cli.py:132-134)") {
    val got = Reports.pageObjectsReport(load("images.pdf"))
    val exp = golden("pageobjects_images.txt")
    assert(got == exp, {
      val g = got.linesIterator.toVector; val e = exp.linesIterator.toVector
      val firstDiff = g.zipAll(e, "<missing>", "<missing>").indexWhere(p => p._1 != p._2)
      s"diff at line $firstDiff:\nGOT: ${g.lift(firstDiff)}\nEXP: ${e.lift(firstDiff)}"
    })
  }

  test("attachments list CLI report byte-identical (tests/test_cli.py:96-105)") {
    assert(Reports.attachmentsListReport(load("attachments.pdf")) == golden("attachments_list.txt"))
  }

  test("toc colored report byte-identical (tests/test_cli.py:92-93)") {
    val got = Reports.tocReport(load("toc_viewmodes.pdf"), colorIndicator = true)
    assert(got == golden("toc_viewmodes_colored.txt"))
  }

  test("attachments.pdf: names, bytes, params (test_attachments.py)") {
    val atts = load("attachments.pdf").attachments
    assert(atts.map(_.name) == Vector("1.txt", "attached.pdf"))
    assert(new String(atts(0).data, "UTF-8") == "test")
    assert(atts(1).data.length == 5869)
    assert(atts(0).params("CreationDate") == "D:20170712214438-07'00'")
    assert(atts(0).params("ModDate") == "D:20160115091400")
    // the attached.pdf is itself a loadable 1-page PDF (round trip)
    val inner = PdfDocument.load(atts(1).data).toOption.get
    assert(inner.pageCount == 1)
  }

  test("forms.pdf: AcroForm type, version 17, empty ids (golden pdfinfo_forms.txt)") {
    val d = load("forms.pdf")
    assert(d.formType == "AcroForm")
    assert(d.version == 17)
    assert(d.identifiers._1.isEmpty)
    val p = d.page(0)
    assert(p.width == 300.0 && p.height == 600.0)
  }

  test("form field values and flags (forms.pdf /V and /Ff)") {
    val d = load("forms.pdf")
    val byName = d.formFieldsDetailed.map(f => f.name -> f).toMap
    assert(byName("Listbox_MultiSelect").value == "Banana")
    assert(byName("Listbox_MultiSelect").flags == 2097152L) // bit 22 MultiSelect
    assert(byName("Listbox_ReadOnly").flags == 1L)
    assert(byName("Listbox_MultiSelectMultipleValues").value == "Epsilon,Gamma")
  }

  test("XFA form types: dynamic (NeedsRendering) vs static foreground") {
    def pdfWith(catalogExtra: String): Array[Byte] = SynthPdf.build(Vector(
      s"<</Type/Catalog/Pages 2 0 R/AcroForm<</XFA 4 0 R/Fields[]>>$catalogExtra>>".getBytes,
      "<</Type/Pages/Kids[3 0 R]/Count 1>>".getBytes,
      "<</Type/Page/Parent 2 0 R/MediaBox[0 0 100 100]>>".getBytes,
      "<</Length 0>>\nstream\n\nendstream".getBytes))
    val staticXfa = PdfDocument.load(pdfWith("")).toOption.get
    assert(staticXfa.formType == "XFAForeground")
    val dynamicXfa = PdfDocument.load(pdfWith("/NeedsRendering true")).toOption.get
    assert(dynamicXfa.formType == "XFAFull")
  }

  test("box_fallback.pdf: mediabox fallback (0,0,612,792) (test_page.py:34-37)") {
    val p = load("box_fallback.pdf").page(0)
    assert(p.mediaBox == Rect(0, 0, 612, 792))
  }

  test("page ranges: '2,1-3,2' and descending '3-1' (reference _parsers.py:10-28)") {
    assert(Reports.pageRanges("2,1-3,2", 3) == Right(Vector(1, 0, 1, 2, 1)))
    assert(Reports.pageRanges("3-1", 3) == Right(Vector(2, 1, 0)))
    assert(Reports.pageRanges("4", 3).isLeft)
  }

  test("range compression: [1,2,3,7] → '1-3, 7' (reference _parsers.py:40-61)") {
    assert(Reports.rangeCompress(Seq(1, 2, 3, 7)) == "1-3, 7")
    assert(Reports.rangeCompress(Seq(5)) == "5")
    assert(Reports.rangeCompress(Seq(1, 3, 4, 5, 9, 10)) == "1, 3-5, 9-10")
    assert(Reports.rangeCompress(Nil) == "")
  }

  test("device↔page coordinates round trip at all rotations (test_page.py:64-80)") {
    val p = load("text.pdf").page(0)
    for (pt <- Seq((0.0, 0.0), (123.4, 567.8), (595.3, 841.88))) {
      val (dx, dy) = PageCoords.pageToDevice(p, 400, 600, pt._1, pt._2)
      val (rx, ry) = PageCoords.deviceToPage(p, 400, 600, dx, dy)
      assert(math.abs(rx - pt._1) < 1e-9 && math.abs(ry - pt._2) < 1e-9)
    }
  }

  test("search flags: match_case / whole_word / consecutive (textpage.py:255-292)") {
    val tp = load("text.pdf").page(0).textPage
    assert(tp.search("Lorem", matchCase = true).nonEmpty)
    assert(tp.search("lorem", matchCase = true).isEmpty)
    assert(tp.search("labor", matchWholeWord = true).isEmpty) // only labore/laboris/laborum
    assert(tp.search("laborum", matchWholeWord = true).length == 1)
  }

  test("search start index (textpage.py:255 search(text, index=0, ...))") {
    val tp = load("text.pdf").page(0).textPage
    val all = tp.search("labor")
    assert(all.length >= 2)
    // starting AT the second hit skips the first but keeps the rest
    assert(tp.search("labor", index = all(1)._1) == all.drop(1))
    // starting one past it drops it too
    assert(tp.search("labor", index = all(1)._1 + 1) == all.drop(2))
    // past the end: no matches; negative start rejected like empty needle
    assert(tp.search("labor", index = tp.text.length).isEmpty)
    assertThrows[IllegalArgumentException](tp.search("labor", index = -1))
  }

  test("objects enumeration with type filter (page.py:274-325)") {
    val p = load("images.pdf").page(0)
    assert(p.objects().length == 4)
    assert(p.objects(Set("image")).length == 3)
    assert(p.objects(Set("text")).map(_.text) == Vector("Images"))
    val img = p.objects(Set("image")).head
    assert(img.imgWidth == 115 && img.imgHeight == 48 && img.imgBpc == 1)
    assert(img.imgColorspace == "DeviceGray" && img.imgFilters == Vector("CCITTFaxDecode"))
    // quad points CCW from bottom-left (pageobjects.py:108-129)
    val quads = Reports.quadPoints(img.bounds)
    assert(quads.length == 4 && quads(0) == ((img.bounds.left, img.bounds.bottom)))
  }

  test("image nested in a form XObject is found with its container level " +
       "(test_pageobjects.py:268-282)") {
    val p = load("form_object_with_image.pdf").page(0)
    val imgs = p.objects(Set("image"))
    // the reference asserts exactly one image whose container is a FORM
    assert(imgs.length == 1, s"got ${imgs.length} images")
    assert(imgs.head.level >= 1, "image must be nested inside the form (level ≥ 1)")
    assert(p.objects(Set("form")).nonEmpty, "the form container itself enumerates")
    // smart extraction reaches through the form
    val extracted = ImageExtract.pageImages(p)
    assert(extracted.length == 1)
    assert(extracted.head.width == imgs.head.imgWidth && extracted.head.height == imgs.head.imgHeight)
  }

  test("multipage boxes match pdfinfo golden (4dp)") {
    val d = load("multipage.pdf")
    def r4(v: Double) = math.round(v * 10000) / 10000.0
    assert(d.pages.map(p => (r4(p.width), r4(p.height))) ==
      Vector((595.2756, 841.8898), (595.2756, 419.5276), (297.6378, 419.5276)))
  }
}
