package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Writer round trips: a saved copy must re-load through our own parser and
  * yield byte-identical extracted text — the strongest in-repo invariant for
  * save/arrange/import semantics (reference document.py:247-275 save,
  * import_pages; arrange CLI). */
class PdfWriterSpec extends AnyFunSuite {

  private def fixture(name: String): Array[Byte] =
    java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"/root/reference/tests/resources/$name"))

  private def texts(bytes: Array[Byte], pw: String = ""): Vector[String] = {
    val ex = Extract.extractText(bytes, pw)
    assert(ex.ok, s"extract failed: ${ex.errCode} ${ex.errMsg}")
    ex.pages.map(_.text).toVector
  }

  test("save copy: every text fixture round-trips byte-identical text") {
    Seq("text.pdf", "multipage.pdf", "toc.pdf", "attachments.pdf",
      "render.pdf", "images.pdf", "forms.pdf").foreach { f =>
      val orig = fixture(f)
      val doc = PdfDocument.load(orig).toOption.get
      val saved = PdfWriter.write(doc)
      assert(texts(saved) == texts(orig), s"$f text changed through save")
    }
  }

  test("save copy of an encrypted doc opens without a password (decrypted copy)") {
    val orig = fixture("encrypted.pdf")
    val doc = PdfDocument.load(orig, "test_user").toOption.get
    val saved = PdfWriter.write(doc)
    assert(texts(saved) == texts(orig, "test_user"))
  }

  test("saved copy preserves metadata, TOC, and attachments") {
    val doc = PdfDocument.load(fixture("toc.pdf")).toOption.get
    val saved = PdfDocument.load(PdfWriter.write(doc)).toOption.get
    assert(saved.toc().map(e => (e.level, e.title)) == doc.toc().map(e => (e.level, e.title)))
    val adoc = PdfDocument.load(fixture("attachments.pdf")).toOption.get
    val asaved = PdfDocument.load(PdfWriter.write(adoc)).toOption.get
    assert(asaved.attachments.map(_.name) == adoc.attachments.map(_.name))
  }

  test("writePages: reverse + duplicate arrangement re-reads in that order") {
    val doc = PdfDocument.load(fixture("multipage.pdf")).toOption.get
    val n = doc.pageCount
    assert(n >= 3)
    val order = Seq(n - 1, 0, 0, 1) // reverse-ish with a duplicate
    val out = PdfWriter.writePages(order.map(i => (doc, i)))
    val origTexts = texts(fixture("multipage.pdf"))
    assert(texts(out) == order.map(origTexts).toVector)
  }

  test("writePages: cross-document import concatenates pages from two docs") {
    val a = PdfDocument.load(fixture("text.pdf")).toOption.get
    val b = PdfDocument.load(fixture("multipage.pdf")).toOption.get
    val out = PdfWriter.writePages(Seq((a, 0), (b, 0), (a, 0)))
    val ta = texts(fixture("text.pdf"))
    val tb = texts(fixture("multipage.pdf"))
    assert(texts(out) == Vector(ta(0), tb(0), ta(0)))
  }

  test("imgtopdf: JPEG embeds byte-identical and round-trips through extraction") {
    val jpeg = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/tests/resources/mona_lisa.jpg"))
    val pdf = PdfWriter.imagesToPdf(Seq(jpeg))
    val doc = PdfDocument.load(pdf).toOption.get
    assert(doc.pageCount == 1)
    val imgs = ImageExtract.pageImages(doc.page(0))
    assert(imgs.length == 1 && imgs.head.format == "jpg")
    assert(java.util.Arrays.equals(imgs.head.data, jpeg), "JPEG must pass through byte-identical")
    // page box = pixel size (1 px = 1 pt, reference imgtopdf page sizing)
    val bbox = doc.page(0).bbox
    assert(bbox.width == imgs.head.width && bbox.height == imgs.head.height)
    // and the page renders with the image's ink covering the full box
    val bmp = graft.core.render.Rasterizer.render(doc.page(0), scale = 0.25)
    assert(bmp.inkFraction > 0.9, s"ink=${bmp.inkFraction}")
  }

  test("imgtopdf: PNG input decodes to a Flate RGB image page (set_bitmap path)") {
    // deterministic 4×2 PNG: left half red, right half blue
    val src = new java.awt.image.BufferedImage(4, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 2; x <- 0 until 4) src.setRGB(x, y, if (x < 2) 0xFF0000 else 0x0000FF)
    val pngOut = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(src, "png", pngOut)
    val pdf = PdfWriter.imagesToPdf(Seq(pngOut.toByteArray))
    val doc = PdfDocument.load(pdf).toOption.get
    assert(doc.pageCount == 1 && doc.page(0).bbox.width == 4 && doc.page(0).bbox.height == 2)
    val bmp = graft.core.render.Rasterizer.render(doc.page(0), scale = 8)
    assert(bmp.get(8, 8) == 0xFFFF0000, f"left=${bmp.get(8, 8)}%08x")
    assert(bmp.get(24, 8) == 0xFF0000FF, f"right=${bmp.get(24, 8)}%08x")
  }

  test("imgtopdf: multiple images become one page each, in order") {
    val jpeg = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/tests/resources/mona_lisa.jpg"))
    val img = new java.awt.image.BufferedImage(3, 5, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val pngOut = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", pngOut)
    val pdf = PdfWriter.imagesToPdf(Seq(jpeg, pngOut.toByteArray))
    val doc = PdfDocument.load(pdf).toOption.get
    assert(doc.pageCount == 2)
    assert(doc.page(1).bbox.width == 3 && doc.page(1).bbox.height == 5)
  }

  test("writer output is deterministic (byte-identical across runs)") {
    val doc1 = PdfDocument.load(fixture("text.pdf")).toOption.get
    val doc2 = PdfDocument.load(fixture("text.pdf")).toOption.get
    assert(java.util.Arrays.equals(PdfWriter.write(doc1), PdfWriter.write(doc2)))
  }

  test("writeEdited: boxes, rotation, page delete/insert, attachments all round-trip") {
    val doc = PdfDocument.load(fixture("multipage.pdf")).toOption.get
    val origTexts = doc.pages.map(_.textPage.text)
    val spec = EditSpec(
      pageEdits = Map(0 -> PageEditSpec(
        mediaBox = Some(Rect(0, 0, 300, 400)),
        cropBox = Some(Rect(10, 10, 290, 390)),
        trimBox = Some(Rect(20, 20, 280, 380)),
        rotation = Some(270))),
      deletePages = Set(1),
      newPages = Seq((0, 150.0, 250.0)), // blank prepended
      delAttachments = Set.empty,
      newAttachments = Seq(("b.txt", "bee".getBytes), ("a.txt", "ay".getBytes)))
    val re = PdfDocument.load(PdfWriter.writeEdited(doc, spec)).toOption.get
    assert(re.pageCount == 3) // 3 - 1 deleted + 1 blank
    // blank page first, then edited page 0, then original page 2
    assert(re.page(0).bbox.width == 150 && re.page(0).bbox.height == 250)
    assert(re.page(0).textPage.text == "")
    assert(re.page(1).mediaBox == Rect(0, 0, 300, 400))
    assert(re.page(1).cropBox == Rect(10, 10, 290, 390))
    assert(re.page(1).trimBox == Rect(20, 20, 280, 380))
    assert(re.page(1).rotation == 270)
    assert(re.page(1).textPage.text == origTexts(0))
    assert(re.page(2).textPage.text == origTexts(2))
    // name tree sorted; payloads round-trip
    assert(re.attachments.map(_.name) == Vector("a.txt", "b.txt"))
    assert(new String(re.attachments(1).data) == "bee")
  }

  test("writeEdited: del_attachment removes by name, rest preserved byte-identical") {
    val doc = PdfDocument.load(fixture("attachments.pdf")).toOption.get
    val orig = doc.attachments
    assert(orig.map(_.name) == Vector("1.txt", "attached.pdf"))
    val re = PdfDocument.load(PdfWriter.writeEdited(doc,
      EditSpec(delAttachments = Set("1.txt")))).toOption.get
    assert(re.attachments.map(_.name) == Vector("attached.pdf"))
    assert(java.util.Arrays.equals(re.attachments(0).data, orig(1).data))
  }

  test("writeEdited: appendContent inserts new text; transform scales the page content") {
    val doc = PdfDocument.load(fixture("multipage.pdf")).toOption.get
    // insert_obj / gen_content analog: new text object appended
    val re = PdfDocument.load(PdfWriter.writeEdited(doc, EditSpec(
      pageEdits = Map(0 -> PageEditSpec(
        appendContent = Some("BT /F1 24 Tf 72 100 Td (INSERTED) Tj ET")))))).toOption.get
    val t = re.page(0).textPage.text
    assert(t.contains("INSERTED") && t.contains("Page"), s"got: $t")
    // set_matrix analog: scale 0.5 halves every charbox dimension
    val origBox = doc.page(0).textPage.rects().head
    val re2 = PdfDocument.load(PdfWriter.writeEdited(doc, EditSpec(
      pageEdits = Map(0 -> PageEditSpec(
        transform = Some(Mat(0.5, 0, 0, 0.5, 0, 0))))))).toOption.get
    val newBox = re2.page(0).textPage.rects().head
    assert(math.abs(newBox.width - origBox.width / 2) < 0.5,
      s"width ${origBox.width} → ${newBox.width}, expected half")
  }

  test("writeEdited object edits: remove text, set_matrix and transform on images") {
    val d = PdfDocument.load(fixture("images.pdf")).toOption.get
    assert(d.page(0).objects().count(_.span.isDefined) == 4) // heading + 3 images
    val spec = EditSpec(pageEdits = Map(0 -> PageEditSpec(objectEdits = Seq(
      ObjectEdit(0, remove = true),
      ObjectEdit(1, setMatrix = Some(Mat(100, 0, 0, 50, 30, 40))),
      ObjectEdit(2, transform = Some(Mat(1, 0, 0, 1, 15, -10)))))))
    val re = PdfDocument.load(PdfWriter.writeEdited(d, spec)).toOption.get
    val p0 = re.page(0)
    assert(p0.textPage.text.isEmpty) // heading removed from extraction
    val objs = p0.objects()
    assert(objs.length == 3 && objs.forall(_.objType == "image"))
    def close(a: Double, b: Double) = math.abs(a - b) < 1e-4
    // set_matrix: device box exactly the requested unit-square image
    assert(close(objs(0).bounds.left, 30) && close(objs(0).bounds.bottom, 40) &&
      close(objs(0).bounds.right, 130) && close(objs(0).bounds.top, 90))
    // transform: translated by (+15, −10) from the source placement
    val src = d.page(0).objects()(2).bounds
    assert(close(objs(1).bounds.left, src.left + 15) && close(objs(1).bounds.bottom, src.bottom - 10))
    // untouched third image identical
    val src3 = d.page(0).objects()(3).bounds
    assert(close(objs(2).bounds.left, src3.left) && close(objs(2).bounds.top, src3.top))
  }

  test("writeEdited object edits: path object removal and re-placement") {
    // synthesize a page with two rects and a text line
    val content = "q 1 0 0 RG 10 10 50 20 re f Q\nq 0 1 0 RG 100 100 30 30 re f Q\nBT /F1 12 Tf 20 200 Td (keep) Tj ET"
    val pdf = SynthPdf.build(Vector(
      "<</Type/Catalog/Pages 2 0 R>>".getBytes,
      "<</Type/Pages/Kids[3 0 R]/Count 1>>".getBytes,
      ("<</Type/Page/Parent 2 0 R/MediaBox[0 0 300 300]/Resources<</Font<</F1 4 0 R>>>>" +
        "/Contents 5 0 R>>").getBytes,
      "<</Type/Font/Subtype/Type1/BaseFont/Helvetica>>".getBytes,
      s"<</Length ${content.length}>>\nstream\n$content\nendstream".getBytes))
    val d = PdfDocument.load(pdf).toOption.get
    val objs = d.page(0).objects()
    assert(objs.map(_.objType) == Vector("path", "path", "text"))
    assert(objs.forall(_.span.isDefined))
    val re = PdfDocument.load(PdfWriter.writeEdited(d, EditSpec(pageEdits = Map(0 ->
      PageEditSpec(objectEdits = Seq(
        ObjectEdit(0, remove = true),
        ObjectEdit(1, transform = Some(Mat(2, 0, 0, 2, 0, 0))))))))).toOption.get
    val after = re.page(0).objects()
    assert(after.map(_.objType) == Vector("path", "text"))
    // rect (100,100)-(130,130) scaled ×2 about the origin → (200,200)-(260,260)
    assert(math.abs(after(0).bounds.left - 200) < 1e-6 && math.abs(after(0).bounds.right - 260) < 1e-6)
    assert(re.page(0).textPage.text == "keep")
  }

  test("writeEdited object edits: invalid targets are rejected") {
    val d = PdfDocument.load(fixture("images.pdf")).toOption.get
    def edit(e: ObjectEdit) =
      PdfWriter.writeEdited(d, EditSpec(pageEdits = Map(0 -> PageEditSpec(objectEdits = Seq(e)))))
    assertThrows[IllegalArgumentException](edit(ObjectEdit(99, remove = true)))
    assertThrows[IllegalArgumentException](edit(ObjectEdit(0))) // no-op edit
    // overlapping edits on the same object rejected
    assertThrows[IllegalArgumentException](PdfWriter.writeEdited(d, EditSpec(pageEdits = Map(0 ->
      PageEditSpec(objectEdits = Seq(ObjectEdit(1, remove = true),
        ObjectEdit(1, transform = Some(Mat.identity))))))))
  }

  test("writeEdited rejects a non-quadrant rotation") {
    val doc = PdfDocument.load(fixture("multipage.pdf")).toOption.get
    intercept[IllegalArgumentException] {
      PdfWriter.writeEdited(doc,
        EditSpec(pageEdits = Map(0 -> PageEditSpec(rotation = Some(45)))))
    }
  }

  test("writeNUp: 2x2 imposition puts all three source pages on one sheet") {
    val doc = PdfDocument.load(fixture("multipage.pdf")).toOption.get
    val out = PdfWriter.writeNUp((0 until 3).map(i => (doc, i)), cols = 2, rowsPerSheet = 2)
    val re = PdfDocument.load(out).toOption.get
    assert(re.pageCount == 1)
    val t = re.page(0).textPage.text
    Seq("Page", "1", "2", "3").foreach(s => assert(t.contains(s), s"missing $s in: $t"))
    assert(re.page(0).mediaBox == doc.page(0).mediaBox)
  }

  test("writeNUp: 5 pages at 2x2 spill onto a second sheet") {
    val doc = PdfDocument.load(fixture("multipage.pdf")).toOption.get
    val sel = Seq((doc, 0), (doc, 1), (doc, 2), (doc, 0), (doc, 1))
    val re = PdfDocument.load(PdfWriter.writeNUp(sel, 2, 2)).toOption.get
    assert(re.pageCount == 2)
    assert(re.page(1).textPage.text.contains("2")) // 5th cell = source page idx 1
  }

  test("writeFieldValues: /V lands on the matching terminal field, others untouched") {
    val doc = PdfDocument.load(fixture("forms.pdf")).toOption.get
    val out = PdfWriter.writeFieldValues(doc,
      Map("Listbox_SingleSelect" -> "Chosen"))
    val re = PdfDocument.load(out).toOption.get
    val fields = re.formFieldsDetailed.map(f => f.name -> f.value).toMap
    assert(fields("Listbox_SingleSelect") == "Chosen")
    assert(fields("Listbox_MultiSelect") == "Banana") // untouched
    assert(re.pageCount == doc.pageCount)
  }

  test("fill then flatten: written field values survive into extracted page text") {
    // the filled-form archival flow: writeFieldValues generates appearance
    // streams, writeFlattened bakes them into content, extraction sees them
    val doc = PdfDocument.load(fixture("forms.pdf")).toOption.get
    val filled = PdfDocument.load(PdfWriter.writeFieldValues(doc,
      Map("Listbox_SingleSelect" -> "ChosenValue"))).toOption.get
    assert(!doc.pages.map(_.textPage.text).mkString.contains("ChosenValue"))
    val flat = PdfDocument.load(PdfWriter.writeFlattened(filled)).toOption.get
    val t = flat.pages.map(_.textPage.text).mkString("|")
    assert(t.contains("ChosenValue"), s"flattened text: $t")
    assert(flat.pages.map(_.annotations.size).sum == 0)
  }

  test("writeFlattened bakes annotation appearance text into page content") {
    val doc = PdfDocument.load(SynthPdf.annotPdf("hello body", "BAKED")).toOption.get
    assert(!doc.page(0).textPage.text.contains("BAKED"))
    assert(doc.page(0).annotations.length == 1)
    val re = PdfDocument.load(PdfWriter.writeFlattened(doc)).toOption.get
    val t = re.page(0).textPage.text
    assert(t.contains("hello body") && t.contains("BAKED"), s"got: $t")
    assert(re.page(0).annotations.isEmpty)
  }

  test("writeFlattened on a real form file: annots gone, body text intact") {
    val doc = PdfDocument.load(fixture("forms.pdf")).toOption.get
    val before = doc.pages.map(_.textPage.text)
    val re = PdfDocument.load(PdfWriter.writeFlattened(doc)).toOption.get
    assert(re.pages.map(_.annotations.size).sum == 0)
    // flattened content starts with the wrapped original — body text intact
    before.zip(re.pages.map(_.textPage.text)).foreach { case (b, a) =>
      assert(a.startsWith(b) || b.isEmpty, s"body lost: before=$b after=$a")
    }
  }
}
