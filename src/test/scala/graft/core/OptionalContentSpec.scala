package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.core.render.Rasterizer

/** Optional-content (layer) semantics: default-OFF groups must not paint,
  * while their text still extracts (the PDFium split: render honors OC,
  * the text page does not). */
class OptionalContentSpec extends AnyFunSuite {

  private def px(bmp: render.Bitmap): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    var y = 0
    while (y < bmp.height) {
      var x = 0
      while (x < bmp.width) {
        val v = bmp.get(x, y)
        md.update((v >> 16).toByte); md.update((v >> 8).toByte); md.update(v.toByte)
        x += 1
      }
      y += 1
    }
    md.digest().map(b => f"${b & 0xff}%02x").mkString
  }

  test("default-OFF watermark layer: pixels equal the watermark-free twin") {
    val layered = PdfDocument.load(
      graft.ops.PdfCompose.synthLayeredPdf(withWatermark = true)).toOption.get
    val plain = PdfDocument.load(
      graft.ops.PdfCompose.synthLayeredPdf(withWatermark = false)).toOption.get
    val a = Rasterizer.render(layered.page(0))
    val b = Rasterizer.render(plain.page(0))
    assert(px(a) == px(b), "OFF layer painted — watermark leaked into pixels")
    // sanity: the page is not blank (body text did paint)
    val blank = Rasterizer.render(PdfDocument.load(
      graft.ops.PdfCompose.synthLayeredPdf(withWatermark = false)
    ).toOption.get.page(0))
    assert(px(a) == px(blank)) // same as body-only render
    var nonWhite = 0
    for (y <- 0 until a.height; x <- 0 until a.width)
      if (a.get(x, y) != 0xFFFFFFFF) nonWhite += 1
    assert(nonWhite > 50, s"body text should paint (nonWhite=$nonWhite)")
  }

  test("hidden-layer text still EXTRACTS (PDFium text-page behavior)") {
    val bytes = graft.ops.PdfCompose.synthLayeredPdf(withWatermark = true)
    val r = Extract.extractText(bytes)
    assert(r.ok)
    val all = r.pages.map(_.text).mkString
    assert(all.contains("DRAFT WATERMARK"), s"hidden text missing from: $all")
    assert(all.contains("Visible body text."))
  }

  test("groups enumeration and OCMD all-off semantics") {
    val doc = PdfDocument.load(
      graft.ops.PdfCompose.synthLayeredPdf(withWatermark = true)).toOption.get
    assert(OptionalContent.groups(doc) ==
      Vector(("Watermark", false), ("Body", true)))
    val off = OptionalContent.offRefs(doc)
    assert(off.size == 1)
    // OCMD with ALL members off -> hidden; any ON member -> visible
    val wmRef = PdfRef(off.head._1, off.head._2)
    val ocmdAllOff = PdfDict(Map("Type" -> PdfName("OCMD"),
      "OCGs" -> PdfArray(Vector(wmRef))))
    assert(OptionalContent.isHidden(doc, ocmdAllOff, off))
    val ocmdMixed = PdfDict(Map("Type" -> PdfName("OCMD"),
      "OCGs" -> PdfArray(Vector(wmRef, PdfRef(7, 0)))))
    assert(!OptionalContent.isHidden(doc, ocmdMixed, off))
    // empty OCGs -> visible (fail open)
    assert(!OptionalContent.isHidden(doc,
      PdfDict(Map("Type" -> PdfName("OCMD"))), off))
  }

  test("hidden layer text inside a FORM XObject does not render (OC crosses form boundary)") {
    // watermark text lives in a Form XObject drawn inside /OC WM BDC..EMC
    val formCs = "BT /F1 24 Tf 1 0 0 1 120 400 Tm (FORM WATERMARK) Tj ET"
    val pageCs =
      """/OC /WM BDC
        |/Fm1 Do
        |EMC
        |0 0 0 rg
        |BT /F1 12 Tf 1 0 0 1 72 700 Tm (Body.) Tj ET""".stripMargin
    def build(withOcProps: Boolean) = RawPdf.assemble(Seq(
      if (withOcProps)
        "<</Type/Catalog/Pages 2 0 R/OCProperties<</OCGs[7 0 R]/D<</OFF[7 0 R]>>>>>>"
      else "<</Type/Catalog/Pages 2 0 R>>",
      "<</Type/Pages/Kids[3 0 R]/Count 1>>",
      "<</Type/Page/Parent 2 0 R/MediaBox[0 0 612 792]/Contents 4 0 R" +
        "/Resources<</Font<</F1 5 0 R>>/Properties<</WM 7 0 R>>" +
        "/XObject<</Fm1 6 0 R>>>>>>",
      s"<</Length ${pageCs.length}>>\nstream\n$pageCs\nendstream",
      "<</Type/Font/Subtype/Type1/BaseFont/Helvetica>>",
      s"<</Type/XObject/Subtype/Form/BBox[0 0 612 792]" +
        s"/Resources<</Font<</F1 5 0 R>>>>/Length ${formCs.length}>>\nstream\n$formCs\nendstream",
      "<</Type/OCG/Name(WM)>>"))
    val hidden = PdfDocument.load(build(true)).toOption.get
    val bmp = render.Rasterizer.render(hidden.page(0))
    // the 24pt watermark glyphs around y≈392 (device) must NOT paint
    var inked = 0
    for (y <- 370 to 410; x <- 110 to 420) if (bmp.get(x, y) != 0xFFFFFFFF) inked += 1
    assert(inked == 0, s"hidden form text painted ($inked px)")
    // same doc WITHOUT OCProperties: the layer defaults ON and must paint
    val shown = PdfDocument.load(build(false)).toOption.get
    val bmp2 = render.Rasterizer.render(shown.page(0))
    var inked2 = 0
    for (y <- 370 to 410; x <- 110 to 420) if (bmp2.get(x, y) != 0xFFFFFFFF) inked2 += 1
    assert(inked2 > 20, s"control render should paint the form text ($inked2 px)")
  }

  test("/BaseState /OFF hides everything except the /ON list") {
    val pdf = RawPdf.assemble(Seq(
      "<</Type/Catalog/Pages 2 0 R/OCProperties<</OCGs[4 0 R 5 0 R]" +
        "/D<</BaseState/OFF/ON[5 0 R]>>>>>>",
      "<</Type/Pages/Kids[3 0 R]/Count 1>>",
      "<</Type/Page/Parent 2 0 R/MediaBox[0 0 100 100]>>",
      "<</Type/OCG/Name(Hidden)>>",
      "<</Type/OCG/Name(Shown)>>"))
    val doc = PdfDocument.load(pdf).toOption.get
    assert(OptionalContent.groups(doc) == Vector(("Hidden", false), ("Shown", true)))
    assert(OptionalContent.offRefs(doc).size == 1)
  }

  test("OCMD with an INDIRECT /OCGs array resolves membership correctly") {
    val pdf = RawPdf.assemble(Seq(
      "<</Type/Catalog/Pages 2 0 R/OCProperties<</OCGs[4 0 R]/D<</OFF[4 0 R]>>>>>>",
      "<</Type/Pages/Kids[3 0 R]/Count 1>>",
      "<</Type/Page/Parent 2 0 R/MediaBox[0 0 100 100]>>",
      "<</Type/OCG/Name(W)>>",
      "[4 0 R]", // object 5: the OCGs array, referenced indirectly
      "<</Type/OCMD/OCGs 5 0 R>>"))
    val doc = PdfDocument.load(pdf).toOption.get
    val off = OptionalContent.offRefs(doc)
    // OCMD -> indirect array -> all members OFF -> hidden
    assert(OptionalContent.isHidden(doc, PdfRef(6, 0), off))
  }
}
