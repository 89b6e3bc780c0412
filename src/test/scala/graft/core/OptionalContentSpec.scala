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
}
