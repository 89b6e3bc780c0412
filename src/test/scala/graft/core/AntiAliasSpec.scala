package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.core.render.Rasterizer

/** Smoothing-flag surface (reference page.py:392-410: optimize_mode,
  * no_smoothtext / no_smoothimage / no_smoothpath). Coverage math is pinned
  * by construction: a half-covered edge pixel composites at exactly 0.5. */
class AntiAliasSpec extends AnyFunSuite {

  private def pageOf(content: String) =
    PdfDocument.load(SynthPdf.onePage(content)).toOption.get.page(0)

  private def same(a: render.Bitmap, b: render.Bitmap): Boolean =
    java.util.Arrays.equals(a.buf, b.buf)

  test("path AA: half-covered edge pixel composites at coverage 0.5") {
    // left edge at x=100.5 → pixel column 100 is half red, half white;
    // right edge at 150.5 → column 150 likewise. Interior stays pure.
    val page = pageOf("1 0 0 rg 100.5 600 50 30 re f")
    val plain = Rasterizer.render(page)
    val aa = Rasterizer.render(page, antiAlias = true)
    assert(plain.get(100, 175) == 0xFFFFFFFF) // binary: rounds the edge out
    assert(aa.get(100, 175) == 0xFFFF8080, f"edge=${aa.get(100, 175)}%08x")
    assert(aa.get(150, 175) == 0xFFFF8080)
    assert(aa.get(125, 175) == 0xFFFF0000) // interior AA-invariant
    assert(plain.get(125, 175) == 0xFFFF0000)
  }

  test("integer-aligned geometry is AA-invariant; noSmoothPath disables path AA") {
    val page = pageOf("1 0 0 rg 100 600 50 30 re f")
    val plain = Rasterizer.render(page)
    assert(same(plain, Rasterizer.render(page, antiAlias = true)))
    val fractional = pageOf("1 0 0 rg 100.5 600 50 30 re f")
    assert(same(Rasterizer.render(fractional),
      Rasterizer.render(fractional, antiAlias = true, noSmoothPath = true)))
  }

  test("diagonal edge gains intermediate coverage pixels under AA") {
    val page = pageOf("0 0 0 rg 100 600 m 200 600 l 100 700 l f")
    val aa = Rasterizer.render(page, antiAlias = true)
    // scan the hypotenuse band for a pixel strictly between black and white
    val mid = (0 until 612).exists { x =>
      val p = aa.get(x, 142) & 0xff // device row through the diagonal
      p > 30 && p < 225
    }
    assert(mid, "no intermediate-coverage pixel found along the diagonal")
  }

  test("text AA: optimize_mode lcd smooths glyphs; no_smoothtext overrides it") {
    val doc = PdfDocument.load(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/tests/resources/text.pdf"))).toOption.get
    val page = doc.page(0)
    val plain = Rasterizer.render(page)
    val lcd = Rasterizer.render(page, optimizeMode = Some("lcd"))
    assert(!same(plain, lcd), "lcd mode must smooth glyph edges")
    // smoothed glyphs have gray transition pixels absent from the binary fill
    val grays = lcd.buf.count { p =>
      val g = p & 0xff; g > 30 && g < 225 && ((p >> 8) & 0xff) == g
    }
    assert(grays > 100, s"grays=$grays")
    assert(same(plain, Rasterizer.render(page, optimizeMode = Some("lcd"), noSmoothText = true)))
    // antiAlias alone also smooths text; noSmoothText carves text back out
    assert(!same(plain, Rasterizer.render(page, antiAlias = true)))
  }

  test("image smoothing: bilinear between source pixels; print mode and noSmoothImage disable") {
    // 2×2 checker scaled ×50: under bilinear the horizontal midpoint of the
    // top row blends black→white; nearest keeps a hard step
    val content = "q 100 0 0 100 50 600 cm BI /W 2 /H 2 /BPC 8 /CS /G ID " +
      "\u0000\u00ff\u00ff\u0000 EI Q"
    val page = pageOf(content)
    val plain = Rasterizer.render(page)
    val aa = Rasterizer.render(page, antiAlias = true)
    val midTop = aa.get(100, 120) & 0xff
    assert(midTop > 60 && midTop < 200, s"mid=$midTop")
    assert((plain.get(100, 120) & 0xff) == 255) // nearest: already on the white side
    // deep-interior sample stays near-pure under the 2×2's long gradient
    assert((aa.get(60, 100) & 0xff) < 60)
    assert(same(plain, Rasterizer.render(page, antiAlias = true, noSmoothImage = true)))
    assert(same(plain, Rasterizer.render(page, antiAlias = true, optimizeMode = Some("print"))))
  }
}
