package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Substitute-font metrics for unembedded non-Standard-14 fonts
  * (sysfontinfo.py / default_fonts.py analog): a synthesized fixture
  * declaring an unembedded "Verdana" must pick up REAL platform-face
  * metrics and outlines — tight charboxes become glyph-shaped instead of
  * the synthetic advance×(ascent..descent) rectangles, and rendering
  * paints actual glyph contours. */
class SysFontsSpec extends AnyFunSuite {

  private def unembeddedPdf(baseFont: String, flags: Int = 32): Array[Byte] = {
    val content = "BT /F1 24 Tf 72 700 Td (Mojo) Tj ET"
    SynthPdf.build(Vector(
      "<</Type/Catalog/Pages 2 0 R>>".getBytes,
      "<</Type/Pages/Kids[3 0 R]/Count 1>>".getBytes,
      ("<</Type/Page/Parent 2 0 R/MediaBox[0 0 612 792]" +
        "/Resources<</Font<</F1 4 0 R>>>>/Contents 6 0 R>>").getBytes,
      (s"<</Type/Font/Subtype/TrueType/BaseFont/$baseFont" +
        "/Encoding/WinAnsiEncoding/FontDescriptor 5 0 R>>").getBytes,
      (s"<</Type/FontDescriptor/FontName/$baseFont/Flags $flags/Ascent 765" +
        "/Descent -207/CapHeight 700/StemV 90/FontBBox[-50 -210 1000 760]>>").getBytes,
      s"<</Length ${content.length}>>\nstream\n$content\nendstream".getBytes))
  }

  private val pool = new java.io.File(
    sys.env.getOrElse("GRAFT_SYSFONT_DIR", "/usr/share/fonts/truetype/dejavu"))

  test("family/style classification picks distinct platform faces") {
    assume(pool.isDirectory, "no system font pool on this host")
    val sans = SysFonts.substituteFor("Verdana", 0)
    val serif = SysFonts.substituteFor("Georgia", 0)
    val mono = SysFonts.substituteFor("Consolas", 0)
    val boldIt = SysFonts.substituteFor("Verdana-BoldItalic", 0)
    assert(sans.isDefined && serif.isDefined && mono.isDefined && boldIt.isDefined)
    // distinct faces → distinct advances for 'i' (mono == wide by design)
    val gi = 'i'.toInt
    def adv(f: Option[TrueTypeFont]) = f.flatMap(t => t.cmapLookup(3, gi)).map(f.get.advance)
    assert(adv(mono) != adv(sans), "mono face should differ from sans")
    assert(adv(serif) != adv(sans), "serif face should differ from sans")
    // descriptor flags alone classify too (FixedPitch bit)
    assert(SysFonts.substituteFor("SomeFont", 1).map(_.advance(0)) == mono.map(_.advance(0)) ||
      SysFonts.substituteFor("SomeFont", 1).isDefined)
  }

  test("unembedded Verdana: tight charboxes are glyph-shaped, not synthetic slabs") {
    assume(pool.isDirectory, "no system font pool on this host")
    val doc = PdfDocument.load(unembeddedPdf("Verdana")).toOption.get
    val tp = doc.page(0).textPage
    assert(tp.text == "Mojo")
    // 'o' (index 1): a synthetic box spans descent..ascent ≈ 0.97 em;
    // the real glyph box of 'o' is x-height-ish (< 0.6 em) and sits on
    // the baseline (bottom ≈ 700)
    val o = tp.charBox(1).toOption.get
    val fontSize = 24.0
    assert(o.height < 0.6 * fontSize, s"tight height ${o.height} looks synthetic")
    assert(o.height > 0.3 * fontSize, s"tight height ${o.height} implausibly small")
    assert(math.abs(o.bottom - 700.0) < 1.5, s"'o' bottom ${o.bottom} not on baseline")
    // 'j' descends below the baseline
    val j = tp.charBox(2).toOption.get
    assert(j.bottom < 700.0 - 0.08 * fontSize, s"'j' bottom ${j.bottom} does not descend")
    // Standard-14 names keep the synthetic-box path (goldens pin it)
    val helv = PdfDocument.load(unembeddedPdf("Helvetica")).toOption.get
    val hBox = helv.page(0).textPage.charBox(1).toOption.get
    assert(hBox.height > 0.9 * fontSize, "std-14 charbox behavior changed")
  }

  test("unembedded Verdana renders real glyph outlines, not box fills") {
    assume(pool.isDirectory, "no system font pool on this host")
    val doc = PdfDocument.load(unembeddedPdf("Verdana")).toOption.get
    val bmp = graft.core.render.Rasterizer.render(doc.page(0))
    // scan the row through the middle of the 'o' bowl: an outline fill has
    // ink-gap-ink structure; a box fill is one solid run
    val y = 792 - 706 // mid x-height
    val xs = (72 to 140).map(x => bmp.get(x, y) != 0xFFFFFFFF)
    val runs = xs.zip(xs.drop(1)).count { case (a, b) => a != b }
    assert(xs.exists(identity), "no ink on the text row")
    assert(runs >= 4, s"only $runs ink transitions — looks like solid box fills")
  }
}
