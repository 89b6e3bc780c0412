package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Type1 (/FontFile) parsing validated against the real embedded program in
  * render.pdf (BAAAAA+CantarellRegular, Length1/2/3 = 621/2231/532). */
class Type1FontSpec extends AnyFunSuite {

  private lazy val doc = PdfDocument.load(java.nio.file.Files.readAllBytes(
    java.nio.file.Paths.get("/root/reference/tests/resources/render.pdf"))).toOption.get

  private lazy val t1: Type1Font = {
    val ff = (1 to 60).iterator.map(doc.getObject).collectFirst {
      case s @ PdfStream(d, _) if d.contains("Length1") && d.contains("Length2") => s
    }.getOrElse(fail("no FontFile stream found"))
    val data = doc.streamData(ff)
    def len(k: String) = doc.resolve(ff.dict(k)) match { case PdfNumber(v) => v.toInt; case _ => 0 }
    Type1Font.parse(data, len("Length1"), len("Length2")).getOrElse(fail("Type1 parse failed"))
  }

  test("charstrings parse: subset glyphs present with outlines") {
    assert(t1.glyphNames.contains(".notdef"))
    assert(t1.glyphNames.size > 3, s"names=${t1.glyphNames}")
    val drawable = t1.glyphNames.filter(n => n != ".notdef" && t1.emContours(n).nonEmpty)
    assert(drawable.nonEmpty, s"no drawable glyphs in ${t1.glyphNames}")
  }

  test("glyph widths match the PDF /Widths array") {
    // find the font dict: /Type/Font with /Widths + /FirstChar
    val fontDict = (1 to 60).iterator.map(doc.getObject).collectFirst {
      case d: PdfDict if d.get("Type").contains(PdfName("Font")) && d.contains("Widths") => d
    }.getOrElse(fail("no font dict"))
    val firstChar = doc.resolve(fontDict("FirstChar")) match { case PdfNumber(v) => v.toInt; case _ => 0 }
    val widths = doc.resolve(fontDict("Widths")) match {
      case PdfArray(items) => items.map(doc.resolve).collect { case PdfNumber(v) => v }
      case _ => fail("no widths")
    }
    // builtin encoding gives code → name; compare charstring width vs /Widths
    var checked = 0
    t1.encoding.foreach { case (code, name) =>
      val idx = code - firstChar
      if (idx >= 0 && idx < widths.length && t1.hasGlyph(name)) {
        val w = t1.emAdvance(name).get * 1000
        assert(math.abs(w - widths(idx)) < 1.0, s"code=$code name=$name t1=$w pdf=${widths(idx)}")
        checked += 1
      }
    }
    assert(checked >= 3, s"checked=$checked")
  }

  test("decoder integration: render.pdf text gets exact Type1 charboxes and outlines") {
    val fonts = ContentInterpreter.run(doc.page(0)).textObjects.map(_.font).distinct
    val f = fonts.find(_.type1.isDefined).getOrElse(fail("no Type1-backed decoder"))
    // at least one shown charcode must produce a real outline + tight box
    val codes = f.type1.get.encoding.keys.toSeq.sorted
    val withOutline = codes.filter(c => f.glyphOutline(c).nonEmpty)
    assert(withOutline.nonEmpty, s"encoding=${f.type1.get.encoding}")
    withOutline.foreach { c =>
      val bb = f.glyphBBox(c).getOrElse(fail(s"no bbox for code $c"))
      assert(bb.width > 0 && bb.height > 0)
    }
  }

  test("seac accent composition: synthetic encrypted Type1 font") {
    // independent test-side Type1 writer: charstring + eexec encryption
    def encrypt(data: Array[Byte], r0: Int, prefix: Int): Array[Byte] = {
      var r = r0
      val in = Array.fill[Byte](prefix)(0x55) ++ data
      val out = new Array[Byte](in.length)
      var i = 0
      while (i < in.length) {
        val p = in(i) & 0xff
        val c = p ^ (r >> 8)
        r = ((c + r) * 52845 + 22719) & 0xffff
        out(i) = c.toByte
        i += 1
      }
      out
    }
    def num(v: Int): Array[Byte] = { require(v >= -107 && v <= 107); Array((v + 139).toByte) }
    // base 'a': 100-wide square; accent 'quoteright': 50 square; composite
    // glyph 'aacute': seac(0, 25, 100, 97, 39)
    val csA = num(0) ++ num(100) ++ Array[Byte](13) ++ // hsbw
      num(0) ++ num(0) ++ Array[Byte](21) ++           // rmoveto
      num(100) ++ num(0) ++ Array[Byte](5) ++ num(0) ++ num(100) ++ Array[Byte](5) ++
      num(-100) ++ num(0) ++ Array[Byte](5) ++ Array[Byte](9, 14)
    val csQ = num(0) ++ num(50) ++ Array[Byte](13) ++
      num(0) ++ num(0) ++ Array[Byte](21) ++
      num(50) ++ num(0) ++ Array[Byte](5) ++ num(0) ++ num(50) ++ Array[Byte](5) ++
      num(-50) ++ num(0) ++ Array[Byte](5) ++ Array[Byte](9, 14)
    val csComp = num(0) ++ num(100) ++ Array[Byte](13) ++
      num(0) ++ num(25) ++ num(100) ++ num(97) ++ num(39) ++ Array[Byte](12, 6) // seac
    def entry(name: String, cs: Array[Byte]): Array[Byte] = {
      val enc = encrypt(cs, 4330, 4)
      s"/$name ${enc.length} RD ".getBytes("ISO-8859-1") ++ enc ++ " ND\n".getBytes("ISO-8859-1")
    }
    val privPlain = "dup /Private 1 dict\n/Subrs 0 array NP\n/CharStrings 3 dict dup begin\n".getBytes("ISO-8859-1") ++
      entry("a", csA) ++ entry("quoteright", csQ) ++ entry("aacute", csComp) ++
      "end\n".getBytes("ISO-8859-1")
    val encPart = encrypt(privPlain, 55665, 4)
    val clear = ("%!PS-AdobeFont-1.0: SeacTest\n/FontMatrix [0.001 0 0 0.001 0 0] def\n" +
      "/Encoding 256 array\ndup 97 /a put\ndup 228 /aacute put\nreadonly def\ncurrentdict end\n" +
      "currentfile eexec\n").getBytes("ISO-8859-1")
    val t1 = Type1Font.parse(clear ++ encPart).getOrElse(fail("synthetic Type1 parse failed"))
    assert(t1.glyphNames == Set("a", "quoteright", "aacute"))
    // base square 0..100; accent shifted by (25, 100): 25..75 × 100..150
    val bb = t1.emBBox("aacute").getOrElse(fail("no composite bbox"))
    assert(math.abs(bb.left - 0.0) < 1e-9 && math.abs(bb.right - 0.1) < 1e-9, s"bb=$bb")
    assert(math.abs(bb.bottom - 0.0) < 1e-9 && math.abs(bb.top - 0.15) < 1e-9, s"bb=$bb")
    assert(t1.emContours("aacute").length == 2) // base + accent
    assert(t1.emAdvance("aacute").contains(0.1))
  }

  test("glyph bboxes sit inside the descriptor FontBBox") {
    val desc = (1 to 60).iterator.map(doc.getObject).collectFirst {
      case d: PdfDict if d.contains("FontBBox") && d.contains("FontFile") => d
    }.getOrElse(fail("no descriptor"))
    val bb = doc.resolve(desc("FontBBox")) match {
      case PdfArray(items) => items.map(doc.resolve).collect { case PdfNumber(v) => v / 1000.0 }
      case _ => fail("no bbox")
    }
    t1.glyphNames.foreach { n =>
      t1.emBBox(n).foreach { r =>
        assert(r.left >= bb(0) - 0.01 && r.right <= bb(2) + 0.01 &&
          r.bottom >= bb(1) - 0.01 && r.top <= bb(3) + 0.01,
          s"glyph $n bbox $r outside FontBBox $bb")
      }
    }
  }
}
