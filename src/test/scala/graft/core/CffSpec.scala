package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** CFF parser + Type2 interpreter validation over a hand-assembled minimal
  * CFF binary (the fixture corpus has no FontFile3, so the test font is
  * built from the #5176 spec structures directly). */
object CffTestBuilder {

  private def num28(v: Int): Array[Byte] = Array(28, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def dictInt(v: Int): Array[Byte] = Array(29.toByte,
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  /** INDEX with 1-byte offsets. */
  private def index(entries: Seq[Array[Byte]]): Array[Byte] = {
    if (entries.isEmpty) return Array(0, 0)
    val out = new java.io.ByteArrayOutputStream()
    out.write(entries.length >> 8); out.write(entries.length & 0xff)
    out.write(1) // offSize
    var off = 1
    out.write(off)
    entries.foreach { e => off += e.length; out.write(off) }
    entries.foreach(out.write)
    out.toByteArray
  }

  /** Two glyphs: .notdef (empty) and "a" — a 200×200 square at (100,100)
    * with width 400 (nominalWidthX 0 → leading width arg), drawn with
    * rmoveto + alternating h/vlineto. Plus "b": a curve glyph via rrcurveto. */
  def build(): Array[Byte] = {
    val notdef = Array[Byte](14)
    val sq = (num28(400) ++ num28(100) ++ num28(100) ++ Array[Byte](21) ++ // w dx dy rmoveto
      num28(200) ++ Array[Byte](6) ++  // hlineto
      num28(200) ++ Array[Byte](7) ++  // vlineto
      num28(-200) ++ Array[Byte](6) ++ // hlineto
      Array[Byte](14))                 // endchar
    val crv = (num28(300) ++ num28(0) ++ num28(0) ++ Array[Byte](21) ++
      num28(50) ++ num28(0) ++ num28(50) ++ num28(50) ++ num28(0) ++ num28(50) ++ Array[Byte](8) ++ // rrcurveto
      Array[Byte](14))
    val charStrings = index(Seq(notdef, sq, crv))

    // charset format 0: gid1 → SID of "a", gid2 → SID of "b"
    val sidA = 66 // "a" in the standard strings
    val sidB = 67
    val charset = Array[Byte](0, (sidA >> 8).toByte, (sidA & 0xff).toByte,
      (sidB >> 8).toByte, (sidB & 0xff).toByte)

    // private dict: defaultWidthX 500 (op 20), nominalWidthX 0 (op 21)
    val priv = dictInt(500) ++ Array[Byte](20) ++ dictInt(0) ++ Array[Byte](21)

    val header = Array[Byte](1, 0, 4, 1)
    val nameIdx = index(Seq("TestCFF".getBytes))
    val stringIdx = index(Seq.empty)
    val gsubrIdx = index(Seq.empty)

    // top dict references absolute offsets — assemble with a fixed-size
    // top dict (5-byte ints) and compute in a second pass
    def topDict(csAt: Int, charsetAt: Int, privAt: Int): Array[Byte] =
      dictInt(charsetAt) ++ Array[Byte](15) ++
        dictInt(csAt) ++ Array[Byte](17) ++
        dictInt(priv.length) ++ dictInt(privAt) ++ Array[Byte](18)
    val topSize = topDict(0, 0, 0).length
    val topIdxSize = index(Seq(new Array[Byte](topSize))).length
    val fixedPrefix = header.length + nameIdx.length + topIdxSize + stringIdx.length + gsubrIdx.length
    val charsetAt = fixedPrefix
    val privAt = charsetAt + charset.length
    val csAt = privAt + priv.length
    val top = index(Seq(topDict(csAt, charsetAt, privAt)))
    header ++ nameIdx ++ top ++ stringIdx ++ gsubrIdx ++ charset ++ priv ++ charStrings
  }
}

class CffSpec extends AnyFunSuite {

  lazy val cff: CffFont = CffFont.parse(CffTestBuilder.build())
    .getOrElse(fail("CFF parse failed"))

  test("structure: glyph count, charset names, widths") {
    assert(cff.numGlyphs == 3)
    assert(cff.gidForName("a").contains(1))
    assert(cff.gidForName("b").contains(2))
    assert(cff.emAdvance(1).contains(0.4))   // leading width arg: nominal 0 + 400
    assert(cff.emAdvance(0).contains(0.5))   // .notdef: defaultWidthX
  }

  test("Type2 square: exact control box and contour points") {
    val bb = cff.emBBox(1).getOrElse(fail("no bbox"))
    assert(math.abs(bb.left - 0.1) < 1e-9 && math.abs(bb.bottom - 0.1) < 1e-9)
    assert(math.abs(bb.right - 0.3) < 1e-9 && math.abs(bb.top - 0.3) < 1e-9)
    val cs = cff.emContours(1)
    assert(cs.length == 1 && cs.head.length == 8) // 4 corner points
  }

  test("Type2 curve glyph: bbox within the control hull") {
    val bb = cff.emBBox(2).getOrElse(fail("no bbox"))
    assert(bb.left >= -1e-9 && bb.bottom >= -1e-9)
    assert(bb.right <= 0.1 + 1e-9 && bb.top <= 0.1 + 1e-9)
    assert(bb.width > 0.05 && bb.height > 0.05)
  }

  test("decoder integration: FontFile3 PDF gets CFF charboxes and outlines") {
    // embed the test CFF via /FontFile3 /Subtype/Type1C in a one-page PDF
    val cffBytes = CffTestBuilder.build()
    val content = "BT /F1 10 Tf 1 0 0 1 100 700 Tm (aa) Tj ET"
    val fontObjs = Vector(
      "<</Type/Catalog/Pages 2 0 R>>".getBytes,
      "<</Type/Pages/Kids[3 0 R]/Count 1>>".getBytes,
      "<</Type/Page/Parent 2 0 R/MediaBox[0 0 612 792]/Resources<</Font<</F1 4 0 R>>>>/Contents 5 0 R>>".getBytes,
      ("<</Type/Font/Subtype/Type1/BaseFont/TestCFF/FirstChar 97/LastChar 97" +
        "/Widths[400]/FontDescriptor 6 0 R>>").getBytes,
      (s"<</Length ${content.length}>>\nstream\n$content\nendstream").getBytes,
      "<</Type/FontDescriptor/FontName/TestCFF/Flags 4/FontBBox[0 0 400 400]/ItalicAngle 0/Ascent 400/Descent 0/StemV 80/FontFile3 7 0 R>>".getBytes,
      (s"<</Subtype/Type1C/Length ${cffBytes.length}>>\nstream\n".getBytes ++ cffBytes ++ "\nendstream".getBytes): Array[Byte])
    val pdf = SynthPdf.build(fontObjs)
    val doc = PdfDocument.load(pdf).toOption.get
    val tp = doc.page(0).textPage
    assert(tp.text == "aa")
    // charbox = CFF square box scaled by fontsize 10: (1,1)-(3,3) around origin (100,700)
    val box = tp.charBox(0).toOption.get
    assert(math.abs(box.left - 101.0) < 1e-6 && math.abs(box.bottom - 701.0) < 1e-6, s"box=$box")
    assert(math.abs(box.right - 103.0) < 1e-6 && math.abs(box.top - 703.0) < 1e-6, s"box=$box")
    // and the rasterizer draws the square outline
    val fonts = ContentInterpreter.run(doc.page(0)).textObjects.map(_.font).distinct
    assert(fonts.head.glyphOutline('a'.toInt).nonEmpty)
  }
}
