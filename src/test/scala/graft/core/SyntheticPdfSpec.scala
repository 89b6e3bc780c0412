package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Hand-assembled minimal PDFs exercising paths the fixture corpus lacks:
  * rotated text runs, Tz/Tw/Tc state, generated word spaces, Tw on
  * code-32. Delegates to the main-source SynthPdf builder. */
object MiniPdf {
  def build(objs: Vector[Array[Byte]]): Array[Byte] = SynthPdf.build(objs)

  def onePage(content: String, fontDict: String =
      "<</Type/Font/Subtype/Type1/BaseFont/Helvetica>>"): Array[Byte] =
    SynthPdf.onePage(content, fontDict)

  /** imgtopdf analog (reference src/pypdfium2_cli/imgtopdf.py): embed a JPEG
    * as a DCTDecode image XObject on one page. */
  def jpegPdf(jpeg: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val imgHdr = s"<</Type/XObject/Subtype/Image/Width $w/Height $h/BitsPerComponent 8/ColorSpace/DeviceRGB/Filter/DCTDecode/Length ${jpeg.length}>>\nstream\n"
    val img = imgHdr.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1) ++ jpeg ++ "\nendstream".getBytes
    val content = s"q $w 0 0 $h 0 0 cm /Im1 Do Q"
    build(Vector(
      "<</Type/Catalog/Pages 2 0 R>>".getBytes,
      "<</Type/Pages/Kids[3 0 R]/Count 1>>".getBytes,
      s"<</Type/Page/Parent 2 0 R/MediaBox[0 0 $w $h]/Resources<</XObject<</Im1 4 0 R>>>>/Contents 5 0 R>>".getBytes,
      img,
      s"<</Length ${content.length}>>\nstream\n$content\nendstream".getBytes))
  }
}

class SyntheticPdfSpec extends AnyFunSuite {

  test("rotated text runs group into rotated lines") {
    // Tm [0 1 -1 0 x y] = 90° CCW: baseline direction (0,1).
    // 'Hello' up from (100,100); 'world' continues the same vertical line
    // with a word gap; 'Next' is a parallel line 30pt away.
    val content =
      """BT /F1 12 Tf
        |0 1 -1 0 100 100 Tm (Hello) Tj
        |0 1 -1 0 100 135 Tm (world) Tj
        |0 1 -1 0 130 100 Tm (Next) Tj
        |ET""".stripMargin
    val r = Extract.extractText(MiniPdf.onePage(content))
    assert(r.ok, r.errMsg)
    assert(r.pages.head.text == "Hello world\r\nNext", s"got: [${r.pages.head.text}]")
  }

  test("horizontal word-gap generates a space; small kerning does not") {
    val content =
      """BT /F1 12 Tf
        |1 0 0 1 100 700 Tm (AB) Tj
        |1 0 0 1 120 700 Tm (CD) Tj
        |1 0 0 1 133.2 700 Tm (EF) Tj
        |ET""".stripMargin
    // AB ends at 100+2*6=112; CD at 120 → gap 8 > 3 → space.
    // CD ends at 132; EF at 133.2 → gap 1.2 < 3 → no space.
    val r = Extract.extractText(MiniPdf.onePage(content))
    assert(r.pages.head.text == "AB CDEF", s"got: [${r.pages.head.text}]")
  }

  test("TJ kern gap beyond size/4 generates a space") {
    val content =
      """BT /F1 12 Tf 1 0 0 1 100 700 Tm
        |[(AB) -400 (CD) -100 (EF)] TJ
        |ET""".stripMargin
    // -400/1000*12 = 4.8 > 3 → space; -100 → 1.2 < 3 → none
    val r = Extract.extractText(MiniPdf.onePage(content))
    assert(r.pages.head.text == "AB CDEF", s"got: [${r.pages.head.text}]")
  }

  test("space-only show op is dropped (zero-width object skip)") {
    val content =
      """BT /F1 12 Tf
        |1 0 0 1 100 700 Tm (AB) Tj
        |1 0 0 1 150 700 Tm ( ) Tj
        |1 0 0 1 100 650 Tm (CD) Tj
        |ET""".stripMargin
    val r = Extract.extractText(MiniPdf.onePage(content))
    assert(r.pages.head.text == "AB\r\nCD", s"got: [${r.pages.head.text}]")
  }

  test("Tz horizontal scaling stretches advances") {
    val content =
      """BT /F1 12 Tf 200 Tz
        |1 0 0 1 100 700 Tm (AB) Tj
        |1 0 0 1 126 700 Tm (CD) Tj
        |ET""".stripMargin
    // at 200% scale AB ends at 100+2*12=124; CD at 126 → gap 2 < 3 → no space
    val r = Extract.extractText(MiniPdf.onePage(content))
    assert(r.pages.head.text == "ABCD", s"got: [${r.pages.head.text}]")
  }

  test("JPEG→PDF→extract round trip is byte-identical (tests/test_cli.py:108-119)") {
    val jpg = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/tests/resources/mona_lisa.jpg"))
    val pdf = MiniPdf.jpegPdf(jpg, 120, 120)
    val doc = PdfDocument.load(pdf).toOption.get
    val imgs = ImageExtract.pageImages(doc.page(0))
    assert(imgs.length == 1)
    assert(imgs.head.format == "jpg")
    assert(imgs.head.width == 120 && imgs.head.height == 120)
    assert(java.util.Arrays.equals(imgs.head.data, jpg), "extracted JPEG differs from source")
  }

  test("CCITT images extract as decoded 1bpp pixels (images.pdf smart path)") {
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/tests/resources/images.pdf"))
    val doc = PdfDocument.load(bytes).toOption.get
    val imgs = ImageExtract.pageImages(doc.page(0))
    assert(imgs.length == 1) // one shared XObject drawn three times
    assert(imgs.head.format == "pix" && imgs.head.data.length == 48 * 15)
    assert(imgs.head.width == 115 && imgs.head.height == 48)
  }

  test("Type3 font: FontMatrix-scaled advances, Differences-mapped text") {
    // glyph space 1/500 (FontMatrix .002), widths 250 → advance 0.5 em
    val font = "<</Type/Font/Subtype/Type3/FontBBox[0 0 500 500]" +
      "/FontMatrix[0.002 0 0 0.002 0 0]" +
      "/CharProcs<<>>/Encoding<</Type/Encoding/Differences[65 /uni0041 /uni0042]>>" +
      "/FirstChar 65/LastChar 66/Widths[250 250]>>"
    val content =
      """BT /F1 10 Tf
        |1 0 0 1 100 700 Tm (AB) Tj
        |1 0 0 1 113 700 Tm (AB) Tj
        |ET""".stripMargin
    // AB ends at 100 + 2*(250*0.002*10) = 110; next at 113 → gap 3 > 2.5 → space
    val r = Extract.extractText(MiniPdf.onePage(content, font))
    assert(r.ok, r.errMsg)
    assert(r.pages.head.text == "AB AB", s"got: [${r.pages.head.text}]")
  }

  test("string escapes: octal, line continuation, nested parens, hex") {
    val content =
      """BT /F1 12 Tf 1 0 0 1 100 700 Tm
        |(a\101\x) Tj
        |1 0 0 1 200 700 Tm ((n)) Tj
        |1 0 0 1 300 700 Tm <414243> Tj
        |1 0 0 1 400 700 Tm (l1\
        |l2) Tj
        |ET""".stripMargin
    val r = Extract.extractText(MiniPdf.onePage(content))
    // \101='A'; \x → unknown escape keeps 'x'; ((n)) nests; <414243>=ABC;
    // backslash-EOL is a line continuation
    assert(r.pages.head.text == "aAx (n) ABC l1l2", s"got: [${r.pages.head.text}]")
  }

  test("incremental update: newest xref section wins, /Prev chain intact") {
    // append an update that replaces the content stream of page 1 (obj 5)
    val base = MiniPdf.onePage("BT /F1 12 Tf 1 0 0 1 100 700 Tm (Original) Tj ET")
    val baseStr = new String(base, java.nio.charset.StandardCharsets.ISO_8859_1)
    val prevXref = baseStr.lastIndexOf("xref\n")
    val newContent = "BT /F1 12 Tf 1 0 0 1 100 700 Tm (Updated) Tj ET"
    val sb = new StringBuilder(baseStr)
    val objAt = sb.length
    sb.append(s"5 0 obj\n<</Length ${newContent.length}>>\nstream\n$newContent\nendstream\nendobj\n")
    val xrefAt = sb.length
    sb.append("xref\n0 1\n0000000000 65535 f \n5 1\n")
    sb.append(f"$objAt%010d 00000 n \n")
    sb.append(s"trailer\n<</Size 6/Root 1 0 R/Prev $prevXref>>\nstartxref\n$xrefAt\n%%EOF\n")
    val updated = sb.toString.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val r = Extract.extractText(updated)
    assert(r.ok, r.errMsg)
    assert(r.pages.head.text == "Updated", s"got: [${r.pages.head.text}]")
    // the original still reads "Original"
    assert(Extract.extractText(base).pages.head.text == "Original")
  }

  test("Type0/GBK-EUC-H without ToUnicode extracts CJK text (predefined CMap)") {
    // "Hi" (1-byte ASCII codes) + 你好 (GBK 2-byte codes C4E3 BAC3)
    val gbk = Array[Byte](0x48, 0x69, 0xC4.toByte, 0xE3.toByte, 0xBA.toByte, 0xC3.toByte)
    val r = Extract.extractText(SynthPdf.cidPdf("GBK-EUC-H", "GB1", gbk))
    assert(r.ok, r.errMsg)
    assert(r.pages.head.text == "Hi你好", s"got: [${r.pages.head.text}]")
  }

  test("Type0/UniGB-UCS2-H without ToUnicode: charcode IS the UTF-16 unit") {
    val ucs2 = "你好世界AB".flatMap(c =>
      Seq(((c >> 8) & 0xff).toByte, (c & 0xff).toByte)).toArray
    val r = Extract.extractText(SynthPdf.cidPdf("UniGB-UCS2-H", "GB1", ucs2))
    assert(r.ok, r.errMsg)
    assert(r.pages.head.text == "你好世界AB", s"got: [${r.pages.head.text}]")
  }

  test("Type0/90ms-RKSJ-H without ToUnicode: Shift-JIS mixed-width codes") {
    // "A" (1 byte 0x41), こんにちは Shift-JIS: 82B1 82F1 82C9 82BF 82CD
    val sjis = Array(0x41, 0x82, 0xB1, 0x82, 0xF1, 0x82, 0xC9, 0x82, 0xBF, 0x82, 0xCD)
      .map(_.toByte)
    val r = Extract.extractText(SynthPdf.cidPdf("90ms-RKSJ-H", "Japan1", sjis))
    assert(r.ok, r.errMsg)
    assert(r.pages.head.text == "Aこんにちは", s"got: [${r.pages.head.text}]")
  }

  test("embedded CMap stream: codespace split + cidrange mapping") {
    val cmap =
      """/CIDInit /ProcSet findresource begin
        |begincmap
        |/GBK-EUC-H usecmap
        |1 begincodespacerange
        |<00> <80>
        |endcodespacerange
        |2 begincidrange
        |<20> <7e> 1
        |<8140> <fefe> 1000
        |endcidrange
        |1 begincidchar
        |<41> 999
        |endcidchar
        |endcmap""".stripMargin.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val enc = CMapParser.parseCidCMap(cmap)
    // split: 1-byte ASCII + 2-byte GBK (codespace inherited via usecmap)
    val codes = enc.splitCodes(Array[Byte](0x48, 0xC4.toByte, 0xE3.toByte, 0x21))
    assert(codes.toSeq == Seq(0x48, 0xC4E3, 0x21))
    assert(enc.cid(0x20) == 1 && enc.cid(0x7e) == 0x5e + 1)
    assert(enc.cid(0x41) == 999) // cidchar overrides range
    assert(enc.cid(0x8140) == 1000 && enc.cid(0x8141) == 1001)
    // unicode inherited from the GBK base
    assert(enc.unicode(0xC4E3) == "你")
  }

  test("excluded chars: char list keeps them, text view and ranges skip them") {
    // code 0 is unmappable and unrepresentable → stays in the CHAR list as
    // an excluded entry (PDFium unicode-0), absent from the text view
    // (reference textpage.py:88-146 active-range narrowing)
    val content = "BT /F1 12 Tf 1 0 0 1 100 700 Tm (AB\\000CD) Tj ET"
    val pdf = MiniPdf.onePage(content)
    val tp = PdfDocument.load(pdf).toOption.get.page(0).textPage
    assert(tp.countChars == 5, s"chars=${tp.countChars}") // A B <excl> C D
    assert(tp.text == "ABCD")
    assert(tp.textIndexFromCharIndex.toSeq == Seq(0, 1, -1, 2, 3))
    assert(tp.charIndexFromTextIndex(2) == 3)
    assert(tp.textRange(0, -1).toOption.get == "ABCD")
    assert(tp.textRange(2, 1).toOption.get == "") // range covers only the excluded char
    assert(tp.textRange(1, 3).toOption.get == "BC") // narrowed to the active core
    assert(tp.textRange(2, 3).toOption.get == "CD")
  }

  test("incremental update freeing an object tombstones it (no resurrection)") {
    // newer section marks obj 5 (the content stream) free: the older
    // section's in-use offset must NOT resolve it anymore (§7.5.4)
    val base = MiniPdf.onePage("BT /F1 12 Tf 1 0 0 1 100 700 Tm (Original) Tj ET")
    val baseStr = new String(base, java.nio.charset.StandardCharsets.ISO_8859_1)
    val prevXref = baseStr.lastIndexOf("startxref")
    val prevOff = baseStr.substring(prevXref + 9).trim.takeWhile(_.isDigit)
    val sb = new StringBuilder(baseStr)
    val xrefAt = sb.length
    sb.append("xref\n0 1\n0000000000 65535 f \n5 1\n0000000000 65536 f \n")
    sb.append(s"trailer\n<</Size 6/Root 1 0 R/Prev $prevOff>>\nstartxref\n$xrefAt\n%%EOF\n")
    val freed = sb.toString.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val r = Extract.extractText(freed)
    assert(r.ok, r.errMsg)
    assert(r.pages.head.text == "", s"freed object resurrected: [${r.pages.head.text}]")
  }

  test("' and \" operators advance the line and show text") {
    val content =
      """BT /F1 12 Tf 14 TL 1 0 0 1 100 700 Tm
        |(One) Tj
        |(Two) '
        |ET""".stripMargin
    val r = Extract.extractText(MiniPdf.onePage(content))
    assert(r.pages.head.text == "One\r\nTwo", s"got: [${r.pages.head.text}]")
  }
}
