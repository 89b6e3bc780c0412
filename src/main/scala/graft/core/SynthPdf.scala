package graft.core

/** Deterministic minimal-PDF builder (classic xref, uncompressed). Used by
  * specs and by oracle queries that need fixtures the reference corpus
  * lacks (e.g. CID-keyed fonts with predefined CMaps — the reference's CJK
  * behavior is exercised through PDFium's shipped Adobe CMaps, so the
  * corpus has no such file; we synthesize one instead). */
object SynthPdf {

  /** Build a classic-xref PDF from object bodies (1-indexed refs). Bodies
    * may be raw byte arrays (binary streams). */
  def build(objs: Vector[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def wr(s: String): Unit = out.write(s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    wr("%PDF-1.4\n")
    val offsets = Vector.newBuilder[Int]
    objs.zipWithIndex.foreach { case (body, i) =>
      offsets += out.size()
      wr(s"${i + 1} 0 obj\n")
      out.write(body)
      wr("\nendobj\n")
    }
    val xrefAt = out.size()
    wr(s"xref\n0 ${objs.length + 1}\n")
    wr("0000000000 65535 f \n")
    offsets.result().foreach(o => wr(f"$o%010d 00000 n \n"))
    wr(s"trailer\n<</Size ${objs.length + 1}/Root 1 0 R>>\nstartxref\n$xrefAt\n%%EOF\n")
    out.toByteArray
  }

  /** Build a 1-page classic-xref PDF around the given content stream. The
    * content string is latin-1-encoded (binary-safe for show-string bytes). */
  def onePage(content: String, fontDict: String =
      "<</Type/Font/Subtype/Type1/BaseFont/Helvetica>>"): Array[Byte] = {
    val cBytes = content.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    build(Vector(
      "<</Type/Catalog/Pages 2 0 R>>".getBytes,
      "<</Type/Pages/Kids[3 0 R]/Count 1>>".getBytes,
      "<</Type/Page/Parent 2 0 R/MediaBox[0 0 612 792]/Resources<</Font<</F1 4 0 R>>>>/Contents 5 0 R>>".getBytes,
      fontDict.getBytes,
      (s"<</Length ${cBytes.length}>>\nstream\n".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
        ++ cBytes ++ "\nendstream".getBytes): Array[Byte]))
  }

  /** Two-paragraph single-column page for block segmentation: 3 + 2 lines
    * at 14 pt leading with a 54 pt paragraph gap. Every line carries an
    * ascender glyph so line-rect tops march at exactly the leading. */
  def paragraphsPdf: Array[Byte] = onePage(
    """BT /F1 12 Tf
      |50 700 Td (data tables merge under the fast scan) Tj
      |0 -14 Td (the hash join groups every key) Tj
      |0 -14 Td (batch rows spill to sorted runs) Tj
      |0 -54 Td (a second paragraph starts here) Tj
      |0 -14 Td (its lines pack into one block) Tj
      |ET""".stripMargin)

  /** Two-column page: three left-column lines at x=50, two right-column
    * lines at x=320, interleaved in y — a top-sorted reading order would
    * shuffle the columns together. */
  def twoColumnPdf: Array[Byte] = onePage(
    """BT /F1 12 Tf
      |50 700 Td (left column first line) Tj
      |0 -14 Td (left column second line) Tj
      |0 -14 Td (left column third line) Tj
      |270 28 Td (right column first line) Tj
      |0 -14 Td (right column second line) Tj
      |ET""".stripMargin)

  /** Page with a URI link annotation whose visible anchor text ("click
    * here for details") differs from the target URL — proves anchor
    * extraction reads the text under the rect, not the URI. */
  def linkPdf: Array[Byte] = {
    val content = "BT /F1 12 Tf 50 700 Td (click here for details) Tj " +
      "0 -20 Td (unlinked body line) Tj ET"
    build(Vector(
      "<</Type/Catalog/Pages 2 0 R>>".getBytes,
      "<</Type/Pages/Kids[3 0 R]/Count 1>>".getBytes,
      ("<</Type/Page/Parent 2 0 R/MediaBox[0 0 612 792]" +
        "/Resources<</Font<</F1 4 0 R>>>>/Contents 5 0 R" +
        "/Annots[6 0 R]>>").getBytes,
      "<</Type/Font/Subtype/Type1/BaseFont/Helvetica>>".getBytes,
      (s"<</Length ${content.length}>>\nstream\n$content\nendstream").getBytes,
      ("<</Type/Annot/Subtype/Link/Rect[50 695 165 712]" +
        "/A<</S/URI/URI(https://t.example/x)>>>>").getBytes))
  }

  /** One horizontal line and one 90°-rotated (Tm 0 1 -1 0) line — the
    * rotated-text extraction fixture: rotated glyphs must extract in
    * stream order with transformed (tall) line geometry. */
  def rotatedTextPdf: Array[Byte] = onePage(
    """BT /F1 12 Tf 0 1 -1 0 300 100 Tm (rotated upward text) Tj ET
      |BT /F1 12 Tf 50 700 Td (horizontal baseline text) Tj ET""".stripMargin)

  /** Article page: 18 pt title, 14 pt section head, 10 pt body paragraph,
    * and a ruled 2×2 table below — the pdf-to-markdown fixture. */
  def articlePdf: Array[Byte] = onePage(
    """BT /F1 18 Tf 50 740 Td (spark graft report) Tj ET
      |BT /F1 14 Tf 50 710 Td (results) Tj ET
      |BT /F1 10 Tf 50 690 Td (the scan results hold steady) Tj
      |0 -14 Td (joins stay fast at scale) Tj ET
      |50 600 m 350 600 l S
      |50 580 m 350 580 l S
      |50 560 m 350 560 l S
      |50 560 m 50 600 l S
      |200 560 m 200 600 l S
      |350 560 m 350 600 l S
      |BT /F1 10 Tf 60 585 Td (name) Tj 150 0 Td (count) Tj
      |-150 -20 Td (alpha) Tj 150 0 Td (12) Tj ET""".stripMargin)

  /** Heading-structured page: one 18 pt title, two 14 pt section heads,
    * three 10 pt body lines (the char-weighted modal size). */
  def headingsPdf: Array[Byte] = onePage(
    """BT /F1 18 Tf 50 730 Td (document title) Tj ET
      |BT /F1 14 Tf 50 700 Td (first section) Tj ET
      |BT /F1 10 Tf 50 686 Td (body line one about scans) Tj ET
      |BT /F1 10 Tf 50 672 Td (body line two about joins) Tj ET
      |BT /F1 14 Tf 50 640 Td (second section) Tj ET
      |BT /F1 10 Tf 50 626 Td (more body text here) Tj ET""".stripMargin)

  /** 3×2 ruled table: 4 horizontal + 3 vertical stroked rulings forming
    * a lattice grid, one labeled text cell per grid cell. */
  def tablePdf: Array[Byte] = onePage(
    """0.7 w
      |50 700 m 350 700 l S
      |50 670 m 350 670 l S
      |50 640 m 350 640 l S
      |50 610 m 350 610 l S
      |50 610 m 50 700 l S
      |200 610 m 200 700 l S
      |350 610 m 350 700 l S
      |BT /F1 10 Tf
      |60 680 Td (name) Tj 150 0 Td (count) Tj
      |-150 -30 Td (alpha) Tj 150 0 Td (12) Tj
      |-150 -30 Td (beta) Tj 150 0 Td (7) Tj
      |ET""".stripMargin)

  /** N-page classic-xref PDF (one text line per page) — the size-skew
    * "monster document" generator for the skew-stress bench (a 5000-page
    * doc among 1-pagers). Object layout: 1 catalog, 2 pages node,
    * 3+2i page i, 4+2i its content, last = shared font. */
  def multiPage(nPages: Int): Array[Byte] = {
    val fontRef = 3 + 2 * nPages
    val objs = Vector.newBuilder[Array[Byte]]
    objs += "<</Type/Catalog/Pages 2 0 R>>".getBytes
    val kids = (0 until nPages).map(i => s"${3 + 2 * i} 0 R").mkString(" ")
    objs += s"<</Type/Pages/Kids[$kids]/Count $nPages>>".getBytes
    var i = 0
    while (i < nPages) {
      objs += (s"<</Type/Page/Parent 2 0 R/MediaBox[0 0 612 792]" +
        s"/Resources<</Font<</F1 $fontRef 0 R>>>>/Contents ${4 + 2 * i} 0 R>>").getBytes
      val content = s"BT /F1 12 Tf 72 720 Td (Page ${i + 1} of $nPages) Tj ET"
      objs += (s"<</Length ${content.length}>>\nstream\n$content\nendstream").getBytes
      i += 1
    }
    objs += "<</Type/Font/Subtype/Type1/BaseFont/Helvetica>>".getBytes
    build(objs.result())
  }

  /** Internal-navigation fixture: two pages, page 0 carries a GoTo link
    * annot targeting page 1 plus an external URI link. */
  def gotoLinkPdf: Array[Byte] = {
    val c0 = "BT /F1 12 Tf 50 700 Td (see chapter two) Tj 0 -20 Td (visit site) Tj ET"
    val c1 = "BT /F1 12 Tf 50 700 Td (chapter two content) Tj ET"
    build(Vector(
      "<</Type/Catalog/Pages 2 0 R>>".getBytes,
      "<</Type/Pages/Kids[3 0 R 4 0 R]/Count 2>>".getBytes,
      ("<</Type/Page/Parent 2 0 R/MediaBox[0 0 612 792]" +
        "/Resources<</Font<</F1 7 0 R>>>>/Contents 5 0 R/Annots[8 0 R 9 0 R]>>").getBytes,
      ("<</Type/Page/Parent 2 0 R/MediaBox[0 0 612 792]" +
        "/Resources<</Font<</F1 7 0 R>>>>/Contents 6 0 R>>").getBytes,
      (s"<</Length ${c0.length}>>\nstream\n$c0\nendstream").getBytes,
      (s"<</Length ${c1.length}>>\nstream\n$c1\nendstream").getBytes,
      "<</Type/Font/Subtype/Type1/BaseFont/Helvetica>>".getBytes,
      ("<</Type/Annot/Subtype/Link/Rect[50 695 150 712]" +
        "/A<</S/GoTo/D[4 0 R /XYZ 0 792 0]>>>>").getBytes,
      ("<</Type/Annot/Subtype/Link/Rect[50 675 120 692]" +
        "/A<</S/URI/URI(https://ext.example/)>>>>").getBytes))
  }

  /** Stream-table fixture: a 4-row × 3-column whitespace-aligned table —
    * NO rulings anywhere, columns exist only as shared word-left
    * positions (50 / 150 / 230). */
  def streamTablePdf: Array[Byte] = onePage(
    """BT /F1 10 Tf
      |50 700 Td (item) Tj 100 0 Td (qty) Tj 80 0 Td (price) Tj
      |-180 -15 Td (apples) Tj 100 0 Td (12) Tj 80 0 Td (3.40) Tj
      |-180 -15 Td (pears) Tj 100 0 Td (7) Tj 80 0 Td (2.10) Tj
      |-180 -15 Td (plums) Tj 100 0 Td (19) Tj 80 0 Td (5.05) Tj
      |ET""".stripMargin)

  /** Watermark fixture: nPages pages, each with a unique body line plus
    * the same 45°-rotated large-font DRAFT stamp (Tm 0.707 cos/sin) — the
    * repeated-rotated-text shape watermark detection keys on. */
  def watermarkPdf(nPages: Int = 3): Array[Byte] = {
    val fontRef = 3 + 2 * nPages
    val objs = Vector.newBuilder[Array[Byte]]
    objs += "<</Type/Catalog/Pages 2 0 R>>".getBytes
    val kids = (0 until nPages).map(i => s"${3 + 2 * i} 0 R").mkString(" ")
    objs += s"<</Type/Pages/Kids[$kids]/Count $nPages>>".getBytes
    var i = 0
    while (i < nPages) {
      objs += (s"<</Type/Page/Parent 2 0 R/MediaBox[0 0 612 792]" +
        s"/Resources<</Font<</F1 $fontRef 0 R>>>>/Contents ${4 + 2 * i} 0 R>>").getBytes
      val content =
        s"BT /F1 12 Tf 72 700 Td (body text of page ${i + 1}) Tj ET " +
        "BT /F1 48 Tf 0.707 0.707 -0.707 0.707 150 200 Tm (DRAFT COPY) Tj ET"
      objs += (s"<</Length ${content.length}>>\nstream\n$content\nendstream").getBytes
      i += 1
    }
    objs += "<</Type/Font/Subtype/Type1/BaseFont/Helvetica>>".getBytes
    build(objs.result())
  }

  /** One-page PDF with a FreeText annotation carrying a normal appearance
    * stream (Form XObject with its own text) — the flatten fixture: the AP
    * text is invisible to content-stream extraction until
    * [[PdfWriter.writeFlattened]] bakes it into the page. */
  def annotPdf(bodyText: String = "body text", apText: String = "FLATTENED"): Array[Byte] = {
    val content = s"BT /F1 12 Tf 72 720 Td ($bodyText) Tj ET"
    val ap = s"BT /F1 24 Tf 4 10 Td ($apText) Tj ET"
    build(Vector(
      "<</Type/Catalog/Pages 2 0 R>>".getBytes,
      "<</Type/Pages/Kids[3 0 R]/Count 1>>".getBytes,
      ("<</Type/Page/Parent 2 0 R/MediaBox[0 0 612 792]" +
        "/Resources<</Font<</F1 4 0 R>>>>/Contents 5 0 R/Annots[6 0 R]>>").getBytes,
      "<</Type/Font/Subtype/Type1/BaseFont/Helvetica>>".getBytes,
      (s"<</Length ${content.length}>>\nstream\n$content\nendstream").getBytes,
      "<</Type/Annot/Subtype/FreeText/Rect[100 600 300 640]/F 4/AP<</N 7 0 R>>>>".getBytes,
      (s"<</Type/XObject/Subtype/Form/BBox[0 0 200 40]" +
        s"/Resources<</Font<</F1 4 0 R>>>>/Length ${ap.length}>>\nstream\n$ap\nendstream").getBytes))
  }

  /** Deterministic text-like 1=black byte bitmap (sparse strokes) — the
    * JBIG2 fixture pattern; exposed so oracles can recompute the expected
    * decoded bytes independently of the codec. */
  /** Redaction fixture: three SEPARATE single-show text objects (isolable
    * spans) — the middle one carries the planted secret. */
  def redactPdf: Array[Byte] = onePage(
    "BT /F1 12 Tf 50 700 Td (public line one) Tj ET " +
    "BT /F1 12 Tf 50 680 Td (SECRET ssn 123-45-6789) Tj ET " +
    "BT /F1 12 Tf 50 660 Td (public line two) Tj ET")

  /** Active-content fixture for the action audit: catalog OpenAction runs
    * JavaScript chained (/Next) to a Named action; the Names/JavaScript
    * tree carries one document-level script; the page's /AA /O launches an
    * external program; a link annot carries a URI action. */
  def actionsPdf: Array[Byte] = {
    val content = "BT /F1 12 Tf 50 700 Td (active content page) Tj ET"
    build(Vector(
      ("<</Type/Catalog/Pages 2 0 R/OpenAction 7 0 R" +
        "/Names<</JavaScript<</Names[(init) 9 0 R]>>>>>>").getBytes,
      "<</Type/Pages/Kids[3 0 R]/Count 1>>".getBytes,
      ("<</Type/Page/Parent 2 0 R/MediaBox[0 0 612 792]" +
        "/Resources<</Font<</F1 4 0 R>>>>/Contents 5 0 R" +
        "/Annots[6 0 R]/AA<</O 10 0 R>>>>").getBytes,
      "<</Type/Font/Subtype/Type1/BaseFont/Helvetica>>".getBytes,
      (s"<</Length ${content.length}>>\nstream\n$content\nendstream").getBytes,
      ("<</Type/Annot/Subtype/Link/Rect[50 695 165 712]" +
        "/A<</S/URI/URI(https://evil.example/track)>>>>").getBytes,
      "<</S/JavaScript/JS(app.alert\\(1\\);)/Next 8 0 R>>".getBytes,
      "<</S/Named/N/NextPage>>".getBytes,
      "<</S/JavaScript/JS(console.log\\(2\\);)>>".getBytes,
      "<</S/Launch/F(cmd.exe)>>".getBytes))
  }

  def strokeBitmap(w: Int, h: Int): Array[Byte] = {
    val bm = new Array[Byte](w * h)
    var y = 8
    while (y < h - 8) { var x = 4; while (x < w - 4) { bm(y * w + x) = 1; x += 1 }; y += 12 }
    var x = 10
    while (x < w - 10) { var yy = 4; while (yy < h - 4) { bm(yy * w + x) = 1; yy += 1 }; x += 16 }
    bm
  }

  /** One-page PDF whose sole image is JBIG2-coded (generic region, MQ). */
  def jbig2Pdf(w: Int = 64, h: Int = 48): Array[Byte] = {
    val emb = Jbig2.encodeEmbedded(strokeBitmap(w, h), w, h)
    imageOnlyPdf(w, h,
      s"<</Type/XObject/Subtype/Image/Width $w/Height $h/BitsPerComponent 1" +
        s"/ColorSpace/DeviceGray/Filter/JBIG2Decode/Length ${emb.length}>>\nstream\n", emb)
  }

  /** Symbol-coded JBIG2 fixture (symbol dictionary + text region — the
    * shape jbig2enc/scanners emit): two deterministic glyph bitmaps placed
    * three times. Exposed pieces let oracles recompute the expected page. */
  def jbig2TextSymbols: Vector[Jbig2.Sym] = {
    val w = 12; val h = 10
    val box = new Array[Byte](w * h)
    var x = 0
    while (x < w) { box(x) = 1; box((h - 1) * w + x) = 1; x += 1 }
    var y = 0
    while (y < h) { box(y * w) = 1; box(y * w + w - 1) = 1; y += 1 }
    val cross = new Array[Byte](w * h)
    x = 0; while (x < w) { cross((h / 2) * w + x) = 1; x += 1 }
    y = 0; while (y < h) { cross(y * w + w / 2) = 1; y += 1 }
    Vector((w, h, box), (w, h, cross))
  }
  val jbig2TextPlacements: Seq[(Int, Int, Int)] = Seq((0, 4, 3), (1, 30, 3), (0, 10, 25))

  /** One-page PDF whose sole image is a symbol-coded JBIG2 stream. */
  def jbig2TextPdf(w: Int = 64, h: Int = 48): Array[Byte] = {
    val emb = Jbig2.encodeEmbeddedText(jbig2TextSymbols, jbig2TextPlacements, w, h)
    imageOnlyPdf(w, h,
      s"<</Type/XObject/Subtype/Image/Width $w/Height $h/BitsPerComponent 1" +
        s"/ColorSpace/DeviceGray/Filter/JBIG2Decode/Length ${emb.length}>>\nstream\n", emb)
  }

  /** One-page PDF whose sole image is a HUFFMAN-coded JBIG2 stream (T.88
    * Annex B tables, MMR collective bitmap) — same symbols/placements as
    * [[jbig2TextPdf]], so the decoded page and its packed-bitmap md5 must
    * be identical across the arithmetic and Huffman codings. */
  def jbig2HuffmanPdf(w: Int = 64, h: Int = 48): Array[Byte] = {
    val emb = Jbig2.encodeEmbeddedTextHuffman(jbig2TextSymbols, jbig2TextPlacements, w, h,
      mmrCollective = true)
    imageOnlyPdf(w, h,
      s"<</Type/XObject/Subtype/Image/Width $w/Height $h/BitsPerComponent 1" +
        s"/ColorSpace/DeviceGray/Filter/JBIG2Decode/Length ${emb.length}>>\nstream\n", emb)
  }

  /** One-page PDF whose sole image is a HALFTONE JBIG2 stream (pattern
    * dictionary + gray-coded halftone region): 4 density patterns over an
    * 8×6 gradient grid — the §6.6/§6.7 shape scanned-newspaper PDFs use. */
  def jbig2HalftonePdf(w: Int = 48, h: Int = 36): Array[Byte] = {
    val patterns = Vector.tabulate(4) { level =>
      val pw = 6; val ph = 6
      val bm = new Array[Byte](pw * ph)
      var k = 0
      while (k < bm.length) {
        bm(k) = (if (level == 3) 1 else if (level > 0 && k % 4 < level) 1 else 0).toByte
        k += 1
      }
      (pw, ph, bm)
    }
    val hgw = 8; val hgh = 6
    val grays = Array.tabulate(hgw * hgh)(k => (k % hgw) * 4 / hgw)
    val emb = Jbig2.encodeEmbeddedHalftone(patterns, grays, hgw, hgh, w, h)
    imageOnlyPdf(w, h,
      s"<</Type/XObject/Subtype/Image/Width $w/Height $h/BitsPerComponent 1" +
        s"/ColorSpace/DeviceGray/Filter/JBIG2Decode/Length ${emb.length}>>\nstream\n", emb)
  }

  /** Deterministic RGB test pattern (gradients + checker) for the JPX
    * decode fixture; the oracle pins the md5 of THIS pattern's ARGB bytes,
    * so the check is codec-independent (lossless decode must restore it
    * exactly). */
  def jpxPattern(w: Int, h: Int): Array[Array[Int]] = Array(
    Array.tabulate(w * h)(i => (i % w) * 255 / math.max(1, w - 1)),
    Array.tabulate(w * h)(i => (i / w) * 255 / math.max(1, h - 1)),
    Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      if (((x / 8) + (y / 8)) % 2 == 0) 230 else 25
    })

  /** One-page PDF whose sole image is a REAL lossless JPEG 2000 codestream
    * (RCT, 2 decomposition levels) — decoded to pixels by core/JpxCodec,
    * unlike the header-only [[jpxPdf]] passthrough fixture. */
  def jpxDecodePdf(w: Int = 48, h: Int = 32): Array[Byte] = {
    val cs = JpxCodec.encodeLossless(jpxPattern(w, h), w, h, bpc = 8, levels = 2, useRct = true)
    imageOnlyPdf(w, h,
      s"<</Type/XObject/Subtype/Image/Width $w/Height $h/BitsPerComponent 8" +
        s"/ColorSpace/DeviceRGB/Filter/JPXDecode/Length ${cs.length}>>\nstream\n", cs)
  }

  /** One-page PDF whose sole image is a JPX payload (header-only fixture —
    * codestream carries SOC+SIZ, enough for dimension parsing). */
  def jpxPdf(w: Int = 640, h: Int = 480): Array[Byte] = {
    val jp2 = Jpx.synthHeaderOnly(w, h)
    imageOnlyPdf(w, h,
      s"<</Type/XObject/Subtype/Image/Width $w/Height $h/BitsPerComponent 8" +
        s"/ColorSpace/DeviceRGB/Filter/JPXDecode/Length ${jp2.length}>>\nstream\n", jp2)
  }

  private def imageOnlyPdf(w: Int, h: Int, imgHdr: String, payload: Array[Byte]): Array[Byte] = {
    val img = imgHdr.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1) ++
      payload ++ "\nendstream".getBytes
    val content = s"q $w 0 0 $h 0 0 cm /Im1 Do Q"
    build(Vector(
      "<</Type/Catalog/Pages 2 0 R>>".getBytes,
      "<</Type/Pages/Kids[3 0 R]/Count 1>>".getBytes,
      (s"<</Type/Page/Parent 2 0 R/MediaBox[0 0 $w $h]" +
        "/Resources<</XObject<</Im1 4 0 R>>>>/Contents 5 0 R>>").getBytes,
      img,
      s"<</Length ${content.length}>>\nstream\n$content\nendstream".getBytes))
  }

  /** Type0 font dict with a predefined encoding CMap and no ToUnicode. */
  def type0FontDict(baseFont: String, encoding: String, registry: String,
                    ordering: String, dw: Int = 1000): String =
    s"<</Type/Font/Subtype/Type0/BaseFont/$baseFont/Encoding/$encoding" +
      s"/DescendantFonts[<</Type/Font/Subtype/CIDFontType0/BaseFont/$baseFont" +
      s"/CIDSystemInfo<</Registry($registry)/Ordering($ordering)/Supplement 2>>/DW $dw>>]>>"

  /** One-page CID PDF showing `textBytes` (already in the CMap's encoding)
    * through a Type0 font with the given predefined CMap. */
  def cidPdf(encoding: String, ordering: String, textBytes: Array[Byte],
             baseFont: String = "STSong-Light"): Array[Byte] = {
    val hex = textBytes.map(b => f"${b & 0xff}%02X").mkString
    val content = s"BT /F1 12 Tf 1 0 0 1 100 700 Tm <$hex> Tj ET"
    onePage(content, type0FontDict(baseFont, encoding, "Adobe", ordering))
  }
}
