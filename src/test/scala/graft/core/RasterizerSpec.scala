package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.core.render.Rasterizer

/** Minimal-rasterizer probes: synthetic pages with geometry pinned by
  * construction (probe pixels), plus fixture smoke renders. */
class RasterizerSpec extends AnyFunSuite {

  private def renderOf(content: String) = {
    val doc = PdfDocument.load(SynthPdf.onePage(content)).toOption.get
    Rasterizer.render(doc.page(0)) // scale 1 → 612×792, y-down
  }

  test("rect fill: red re lands at the transformed device pixels") {
    val bmp = renderOf("1 0 0 rg 100 600 50 30 re f")
    assert(bmp.width == 612 && bmp.height == 792)
    assert(bmp.get(125, 175) == 0xFFFF0000, f"inside=${bmp.get(125, 175)}%08x") // (125, 792-617)
    assert(bmp.get(90, 175) == 0xFFFFFFFF)  // left of rect
    assert(bmp.get(125, 140) == 0xFFFFFFFF) // above rect (device y < 162)
  }

  test("grayscale mode: colors collapse to PDFium-weighted luminance") {
    val doc = PdfDocument.load(SynthPdf.onePage(
      "1 0 0 rg 100 600 50 30 re f 0 0 1 rg 300 600 50 30 re f")).toOption.get
    val bmp = Rasterizer.render(doc.page(0), grayscale = true)
    // red: 255*30/100 = 76; blue: 255*11/100 = 28; background stays white
    assert(bmp.get(125, 175) == 0xFF4C4C4C, f"red=${bmp.get(125, 175)}%08x")
    assert(bmp.get(325, 175) == 0xFF1C1C1C, f"blue=${bmp.get(325, 175)}%08x")
    assert(bmp.get(90, 175) == 0xFFFFFFFF)
  }

  test("color scheme forces path fill/stroke and text fill colors") {
    val scheme = Rasterizer.ColorScheme(
      pathFill = 0xFF112233, pathStroke = 0xFF445566, textFill = 0xFF778899, textStroke = 0xFF778899)
    val doc = PdfDocument.load(SynthPdf.onePage(
      "1 0 0 rg 100 600 50 30 re f 0 1 0 RG 4 w 300 500 m 400 500 l S " +
        "BT /F1 24 Tf 100 300 Td (Mx) Tj ET")).toOption.get
    val bmp = Rasterizer.render(doc.page(0), colorScheme = Some(scheme))
    assert(bmp.get(125, 175) == 0xFF112233, f"fill=${bmp.get(125, 175)}%08x") // content said red
    assert(bmp.get(350, 292) == 0xFF445566, f"stroke=${bmp.get(350, 292)}%08x") // content said green
    // text line: forced glyph color present, original black absent
    val textRow = (0 until bmp.width).map(x => bmp.get(x, 792 - 308))
    assert(textRow.contains(0xFF778899), "forced text color not painted")
    assert(!textRow.contains(0xFF000000), "content text color leaked through scheme")
  }

  test("fill_to_stroke renders filled paths as outlines") {
    val doc = PdfDocument.load(SynthPdf.onePage(
      "1 0 0 rg 100 500 200 100 re f")).toOption.get
    val bmp = Rasterizer.render(doc.page(0), fillToStroke = true)
    // interior stays background …
    assert(bmp.get(200, 792 - 550) == 0xFFFFFFFF, f"interior=${bmp.get(200, 792 - 550)}%08x")
    // … while the boundary carries ink (scan the left edge column ±1px)
    val edgeInk = (791 - 600 to 791 - 500).exists { y =>
      (99 to 101).exists(x => bmp.get(x, y) != 0xFFFFFFFF)
    }
    assert(edgeInk, "no outline ink on the rect edge")
  }

  test("even-odd ring: inner square stays white; nonzero fills it") {
    val ring = "0 0 1 rg 100 600 100 100 re 130 630 40 40 re "
    val eo = renderOf(ring + "f*")
    assert(eo.get(110, 142) == 0xFF0000FF) // in outer ring
    assert(eo.get(150, 142) == 0xFFFFFFFF) // inside inner square → hole
    val nz = renderOf(ring + "f")
    assert(nz.get(150, 142) == 0xFF0000FF) // nonzero: same winding → filled
  }

  test("triangle fill via m/l and cmyk color") {
    // magenta-ish triangle (0,1,0,0 cmyk = magenta)
    val bmp = renderOf("0 1 0 0 k 300 100 m 400 100 l 350 200 l h f")
    assert(bmp.get(350, 792 - 120) == 0xFFFF00FF)
    assert(bmp.get(301, 792 - 190) == 0xFFFFFFFF) // outside the apex
  }

  test("stroke: green diagonal leaves ink along the segment") {
    val bmp = renderOf("0 1 0 RG 4 w 100 100 m 200 200 l S")
    assert(bmp.get(150, 792 - 150) == 0xFF00FF00)
    assert(bmp.get(160, 792 - 140) == 0xFFFFFFFF) // off the line
  }

  test("cm transform: unit-square image scaled/translated; jpeg blit") {
    val jpg = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/tests/resources/mona_lisa.jpg"))
    val doc = PdfDocument.load(MiniPdf.jpegPdf(jpg, 120, 120)).toOption.get
    val bmp = Rasterizer.render(doc.page(0))
    assert(bmp.width == 120 && bmp.height == 120)
    // the painting is not blank and not solid; center pixel is some color
    val ink = bmp.inkFraction
    assert(ink > 0.5, s"ink=$ink")
    assert(bmp.get(60, 60) != 0xFFFFFFFF)
  }

  test("text overlay: glyph boxes darken the text line") {
    val bmp = renderOf("BT /F1 24 Tf 1 0 0 1 100 700 Tm (Hello) Tj ET")
    // some non-white pixels near the baseline band of 'Hello'
    var ink = 0
    var y = 792 - 700 - 24
    while (y < 792 - 700 + 4) {
      var x = 100
      while (x < 180) { if (bmp.get(x, y) != 0xFFFFFFFF) ink += 1; x += 1 }
      y += 1
    }
    assert(ink > 50, s"text ink=$ink")
  }

  test("re W n clip: a full-page fill only lands inside the clip rect") {
    val bmp = renderOf("100 600 50 30 re W n 1 0 0 rg 0 0 612 792 re f")
    assert(bmp.get(125, 175) == 0xFFFF0000) // inside clip
    assert(bmp.get(90, 175) == 0xFFFFFFFF)  // outside clip (left)
    assert(bmp.get(300, 400) == 0xFFFFFFFF) // far outside
  }

  test("q/Q restores the clip; nested clips intersect") {
    val content =
      "q 100 600 100 100 re W n 0 1 0 rg 0 0 612 792 re f " + // green in outer clip
      "q 100 600 50 50 re W n 0 0 1 rg 0 0 612 792 re f Q Q " + // blue in inner∩outer
      "1 0 0 rg 10 10 20 20 re f"                              // after Q Q: unclipped
    val bmp = renderOf(content)
    assert(bmp.get(120, 140) == 0xFF00FF00) // outer only (pdf y 652 > inner top)
    assert(bmp.get(160, 175) == 0xFF00FF00) // outer only (pdf x 160 > inner right)
    assert(bmp.get(120, 175) == 0xFF0000FF) // inner∩outer (pdf 120,617)
    assert(bmp.get(20, 792 - 20) == 0xFFFF0000) // unclipped after Q Q
    assert(bmp.get(300, 400) == 0xFFFFFFFF)
  }

  test("text renders in the show-time fill color") {
    val bmp = renderOf("BT 1 0 0 rg /F1 24 Tf 1 0 0 1 100 700 Tm (Hello) Tj ET")
    var red = 0
    var y = 792 - 700 - 24
    while (y < 792 - 700 + 4) {
      var x = 100
      while (x < 180) { if (bmp.get(x, y) == 0xFFFF0000) red += 1; x += 1 }
      y += 1
    }
    assert(red > 50, s"red text pixels=$red")
  }

  test("inline image (BI/ID/EI): raw gray samples blit through the CTM") {
    // 2×2 gray image: TL black, TR white / BL white, BR black, scaled to
    // 100×100 at pdf (50,600) → device y 92..192
    val content = "q 100 0 0 100 50 600 cm BI /W 2 /H 2 /BPC 8 /CS /G ID " +
      "\u0000\u00ff\u00ff\u0000 EI Q"
    val bmp = renderOf(content)
    assert(bmp.get(75, 120) == 0xFF000000, f"tl=${bmp.get(75, 120)}%08x")  // top-left black
    assert(bmp.get(125, 120) == 0xFFFFFFFF) // top-right white
    assert(bmp.get(75, 170) == 0xFFFFFFFF)  // bottom-left white
    assert(bmp.get(125, 170) == 0xFF000000) // bottom-right black
  }

  test("Type3 glyphs: charproc content renders through the glyph matrix") {
    // glyph space 1/500 (FontMatrix .002): a full-em filled square charproc
    // shown at 100pt → a 100×100 block at the pen position
    val proc = "0 0 500 500 re f"
    val pdf = SynthPdf.build(Vector(
      "<</Type/Catalog/Pages 2 0 R>>".getBytes,
      "<</Type/Pages/Kids[3 0 R]/Count 1>>".getBytes,
      "<</Type/Page/Parent 2 0 R/MediaBox[0 0 612 792]/Resources<</Font<</F1 4 0 R>>>>/Contents 5 0 R>>".getBytes,
      ("<</Type/Font/Subtype/Type3/FontBBox[0 0 500 500]/FontMatrix[0.002 0 0 0.002 0 0]" +
        "/CharProcs<</boxglyph 6 0 R>>/Encoding<</Type/Encoding/Differences[65 /boxglyph]>>" +
        "/FirstChar 65/LastChar 65/Widths[500]>>").getBytes,
      {
        val content = "BT /F1 100 Tf 1 0 0 1 100 400 Tm (A) Tj ET"
        s"<</Length ${content.length}>>\nstream\n$content\nendstream".getBytes
      },
      s"<</Length ${proc.length}>>\nstream\n$proc\nendstream".getBytes))
    val doc = PdfDocument.load(pdf).toOption.get
    val bmp = Rasterizer.render(doc.page(0))
    // glyph square: pdf (100,400)-(200,500) → device y 292..392
    assert(bmp.get(150, 342) == 0xFF000000, f"center=${bmp.get(150, 342)}%08x")
    assert(bmp.get(150, 250) == 0xFFFFFFFF) // above the glyph
    assert(bmp.get(250, 342) == 0xFFFFFFFF) // right of the glyph
  }

  test("axial shading: red→blue gradient across the clip rect") {
    val fontDictSlot = "<</Type/Font/Subtype/Type1/BaseFont/Helvetica>>" // unused F1
    val pdf = SynthPdf.build(Vector(
      "<</Type/Catalog/Pages 2 0 R>>".getBytes,
      "<</Type/Pages/Kids[3 0 R]/Count 1>>".getBytes,
      ("<</Type/Page/Parent 2 0 R/MediaBox[0 0 612 792]/Resources<</Font<</F1 4 0 R>>" +
        "/Shading<</Sh0<</ShadingType 2/ColorSpace/DeviceRGB/Coords[100 0 300 0]" +
        "/Function<</FunctionType 2/Domain[0 1]/C0[1 0 0]/C1[0 0 1]/N 1>>" +
        "/Extend[true true]>>>>>>/Contents 5 0 R>>").getBytes,
      fontDictSlot.getBytes,
      {
        val content = "q 100 600 200 100 re W n /Sh0 sh Q"
        s"<</Length ${content.length}>>\nstream\n$content\nendstream".getBytes
      }))
    val doc = PdfDocument.load(pdf).toOption.get
    val bmp = Rasterizer.render(doc.page(0))
    // clip: pdf (100..300)×(600..700) → device y 92..192
    def rgbOf(p: Int) = ((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff)
    val (rl, _, bl) = rgbOf(bmp.get(110, 142))
    assert(rl > 200 && bl < 60, s"left=${rgbOf(bmp.get(110, 142))}")
    val (rr, _, br) = rgbOf(bmp.get(290, 142))
    assert(rr < 60 && br > 200, s"right=${rgbOf(bmp.get(290, 142))}")
    val (rm, _, bm) = rgbOf(bmp.get(200, 142))
    assert(math.abs(rm - bm) < 30 && rm > 90 && rm < 160, s"mid=${rgbOf(bmp.get(200, 142))}")
    assert(bmp.get(90, 142) == 0xFFFFFFFF)  // outside clip
    assert(bmp.get(200, 300) == 0xFFFFFFFF) // below clip
  }

  test("stitching function (type 3) drives a two-segment gradient") {
    val pdf = SynthPdf.build(Vector(
      "<</Type/Catalog/Pages 2 0 R>>".getBytes,
      "<</Type/Pages/Kids[3 0 R]/Count 1>>".getBytes,
      ("<</Type/Page/Parent 2 0 R/MediaBox[0 0 612 792]/Resources<<" +
        "/Shading<</Sh1<</ShadingType 2/ColorSpace/DeviceRGB/Coords[100 0 300 0]" +
        "/Function<</FunctionType 3/Domain[0 1]/Bounds[0.5]/Encode[0 1 0 1]" +
        "/Functions[<</FunctionType 2/Domain[0 1]/C0[1 0 0]/C1[0 1 0]/N 1>>" +
        "<</FunctionType 2/Domain[0 1]/C0[0 1 0]/C1[0 0 1]/N 1>>]>>" +
        "/Extend[true true]>>>>>>/Contents 4 0 R>>").getBytes,
      {
        val content = "q 100 600 200 100 re W n /Sh1 sh Q"
        s"<</Length ${content.length}>>\nstream\n$content\nendstream".getBytes
      }))
    val doc = PdfDocument.load(pdf).toOption.get
    val bmp = Rasterizer.render(doc.page(0))
    def g(p: Int) = (p >> 8) & 0xff
    assert(g(bmp.get(200, 142)) > 200, f"mid-green=${bmp.get(200, 142)}%08x") // t=0.5 → pure green
    assert(((bmp.get(110, 142) >> 16) & 0xff) > 180) // left reddish
    assert((bmp.get(290, 142) & 0xff) > 180)         // right bluish
  }

  private def shadingPdf(fnObjRef: String, extraObjs: Vector[Array[Byte]]): Array[Byte] =
    SynthPdf.build(Vector(
      "<</Type/Catalog/Pages 2 0 R>>".getBytes,
      "<</Type/Pages/Kids[3 0 R]/Count 1>>".getBytes,
      ("<</Type/Page/Parent 2 0 R/MediaBox[0 0 612 792]/Resources<<" +
        "/Shading<</Sh<</ShadingType 2/ColorSpace/DeviceRGB/Coords[100 0 300 0]" +
        s"/Function $fnObjRef/Extend[true true]>>>>>>/Contents 4 0 R>>").getBytes,
      {
        val content = "q 100 600 200 100 re W n /Sh sh Q"
        s"<</Length ${content.length}>>\nstream\n$content\nendstream".getBytes
      }) ++ extraObjs)

  test("sampled (type 0) function: red→blue from bit-packed samples") {
    val samples = Array(0xFF, 0x00, 0x00, 0x00, 0x00, 0xFF).map(_.toByte)
    val fnObj = ("<</FunctionType 0/Domain[0 1]/Range[0 1 0 1 0 1]/Size[2]" +
      s"/BitsPerSample 8/Length ${samples.length}>>\nstream\n")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1) ++ samples ++ "\nendstream".getBytes
    val doc = PdfDocument.load(shadingPdf("5 0 R", Vector(fnObj))).toOption.get
    val bmp = Rasterizer.render(doc.page(0))
    assert(((bmp.get(110, 142) >> 16) & 0xff) > 200) // left red
    assert((bmp.get(290, 142) & 0xff) > 200)         // right blue
    val mid = bmp.get(200, 142)
    assert(math.abs(((mid >> 16) & 0xff) - (mid & 0xff)) < 30) // balanced middle
  }

  test("PostScript (type 4) function: calculator program drives the gradient") {
    val prog = "{ dup 1 exch sub 0 3 -1 roll }" // t → (1-t, 0, t)
    val fnObj = (s"<</FunctionType 4/Domain[0 1]/Range[0 1 0 1 0 1]/Length ${prog.length}>>\nstream\n" +
      prog + "\nendstream").getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val doc = PdfDocument.load(shadingPdf("5 0 R", Vector(fnObj))).toOption.get
    val bmp = Rasterizer.render(doc.page(0))
    assert(((bmp.get(110, 142) >> 16) & 0xff) > 200, f"left=${bmp.get(110, 142)}%08x")
    assert((bmp.get(290, 142) & 0xff) > 200, f"right=${bmp.get(290, 142)}%08x")
  }

  test("shading-pattern fill: scn /P paints the gradient across the path") {
    val pdf = SynthPdf.build(Vector(
      "<</Type/Catalog/Pages 2 0 R>>".getBytes,
      "<</Type/Pages/Kids[3 0 R]/Count 1>>".getBytes,
      ("<</Type/Page/Parent 2 0 R/MediaBox[0 0 612 792]/Resources<<" +
        "/Pattern<</P<</PatternType 2/Shading<</ShadingType 2/ColorSpace/DeviceRGB" +
        "/Coords[100 0 300 0]/Function<</FunctionType 2/Domain[0 1]/C0[1 0 0]/C1[0 0 1]/N 1>>" +
        "/Extend[true true]>>>>>>>>/Contents 4 0 R>>").getBytes,
      {
        val content = "/Pattern cs /P scn 100 600 200 100 re f"
        s"<</Length ${content.length}>>\nstream\n$content\nendstream".getBytes
      }))
    val doc = PdfDocument.load(pdf).toOption.get
    val bmp = Rasterizer.render(doc.page(0))
    assert(((bmp.get(110, 142) >> 16) & 0xff) > 200, f"left=${bmp.get(110, 142)}%08x")
    assert((bmp.get(290, 142) & 0xff) > 200)
    assert(bmp.get(90, 142) == 0xFFFFFFFF)  // outside the path
    assert(bmp.get(200, 300) == 0xFFFFFFFF)
  }

  test("tiling pattern: checkerboard cells repeat across the filled path") {
    // 20×20 cell with a 10×10 black square at its origin, tiled over a rect
    val cell = "0 0 0 rg 0 0 10 10 re f"
    val pdf = SynthPdf.build(Vector(
      "<</Type/Catalog/Pages 2 0 R>>".getBytes,
      "<</Type/Pages/Kids[3 0 R]/Count 1>>".getBytes,
      ("<</Type/Page/Parent 2 0 R/MediaBox[0 0 612 792]/Resources<<" +
        "/Pattern<</P 5 0 R>>>>/Contents 4 0 R>>").getBytes,
      {
        val content = "/Pattern cs /P scn 100 600 100 100 re f"
        s"<</Length ${content.length}>>\nstream\n$content\nendstream".getBytes
      },
      (s"<</PatternType 1/PaintType 1/TilingType 1/BBox[0 0 20 20]/XStep 20/YStep 20" +
        s"/Resources<<>>/Length ${cell.length}>>\nstream\n$cell\nendstream").getBytes))
    val doc = PdfDocument.load(pdf).toOption.get
    val bmp = Rasterizer.render(doc.page(0))
    // device y: pdf 600..700 → 92..192. Pattern anchored at pattern-space
    // origin: black squares at pdf x in [0,10)+20k, y in [0,10)+20k.
    assert(bmp.get(105, 792 - 605) == 0xFF000000, f"in-cell=${bmp.get(105, 792 - 605)}%08x")
    assert(bmp.get(115, 792 - 605) == 0xFFFFFFFF) // gap between cells
    assert(bmp.get(125, 792 - 625) == 0xFF000000) // next cell over (+20,+20)
    assert(bmp.get(90, 792 - 605) == 0xFFFFFFFF)  // outside the path
  }

  test("TrueType glyph contours agree with the independently-parsed bboxes") {
    val doc = PdfDocument.load(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/tests/resources/text.pdf"))).toOption.get
    // force font decoders via the text page, then inspect the embedded TT
    val page = doc.page(0)
    page.textPage
    val fonts = ContentInterpreter.run(page).textObjects.map(_.font).distinct
    val tt = fonts.flatMap(_.truetype).headOption.getOrElse(fail("no embedded TrueType"))
    var checked = 0
    (1 until 40).foreach { gid =>
      val contours = tt.glyphContours(gid)
      val bbox = tt.glyphBBox(gid)
      if (contours.nonEmpty && bbox.isDefined) {
        val xs = contours.flatMap(c => c.indices.collect { case i if i % 2 == 0 => c(i) })
        val ys = contours.flatMap(c => c.indices.collect { case i if i % 2 == 1 => c(i) })
        val b = bbox.get
        // bbox uses TT2PDF int rounding; contour extremes must agree within
        // that quantization (±2.5/1000 em) — a parsing bug would be far off
        assert(math.abs(xs.min - b.left) < 0.0025, s"gid=$gid left ${xs.min} vs ${b.left}")
        assert(math.abs(xs.max - b.right) < 0.0025, s"gid=$gid right")
        assert(math.abs(ys.min - b.bottom) < 0.0025, s"gid=$gid bottom")
        assert(math.abs(ys.max - b.top) < 0.0025, s"gid=$gid top")
        checked += 1
      }
    }
    assert(checked > 10, s"only $checked glyphs had outlines")
  }

  test("text.pdf renders with outline ink (sparser than solid boxes)") {
    val doc = PdfDocument.load(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/tests/resources/text.pdf"))).toOption.get
    val bmp = Rasterizer.render(doc.page(0))
    val ink = bmp.inkFraction
    // a text page at 1px/pt: outlines ≈ 0.5-4% ink; solid boxes would be ~3×
    assert(ink > 0.003 && ink < 0.06, s"ink=$ink")
  }

  test("fixture smoke: render.pdf and images.pdf rasterize with sane ink") {
    Seq("render.pdf", "images.pdf").foreach { f =>
      val bytes = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"/root/reference/tests/resources/$f"))
      val doc = PdfDocument.load(bytes).toOption.get
      val bmp = Rasterizer.render(doc.page(0), scale = 0.5)
      val ink = bmp.inkFraction
      assert(ink > 0.001 && ink < 0.9, s"$f ink=$ink")
    }
  }

  // ---- transparency / pattern-space additions -------------------------------

  /** One page with extra resource entries and extra indirect objects
    * (numbered from 4). */
  private def pageWith(content: String, resources: String,
                       extraObjs: Vector[Array[Byte]]): Array[Byte] = {
    val cBytes = content.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val contentsRef = 4 + extraObjs.length
    SynthPdf.build(Vector(
      "<</Type/Catalog/Pages 2 0 R>>".getBytes,
      "<</Type/Pages/Kids[3 0 R]/Count 1>>".getBytes,
      s"<</Type/Page/Parent 2 0 R/MediaBox[0 0 612 792]/Resources<<$resources>>/Contents $contentsRef 0 R>>".getBytes,
    ) ++ extraObjs :+
      ((s"<</Length ${cBytes.length}>>\nstream\n".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
        ++ cBytes ++ "\nendstream".getBytes): Array[Byte]))
  }

  test("ImageMask stencil: painted bits take the fill color, clear bits skip") {
    // 8×8 1bpp mask, alternating rows: 0x00 = samples 0 (PAINT with default
    // Decode [0 1]), 0xFF = samples 1 (transparent)
    val bits: Array[Byte] = Array.tabulate(8)(r => if (r % 2 == 0) 0x00.toByte else 0xFF.toByte)
    val maskObj = ("<</Type/XObject/Subtype/Image/Width 8/Height 8/ImageMask true/Length 8>>\nstream\n".getBytes(
      java.nio.charset.StandardCharsets.ISO_8859_1) ++ bits ++ "\nendstream".getBytes): Array[Byte]
    val content = "0 1 0 rg 100 600 64 64 re f " + // green backdrop
      "1 0 0 rg q 64 0 0 64 100 600 cm /M1 Do Q"   // red through the stencil
    val doc = PdfDocument.load(pageWith(content, "/XObject<</M1 4 0 R>>", Vector(maskObj))).toOption.get
    val bmp = Rasterizer.render(doc.page(0))
    // device y = 792 - 664 .. 792 - 600; image row 0 is the TOP row (y≈128)
    val rowPaint = bmp.get(132, 792 - 660)  // a painted row → red
    val rowSkip = bmp.get(132, 792 - 652)   // a skipped row → backdrop green
    assert(rowPaint == 0xFFFF0000, f"paint=$rowPaint%08x")
    assert(rowSkip == 0xFF00FF00, f"skip=$rowSkip%08x")
  }

  test("SMask: per-pixel alpha composites the image over the backdrop") {
    // base: 4×4 solid red RGB (raw, no filter); smask: left half 0, right 255
    val base = Array.fill(4 * 4)(Array[Byte](255.toByte, 0, 0)).flatten
    val sm = Array.tabulate(4 * 4)(i => if (i % 4 < 2) 0.toByte else 255.toByte)
    val smObj = (s"<</Type/XObject/Subtype/Image/Width 4/Height 4/BitsPerComponent 8/ColorSpace/DeviceGray/Length ${sm.length}>>\nstream\n".getBytes(
      java.nio.charset.StandardCharsets.ISO_8859_1) ++ sm ++ "\nendstream".getBytes): Array[Byte]
    val imgObj = (s"<</Type/XObject/Subtype/Image/Width 4/Height 4/BitsPerComponent 8/ColorSpace/DeviceRGB/SMask 5 0 R/Length ${base.length}>>\nstream\n".getBytes(
      java.nio.charset.StandardCharsets.ISO_8859_1) ++ base ++ "\nendstream".getBytes): Array[Byte]
    val content = "q 64 0 0 64 100 600 cm /I1 Do Q"
    val doc = PdfDocument.load(pageWith(content, "/XObject<</I1 4 0 R>>",
      Vector(imgObj, smObj))).toOption.get
    val bmp = Rasterizer.render(doc.page(0))
    assert(bmp.get(110, 792 - 630) == 0xFFFFFFFF, "transparent half must show white backdrop")
    assert(bmp.get(150, 792 - 630) == 0xFFFF0000, "opaque half must be red")
  }

  test("ExtGState ca: half-transparent red over white = pink") {
    val gsObj = "<</Type/ExtGState/ca 0.5>>".getBytes
    val content = "/G1 gs 1 0 0 rg 100 600 50 30 re f"
    val doc = PdfDocument.load(pageWith(content, "/ExtGState<</G1 4 0 R>>", Vector(gsObj))).toOption.get
    val bmp = Rasterizer.render(doc.page(0))
    val p = bmp.get(125, 175)
    assert(((p >> 16) & 0xff) == 255 && math.abs(((p >> 8) & 0xff) - 128) <= 1,
      f"expected ~FFFF8080, got $p%08x")
  }

  test("blend Multiply: red over blue = black; Screen: red over blue = magenta") {
    val gsM = "<</Type/ExtGState/BM/Multiply>>".getBytes
    val gsS = "<</Type/ExtGState/BM/Screen>>".getBytes
    val content = "0 0 1 rg 100 600 100 30 re f " +
      "/GM gs 1 0 0 rg 100 600 50 30 re f " +
      "/GS gs 1 0 0 rg 150 600 50 30 re f"
    val doc = PdfDocument.load(pageWith(content,
      "/ExtGState<</GM 4 0 R/GS 5 0 R>>", Vector(gsM, gsS))).toOption.get
    val bmp = Rasterizer.render(doc.page(0))
    assert(bmp.get(125, 175) == 0xFF000000, f"multiply=${bmp.get(125, 175)}%08x")
    assert(bmp.get(175, 175) == 0xFFFF00FF, f"screen=${bmp.get(175, 175)}%08x")
  }

  test("pattern space anchors to the page, not the paint-time CTM") {
    val pat = ("<</PatternType 2/Shading<</ShadingType 2/ColorSpace/DeviceRGB" +
      "/Coords[0 0 612 0]/Extend[true true]" +
      "/Function<</FunctionType 2/C0[0 0 0]/C1[1 1 1]/N 1>>>>>>").getBytes
    def renderWith(content: String): render.Bitmap = {
      val doc = PdfDocument.load(pageWith(content, "/Pattern<</P1 4 0 R>>", Vector(pat))).toOption.get
      Rasterizer.render(doc.page(0))
    }
    val plain = renderWith("/Pattern cs /P1 scn 0 0 612 792 re f")
    val shifted = renderWith("q 1 0 0 1 300 0 cm /Pattern cs /P1 scn -300 0 612 792 re f Q")
    // same device pixel → same pattern color even though the CTM differed
    assert(plain.get(100, 400) == shifted.get(100, 400),
      f"plain=${plain.get(100, 400)}%08x shifted=${shifted.get(100, 400)}%08x")
    // and the gradient is page-anchored: darker on the left than the right
    assert((plain.get(50, 400) & 0xff) < (plain.get(550, 400) & 0xff))
  }

  test("radial shading: exact quadratic — concentric gradient by distance") {
    val res = "/Shading<</S1<</ShadingType 3/ColorSpace/DeviceRGB" +
      "/Coords[306 396 0 306 396 200]" +
      "/Function<</FunctionType 2/C0[0 0 0]/C1[1 1 1]/N 1>>>>>>"
    val doc = PdfDocument.load(pageWith("q 0 0 612 792 re W n /S1 sh Q", res, Vector.empty)).toOption.get
    val bmp = Rasterizer.render(doc.page(0))
    val cy = 792 - 396
    def gray(x: Int) = bmp.get(x, cy) & 0xff
    assert(gray(306) <= 2, s"center=${gray(306)}")                 // t≈0 → black
    assert(math.abs(gray(306 + 100) - 128) <= 3, s"mid=${gray(406)}") // t≈0.5
    assert(math.abs(gray(306 + 180) - 230) <= 4)                   // t≈0.9
    assert(bmp.get(306 + 250, cy) == 0xFFFFFFFF, "outside r1 unpainted without Extend")
  }

  test("annotation appearance streams draw into the /Rect (draw_forms analog)") {
    // widget at Rect [100 600 200 650]; AP /N form (BBox 0 0 10 5) fills its
    // whole box red → the render must show red across the mapped rect
    val apContent = "1 0 0 rg 0 0 10 5 re f"
    val apObj = (s"<</Type/XObject/Subtype/Form/BBox[0 0 10 5]/Length ${apContent.length}>>\nstream\n$apContent\nendstream").getBytes
    val pageObj = ("<</Type/Page/Parent 2 0 R/MediaBox[0 0 612 792]" +
      "/Annots[5 0 R]/Contents 6 0 R>>").getBytes
    val annotObj = "<</Type/Annot/Subtype/Widget/Rect[100 600 200 650]/AP<</N 4 0 R>>/F 4>>".getBytes
    val content = "0 1 0 rg 300 300 10 10 re f"
    val pdf = SynthPdf.build(Vector(
      "<</Type/Catalog/Pages 2 0 R>>".getBytes,
      "<</Type/Pages/Kids[3 0 R]/Count 1>>".getBytes,
      pageObj, apObj, annotObj,
      s"<</Length ${content.length}>>\nstream\n$content\nendstream".getBytes))
    val doc = PdfDocument.load(pdf).toOption.get
    val on = Rasterizer.render(doc.page(0))
    val off = Rasterizer.render(doc.page(0), drawAnnots = false)
    assert(on.get(150, 792 - 625) == 0xFFFF0000, f"annot ap=${on.get(150, 792 - 625)}%08x")
    assert(off.get(150, 792 - 625) == 0xFFFFFFFF)
    assert(on.get(305, 792 - 305) == 0xFF00FF00, "page content still renders")
  }

  test("hidden annotations (/F Hidden) are skipped") {
    val apContent = "1 0 0 rg 0 0 10 5 re f"
    val apObj = (s"<</Type/XObject/Subtype/Form/BBox[0 0 10 5]/Length ${apContent.length}>>\nstream\n$apContent\nendstream").getBytes
    val pageObj = "<</Type/Page/Parent 2 0 R/MediaBox[0 0 612 792]/Annots[5 0 R]/Contents 6 0 R>>".getBytes
    val annotObj = "<</Type/Annot/Subtype/Widget/Rect[100 600 200 650]/AP<</N 4 0 R>>/F 2>>".getBytes
    val pdf = SynthPdf.build(Vector(
      "<</Type/Catalog/Pages 2 0 R>>".getBytes,
      "<</Type/Pages/Kids[3 0 R]/Count 1>>".getBytes,
      pageObj, apObj, annotObj,
      "<</Length 0>>\nstream\n\nendstream".getBytes))
    val doc = PdfDocument.load(pdf).toOption.get
    val bmp = Rasterizer.render(doc.page(0))
    assert(bmp.get(150, 792 - 625) == 0xFFFFFFFF)
  }

  test("shaped clip: a triangular W n clip masks the fill to the triangle") {
    // triangle clip, then a full-page red fill: only triangle interior painted
    val bmp = renderOf("300 100 m 400 100 l 350 200 l h W n 1 0 0 rg 0 0 612 792 re f")
    assert(bmp.get(350, 792 - 120) == 0xFFFF0000, "inside triangle")
    assert(bmp.get(305, 792 - 190) == 0xFFFFFFFF, "inside bbox but outside triangle")
    assert(bmp.get(100, 400) == 0xFFFFFFFF, "far outside")
  }

  test("shaped clip intersects an earlier rect clip") {
    // rect clip x∈[300,360], then triangle clip; fill paints only the overlap
    val bmp = renderOf(
      "300 100 60 100 re W n " +
      "300 100 m 400 100 l 350 200 l h W n 1 0 0 rg 0 0 612 792 re f")
    assert(bmp.get(320, 792 - 110) == 0xFFFF0000, "in rect ∩ triangle")
    assert(bmp.get(380, 792 - 110) == 0xFFFFFFFF, "in triangle, outside rect")
    assert(bmp.get(310, 792 - 190) == 0xFFFFFFFF, "in rect, outside triangle")
  }

  test("uncolored tiling pattern (PaintType 2): cells paint the scn color") {
    // 20×20 cell fills its lower-left 10×10 square; cell content tries to
    // set red, which an uncolored pattern must IGNORE (§8.7.3.3)
    val cell = "1 0 0 rg 0 0 10 10 re f"
    val pat = (s"<</PatternType 1/PaintType 2/TilingType 1/BBox[0 0 20 20]" +
      s"/XStep 20/YStep 20/Resources<<>>/Length ${cell.length}>>\nstream\n$cell\nendstream").getBytes
    val content = "/Pattern cs 0 0 1 /P1 scn 100 600 40 40 re f"
    val doc = PdfDocument.load(pageWith(content, "/Pattern<</P1 4 0 R>>", Vector(pat))).toOption.get
    val bmp = Rasterizer.render(doc.page(0))
    // pattern anchored at page origin → cell squares at [100,110)x[600,610)
    val inCell = bmp.get(105, 792 - 605)
    val offCell = bmp.get(115, 792 - 605)
    assert(inCell == 0xFF0000FF, f"in-cell=$inCell%08x (must be scn blue, not cell red)")
    assert(offCell == 0xFFFFFFFF, f"off-cell=$offCell%08x")
  }

  test("render transform matrix: crop×scale×rotation combos " +
       "(test_rendering.py:39-91 port, ExpRenderPixels conftest.py:52-57)") {
    val doc = PdfDocument.load(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/tests/resources/render.pdf"))).toOption.get
    val page = doc.page(0)
    val pw = page.bbox.width; val ph = page.bbox.height
    // reference expected pixels at scale 1 in image coords (top-left origin)
    val exp = Seq(
      ((0, 0), (255, 255, 255)),
      ((150, 180), (129, 212, 26)),
      ((150, 390), (42, 96, 153)),
      ((150, 570), (128, 0, 128)))
    val combos = Seq( // (crop l,b,r,t), scale, rotation — the reference's 11 rows
      ((0.0, 0.0, 0.0, 0.0), 0.25, 0), ((0.0, 0.0, 0.0, 0.0), 0.5, 90),
      ((0.0, 0.0, 0.0, 0.0), 0.75, 180), ((0.0, 0.0, 0.0, 0.0), 1.0, 270),
      ((100.0, 0.0, 0.0, 0.0), 0.5, 0), ((0.0, 100.0, 0.0, 0.0), 0.5, 0),
      ((0.0, 0.0, 100.0, 0.0), 0.5, 0), ((0.0, 0.0, 0.0, 100.0), 0.5, 0),
      ((0.0, 100.0, 0.0, 0.0), 0.5, 90), ((0.0, 0.0, 100.0, 0.0), 0.5, 180),
      ((0.0, 0.0, 0.0, 100.0), 0.5, 270))
    combos.foreach { case ((l, b, r, t), scale, rot) =>
      val bmp = Rasterizer.render(page, scale = scale, rotation = rot, crop = (l, b, r, t))
      val (cl, cb, cr, ct) = (math.ceil(l * scale).toInt, math.ceil(b * scale).toInt,
        math.ceil(r * scale).toInt, math.ceil(t * scale).toInt)
      var w = math.ceil(pw * scale).toInt; var h = math.ceil(ph * scale).toInt
      if (rot == 90 || rot == 270) { val tmp = w; w = h; h = tmp }
      val cw = w - cl - cr; val ch = h - cb - ct
      assert(bmp.width == cw && bmp.height == ch,
        s"dims ${bmp.width}x${bmp.height} != ${cw}x$ch at scale=$scale rot=$rot crop=($l,$b,$r,$t)")
      exp.foreach { case ((ex, ey), (er, eg, eb)) =>
        var x = math.round(ex * scale).toInt; var y = math.round(ey * scale).toInt
        if (rot == 90 || rot == 270) { val tmp = x; x = y; y = tmp }
        if (rot == 90 || rot == 180) x = w - 1 - x
        if (rot == 180 || rot == 270) y = h - 1 - y
        x -= cl; y -= ct
        if (0 <= x && x < cw && 0 <= y && y < ch) {
          val p = bmp.get(x, y)
          val (pr, pg, pb) = ((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff)
          assert(math.abs(pr - er) <= 2 && math.abs(pg - eg) <= 2 && math.abs(pb - eb) <= 2,
            f"pixel ($x,$y) = $p%08x, want ($er,$eg,$eb) at scale=$scale rot=$rot crop=($l,$b,$r,$t)")
        }
      }
    }
  }

  test("render output formats on render.pdf: BGRx pixels, Gray dims, fill colors " +
       "(test_rendering.py:97-171 port)") {
    val doc = PdfDocument.load(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/tests/resources/render.pdf"))).toOption.get
    val page = doc.page(0)
    // BGRx byte layout at the reference's expected pixels (x byte = 255)
    val bmp = Rasterizer.render(page)
    val bgrx = bmp.toBytes("BGRx")
    Seq(((0, 0), (255, 255, 255)), ((150, 180), (129, 212, 26)),
        ((150, 390), (42, 96, 153)), ((150, 570), (128, 0, 128))).foreach {
      case ((x, y), (er, eg, eb)) =>
        val o = (y * bmp.width + x) * 4
        val (b, g, r, xx) = (bgrx(o) & 0xff, bgrx(o + 1) & 0xff, bgrx(o + 2) & 0xff, bgrx(o + 3) & 0xff)
        assert(math.abs(r - er) <= 2 && math.abs(g - eg) <= 2 && math.abs(b - eb) <= 2 && xx == 255,
          s"($x,$y): got ($r,$g,$b,$xx), want ($er,$eg,$eb,255)")
    }
    // grayscale at scale 0.5: reference pins size (298, 421), mode L
    val half = Rasterizer.render(page, scale = 0.5)
    assert(half.width == 298 && half.height == 421)
    val gray = half.toBytes("Gray")
    assert(gray.length == 298 * 421)
    assert((gray(0) & 0xff) == 255) // white background → luma 255
    // fill_color matrix: the (0,0) background pixel equals the fill color
    Seq((60, 70, 80), (0, 255, 255), (255, 0, 255), (255, 255, 0)).foreach {
      case (r, g, b) =>
        val f = Rasterizer.render(page, scale = 0.5,
          fillColor = render.Bitmap.colorToHex(r, g, b, 255))
        assert(f.get(0, 0) == (0xFF000000 | (r << 16) | (g << 8) | b),
          f"fill ($r,$g,$b): got ${f.get(0, 0)}%08x")
    }
  }

  // ---- round-3 additions: soft masks, non-separable blends, render opts ----

  test("ExtGState /SMask (luminosity): paint shows only where the group is lit") {
    // mask group: white fill over the LEFT half of the page (lum 1 there,
    // black backdrop lum 0 elsewhere); then a full-page red fill through it
    val group = "1 1 1 rg 0 0 306 792 re f"
    val groupObj = (s"<</Type/XObject/Subtype/Form/BBox[0 0 612 792]/Length ${group.length}>>\nstream\n$group\nendstream").getBytes
    val gsObj = "<</Type/ExtGState/SMask<</S/Luminosity/G 5 0 R>>>>".getBytes
    val content = "/G1 gs 1 0 0 rg 0 0 612 792 re f"
    val doc = PdfDocument.load(pageWith(content, "/ExtGState<</G1 4 0 R>>",
      Vector(gsObj, groupObj))).toOption.get
    val bmp = Rasterizer.render(doc.page(0))
    assert(bmp.get(100, 400) == 0xFFFF0000, f"masked-in=${bmp.get(100, 400)}%08x")
    assert(bmp.get(500, 400) == 0xFFFFFFFF, f"masked-out=${bmp.get(500, 400)}%08x")
  }

  test("ExtGState /SMask /None clears an active soft mask") {
    val group = "1 1 1 rg 0 0 306 792 re f"
    val groupObj = (s"<</Type/XObject/Subtype/Form/BBox[0 0 612 792]/Length ${group.length}>>\nstream\n$group\nendstream").getBytes
    val gsOn = "<</Type/ExtGState/SMask<</S/Luminosity/G 6 0 R>>>>".getBytes
    val gsOff = "<</Type/ExtGState/SMask/None>>".getBytes
    val content = "/G1 gs /G0 gs 1 0 0 rg 0 0 612 792 re f"
    val doc = PdfDocument.load(pageWith(content, "/ExtGState<</G1 4 0 R/G0 5 0 R>>",
      Vector(gsOn, gsOff, groupObj))).toOption.get
    val bmp = Rasterizer.render(doc.page(0))
    assert(bmp.get(500, 400) == 0xFFFF0000, "after /SMask /None the fill is unmasked")
  }

  test("transparency group: overlapping marks flatten before the group alpha") {
    // two overlapping red rects inside a /Group /Transparency form, drawn
    // under /ca 0.5: group semantics give a UNIFORM pink (flatten first,
    // one composite); per-object compositing would double-darken overlap
    val form = "1 0 0 rg 100 600 100 50 re f 150 600 100 50 re f"
    val formObj = (s"<</Type/XObject/Subtype/Form/BBox[0 0 612 792]" +
      s"/Group<</S/Transparency/CS/DeviceRGB>>/Length ${form.length}>>\nstream\n$form\nendstream").getBytes
    val gsObj = "<</Type/ExtGState/ca 0.5>>".getBytes
    val doc = PdfDocument.load(pageWith("/G1 gs /Fm Do",
      "/ExtGState<</G1 4 0 R>>/XObject<</Fm 5 0 R>>", Vector(gsObj, formObj))).toOption.get
    val bmp = Rasterizer.render(doc.page(0))
    val only = bmp.get(120, 792 - 625)      // covered by first rect only
    val overlap = bmp.get(175, 792 - 625)   // covered by both
    assert(only == overlap, f"only=$only%08x overlap=$overlap%08x — overlap double-composited")
    assert(((only >> 16) & 0xff) == 255 && math.abs(((only >> 8) & 0xff) - 128) <= 1,
      f"expected ~FFFF8080, got $only%08x")
    assert(bmp.get(90, 792 - 625) == 0xFFFFFFFF, "outside the group untouched")
  }

  test("group mark equal to the backdrop still composites under Difference (coverage, not inequality)") {
    // page painted solid red; a transparency group paints the SAME red over
    // it, composited with group-level /BM /Difference at full alpha.
    // Difference(red, red) = black — the r3 single-walk coverage test
    // (off != backdrop) skipped such pixels and left them red.
    val form = "1 0 0 rg 100 600 200 100 re f"
    val formObj = (s"<</Type/XObject/Subtype/Form/BBox[0 0 612 792]" +
      s"/Group<</S/Transparency/CS/DeviceRGB>>/Length ${form.length}>>\nstream\n$form\nendstream").getBytes
    val gsObj = "<</Type/ExtGState/BM/Difference>>".getBytes
    val doc = PdfDocument.load(pageWith("1 0 0 rg 0 0 612 792 re f /G1 gs /Fm Do",
      "/ExtGState<</G1 4 0 R>>/XObject<</Fm 5 0 R>>", Vector(gsObj, formObj))).toOption.get
    val bmp = Rasterizer.render(doc.page(0))
    assert(bmp.get(150, 792 - 650) == 0xFF000000,
      f"Difference of equal colors must be black, got ${bmp.get(150, 792 - 650)}%08x")
    assert(bmp.get(90, 792 - 650) == 0xFFFF0000, "outside the group: red backdrop untouched")
  }

  test("isolated group: in-group Multiply ignores the page backdrop; non-isolated sees it") {
    // dark blue page; a group fills red with in-group Multiply.
    // Non-isolated: Multiply(blue, red) = black. Isolated (/I true): the
    // initial group backdrop is transparent — red survives, and the group
    // composites red over the page.
    val form = "/Gm gs 1 0 0 rg 100 600 200 100 re f"
    def pdfWith(iso: String) = {
      val formObj = (s"<</Type/XObject/Subtype/Form/BBox[0 0 612 792]" +
        s"/Group<</S/Transparency/CS/DeviceRGB$iso>>" +
        s"/Resources<</ExtGState<</Gm 6 0 R>>>>/Length ${form.length}>>\nstream\n$form\nendstream").getBytes
      val gsObj = "<</Type/ExtGState/ca 0.999>>".getBytes // force the group path
      val gmObj = "<</Type/ExtGState/BM/Multiply>>".getBytes
      pageWith("0 0 1 rg 0 0 612 792 re f /G1 gs /Fm Do",
        "/ExtGState<</G1 4 0 R>>/XObject<</Fm 5 0 R>>", Vector(gsObj, formObj, gmObj))
    }
    val nonIso = Rasterizer.render(
      PdfDocument.load(pdfWith("")).toOption.get.page(0)).get(150, 792 - 650)
    val iso = Rasterizer.render(
      PdfDocument.load(pdfWith("/I true")).toOption.get.page(0)).get(150, 792 - 650)
    assert(((nonIso >> 16) & 0xff) <= 1 && (nonIso & 0xff) <= 1,
      f"non-isolated Multiply(blue,red) should be ~black, got $nonIso%08x")
    assert(((iso >> 16) & 0xff) >= 253 && (iso & 0xff) <= 2,
      f"isolated Multiply sees no page backdrop → red, got $iso%08x")
  }

  test("knockout group: overlapping half-alpha marks replace; non-knockout stacks") {
    // two overlapping 50%-alpha black rects INSIDE a transparency group over
    // white. Non-knockout: the overlap composites twice (0.25 → ~64);
    // knockout (/K true): the second mark composites against the group's
    // INITIAL backdrop — overlap stays 50% gray (~128), same as either rect.
    val form = "/Ga gs 0 0 0 rg 100 600 100 50 re f 150 600 100 50 re f"
    def pdf(k: String) = {
      val formObj = (s"<</Type/XObject/Subtype/Form/BBox[0 0 612 792]" +
        s"/Group<</S/Transparency/CS/DeviceRGB$k>>" +
        s"/Resources<</ExtGState<</Ga 6 0 R>>>>/Length ${form.length}>>\nstream\n$form\nendstream").getBytes
      val gsObj = "<</Type/ExtGState/ca 0.999>>".getBytes // force the group path
      val gaObj = "<</Type/ExtGState/ca 0.5>>".getBytes
      pageWith("/G1 gs /Fm Do",
        "/ExtGState<</G1 4 0 R>>/XObject<</Fm 5 0 R>>", Vector(gsObj, formObj, gaObj))
    }
    def overlapGray(bytes: Array[Byte]) =
      Rasterizer.render(PdfDocument.load(bytes).toOption.get.page(0)).get(175, 792 - 625) & 0xff
    val stacked = overlapGray(pdf(""))
    val ko = overlapGray(pdf("/K true"))
    assert(stacked < 80, s"non-knockout overlap double-composites: $stacked")
    assert(ko > 110 && ko < 145, s"knockout overlap stays single-composite gray: $ko")
  }

  test("text honors show-time /ca: glyphs at half alpha are gray, not black") {
    val gsObj = "<</Type/ExtGState/ca 0.5>>".getBytes
    val doc = PdfDocument.load(pageWith(
      "/G1 gs BT /F1 48 Tf 100 600 Td (III) Tj ET",
      "/ExtGState<</G1 4 0 R>>/Font<</F1 5 0 R>>",
      Vector(gsObj, "<</Type/Font/Subtype/Type1/BaseFont/Helvetica>>".getBytes))).toOption.get
    val bmp = Rasterizer.render(doc.page(0))
    // darkest glyph pixel in the text band: half-alpha black over white ≈ 0x80
    var darkest = 255
    for (y <- 792 - 650 until 792 - 595; x <- 95 until 180) {
      val v = bmp.get(x, y) & 0xff
      if (v < darkest) darkest = v
    }
    assert(darkest < 200, "no glyph ink found in the probe band")
    // half-alpha black over white = 128; adjacent glyph-box edges may
    // overlap pairwise (128 → 64) — src-over (the r3 behavior) would be 0
    assert(darkest >= 55, s"glyphs ignored /ca 0.5: darkest=$darkest (src-over black would be ~0)")
  }

  test("renderedPageImages applies the placement transform: flip inverts row order") {
    // 1×2 gray image (black over white): upright placement puts image row 0
    // (black) at the TOP; a negative-d flip placement puts it at the BOTTOM
    def pdf(cm: String) = {
      val samples = Array[Byte](0x00, 0xFF.toByte) // row0 black, row1 white
      val imgHdr = "<</Type/XObject/Subtype/Image/Width 1/Height 2/BitsPerComponent 8" +
        "/ColorSpace/DeviceGray/Length 2>>\nstream\n"
      pageWith(s"q $cm cm /Im1 Do Q", "/XObject<</Im1 4 0 R>>",
        Vector(imgHdr.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1) ++
          samples ++ "\nendstream".getBytes))
    }
    def rowColors(bytes: Array[Byte]): (Int, Int) = {
      val doc = PdfDocument.load(bytes).toOption.get
      val imgs = graft.core.ImageExtract.renderedPageImages(doc.page(0))
      assert(imgs.length == 1 && imgs.head.width == 8 && imgs.head.height == 16,
        s"got ${imgs.map(i => (i.width, i.height))}")
      val bi = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(imgs.head.data))
      (bi.getRGB(4, 2) & 0xff, bi.getRGB(4, 13) & 0xff)
    }
    val (upTop, upBot) = rowColors(pdf("8 0 0 16 100 600"))
    assert(upTop < 64 && upBot > 192, s"upright: top=$upTop bottom=$upBot")
    val (flTop, flBot) = rowColors(pdf("8 0 0 -16 100 616"))
    assert(flTop > 192 && flBot < 64, s"flipped: top=$flTop bottom=$flBot")
  }

  test("type-4 mesh shading: Gouraud triangle with RGB corners") {
    // one triangle, byte-friendly packing: flag 8 bits, coords 16 bits,
    // components 8 bits; Decode maps coords onto [0,612]×[0,792]
    def vert(flag: Int, x: Int, y: Int, r: Int, g: Int, b: Int): Array[Byte] =
      Array(flag.toByte, (x >> 8).toByte, x.toByte, (y >> 8).toByte, y.toByte,
        r.toByte, g.toByte, b.toByte)
    def c16(v: Double): Int = math.round(v / 612.0 * 65535).toInt // x in [0,612]
    def c16y(v: Double): Int = math.round(v / 792.0 * 65535).toInt
    val mesh = vert(0, c16(100), c16y(600), 255, 0, 0) ++
      vert(0, c16(300), c16y(600), 0, 255, 0) ++
      vert(0, c16(200), c16y(760), 0, 0, 255)
    val shObj = (s"<</ShadingType 4/ColorSpace/DeviceRGB/BitsPerCoordinate 16" +
      s"/BitsPerComponent 8/BitsPerFlag 8/Decode[0 612 0 792 0 1 0 1 0 1]" +
      s"/Length ${mesh.length}>>\nstream\n").getBytes(
        java.nio.charset.StandardCharsets.ISO_8859_1) ++ mesh ++ "\nendstream".getBytes
    val doc = PdfDocument.load(pageWith("/Sh1 sh", "/Shading<</Sh1 4 0 R>>",
      Vector(shObj))).toOption.get
    val bmp = Rasterizer.render(doc.page(0))
    // near each corner: its color dominates; at the centroid all three mix
    def px(x: Int, yPdf: Int) = bmp.get(x, 792 - yPdf)
    val nearR = px(110, 605); val nearG = px(290, 605); val nearB = px(200, 750)
    assert(((nearR >> 16) & 0xff) > 200 && ((nearR >> 8) & 0xff) < 80, f"red corner $nearR%08x")
    assert(((nearG >> 8) & 0xff) > 200 && ((nearG >> 16) & 0xff) < 80, f"green corner $nearG%08x")
    assert((nearB & 0xff) > 200 && ((nearB >> 16) & 0xff) < 80, f"blue corner $nearB%08x")
    val mid = px(200, 655) // near centroid (200, 653)
    Seq((mid >> 16) & 0xff, (mid >> 8) & 0xff, mid & 0xff).foreach(c =>
      assert(c > 40 && c < 160, f"centroid should mix all three, got $mid%08x"))
    assert(px(105, 755) == 0xFFFFFFFF, "outside the triangle stays white")
  }

  test("type-6 Coons patch: square patch interpolates its four corner colors") {
    // one flag-0 patch whose boundary Béziers are straight lines — the
    // square [100,300]×[500,700]; corners (in boundary order p00 p03 p33
    // p30) colored R G B W
    def c16(v: Double): Int = math.round(v / 612.0 * 65535).toInt
    def c16y(v: Double): Int = math.round(v / 792.0 * 65535).toInt
    def pt(x: Double, y: Double): Array[Byte] = {
      val xi = c16(x); val yi = c16y(y)
      Array((xi >> 8).toByte, xi.toByte, (yi >> 8).toByte, yi.toByte)
    }
    def lerp(a: Double, b: Double, t: Double) = a + (b - a) * t
    // boundary order: p00 p01 p02 p03 | p13 p23 | p33 p32 p31 | p30 | p20 p10
    // p00=(100,500) p03=(100,700) p33=(300,700) p30=(300,500); edges straight
    val b = Array(
      (100.0, 500.0), (100.0, lerp(500, 700, 1.0 / 3)), (100.0, lerp(500, 700, 2.0 / 3)), (100.0, 700.0),
      (lerp(100, 300, 1.0 / 3), 700.0), (lerp(100, 300, 2.0 / 3), 700.0),
      (300.0, 700.0), (300.0, lerp(500, 700, 2.0 / 3)), (300.0, lerp(500, 700, 1.0 / 3)),
      (300.0, 500.0), (lerp(100, 300, 2.0 / 3), 500.0), (lerp(100, 300, 1.0 / 3), 500.0))
    val colors = Array[Byte](
      255.toByte, 0, 0, /* c0 at p00: red */
      0, 255.toByte, 0, /* c1 at p03: green */
      0, 0, 255.toByte, /* c2 at p33: blue */
      255.toByte, 255.toByte, 255.toByte /* c3 at p30: white */ )
    val mesh = Array[Byte](0) ++ b.flatMap { case (x, y) => pt(x, y) } ++ colors
    val shObj = (s"<</ShadingType 6/ColorSpace/DeviceRGB/BitsPerCoordinate 16" +
      s"/BitsPerComponent 8/BitsPerFlag 8/Decode[0 612 0 792 0 1 0 1 0 1]" +
      s"/Length ${mesh.length}>>\nstream\n").getBytes(
        java.nio.charset.StandardCharsets.ISO_8859_1) ++ mesh ++ "\nendstream".getBytes
    val doc = PdfDocument.load(pageWith("/Sh1 sh", "/Shading<</Sh1 4 0 R>>",
      Vector(shObj))).toOption.get
    val bmp = Rasterizer.render(doc.page(0))
    def px(x: Int, yPdf: Int) = bmp.get(x, 792 - yPdf)
    val nearR = px(105, 505); val nearG = px(105, 695)
    val nearB = px(295, 695); val nearW = px(295, 505)
    assert(((nearR >> 16) & 0xff) > 200 && ((nearR >> 8) & 0xff) < 80, f"p00 red: $nearR%08x")
    assert(((nearG >> 8) & 0xff) > 200 && ((nearG >> 16) & 0xff) < 80, f"p03 green: $nearG%08x")
    assert((nearB & 0xff) > 200 && ((nearB >> 16) & 0xff) < 80, f"p33 blue: $nearB%08x")
    assert(((nearW >> 16) & 0xff) > 200 && ((nearW >> 8) & 0xff) > 200, f"p30 white: $nearW%08x")
    val mid = px(200, 600) // bilinear mix of all four
    Seq((mid >> 16) & 0xff, (mid >> 8) & 0xff, mid & 0xff).foreach(c =>
      assert(c > 60 && c < 200, f"center mixes all corners, got $mid%08x"))
    assert(px(90, 600) == 0xFFFFFFFF, "outside the patch untouched")
  }

  test("type-5 lattice mesh: 2x2 grid interpolates between rows") {
    def vert(x: Int, y: Int, r: Int, g: Int, b: Int): Array[Byte] =
      Array((x >> 8).toByte, x.toByte, (y >> 8).toByte, y.toByte,
        r.toByte, g.toByte, b.toByte)
    def c16(v: Double): Int = math.round(v / 612.0 * 65535).toInt
    def c16y(v: Double): Int = math.round(v / 792.0 * 65535).toInt
    // row 0 (bottom, black), row 1 (top, white): vertical gradient
    val mesh = vert(c16(100), c16y(500), 0, 0, 0) ++ vert(c16(300), c16y(500), 0, 0, 0) ++
      vert(c16(100), c16y(700), 255, 255, 255) ++ vert(c16(300), c16y(700), 255, 255, 255)
    val shObj = (s"<</ShadingType 5/ColorSpace/DeviceRGB/BitsPerCoordinate 16" +
      s"/BitsPerComponent 8/VerticesPerRow 2/Decode[0 612 0 792 0 1 0 1 0 1]" +
      s"/Length ${mesh.length}>>\nstream\n").getBytes(
        java.nio.charset.StandardCharsets.ISO_8859_1) ++ mesh ++ "\nendstream".getBytes
    val doc = PdfDocument.load(pageWith("/Sh1 sh", "/Shading<</Sh1 4 0 R>>",
      Vector(shObj))).toOption.get
    val bmp = Rasterizer.render(doc.page(0))
    def gray(yPdf: Int) = bmp.get(200, 792 - yPdf) & 0xff
    assert(gray(510) < 30, s"bottom ~black, got ${gray(510)}")
    assert(gray(690) > 225, s"top ~white, got ${gray(690)}")
    val mid = gray(600)
    assert(mid > 100 && mid < 160, s"middle ~50% gray, got $mid")
  }

  test("non-separable blends: Hue/Color/Luminosity per §11.3.5.3") {
    // gray src in Hue mode over red dst → gray at the dst's luminosity (0.3)
    val hue = Rasterizer.composeArgb(0xFFFF0000, 0xFF808080, 1.0, Rasterizer.BlendHue)
    val hr = (hue >> 16) & 0xff; val hg = (hue >> 8) & 0xff; val hb = hue & 0xff
    assert(hr == hg && hg == hb && math.abs(hr - 77) <= 1, f"hue=$hue%08x")
    // white src in Luminosity mode over red dst → white (lum 1 forced)
    val lum = Rasterizer.composeArgb(0xFFFF0000, 0xFFFFFFFF, 1.0, Rasterizer.BlendLuminosity)
    assert(lum == 0xFFFFFFFF, f"lum=$lum%08x")
    // blue src in Color mode over red dst → blue-dominant with dst's luminosity
    val col = Rasterizer.composeArgb(0xFFFF0000, 0xFF0000FF, 1.0, Rasterizer.BlendColor)
    val cr = (col >> 16) & 0xff; val cg = (col >> 8) & 0xff; val cb = col & 0xff
    assert(cb > cr && cr == cg, f"color=$col%08x")
    val cLum = 0.3 * cr + 0.59 * cg + 0.11 * cb
    assert(math.abs(cLum - 76.5) <= 2.0, s"color-mode luminosity=$cLum (want ~76.5)")
  }

  test("separable blends round 3: Overlay doubles contrast, ColorDodge brightens") {
    // Overlay of mid-gray src over dark dst stays dark-ish; over light dst light
    val dark = Rasterizer.composeArgb(0xFF404040, 0xFF808080, 1.0, Rasterizer.BlendOverlay)
    val light = Rasterizer.composeArgb(0xFFC0C0C0, 0xFF808080, 1.0, Rasterizer.BlendOverlay)
    assert((dark & 0xff) < 0x80 && (light & 0xff) > 0x80, f"dark=$dark%08x light=$light%08x")
    val dodge = Rasterizer.composeArgb(0xFF808080, 0xFF808080, 1.0, Rasterizer.BlendColorDodge)
    assert((dodge & 0xff) == 0xff, f"dodge=$dodge%08x") // 0.5/(1-0.5) ≥ 1 → white
  }

  test("form XObject /BBox clips its content; outer clip carries into the form") {
    val form = "0 0 1 rg 0 0 200 200 re f"
    val formObj = (s"<</Type/XObject/Subtype/Form/BBox[0 0 50 50]/Length ${form.length}>>\nstream\n$form\nendstream").getBytes
    val doc = PdfDocument.load(pageWith("/Fm Do", "/XObject<</Fm 4 0 R>>",
      Vector(formObj))).toOption.get
    val bmp = Rasterizer.render(doc.page(0))
    assert(bmp.get(25, 792 - 25) == 0xFF0000FF, "inside BBox painted")
    assert(bmp.get(75, 792 - 25) == 0xFFFFFFFF, "outside BBox clipped")
    // an outer W n clip must also cut the form's content
    val doc2 = PdfDocument.load(pageWith("q 0 0 25 792 re W n /Fm Do Q",
      "/XObject<</Fm 4 0 R>>", Vector(formObj))).toOption.get
    val bmp2 = Rasterizer.render(doc2.page(0))
    assert(bmp2.get(10, 792 - 25) == 0xFF0000FF, "inside outer clip")
    assert(bmp2.get(40, 792 - 25) == 0xFFFFFFFF, "outside outer clip, inside BBox")
  }

  test("render rotation: 90/180/270 remap the probe pixel; dims swap") {
    val content = "1 0 0 rg 100 600 50 30 re f" // interior device px (125,175)
    val doc = PdfDocument.load(SynthPdf.onePage(content)).toOption.get
    val r90 = Rasterizer.render(doc.page(0), rotation = 90)
    assert(r90.width == 792 && r90.height == 612)
    assert(r90.get(792 - 176, 125) == 0xFFFF0000, f"r90=${r90.get(792 - 176, 125)}%08x")
    val r180 = Rasterizer.render(doc.page(0), rotation = 180)
    assert(r180.width == 612 && r180.height == 792)
    assert(r180.get(612 - 126, 792 - 176) == 0xFFFF0000)
    val r270 = Rasterizer.render(doc.page(0), rotation = 270)
    assert(r270.width == 792 && r270.height == 612)
    assert(r270.get(175, 612 - 126) == 0xFFFF0000)
  }

  test("render crop and fill_color") {
    val content = "1 0 0 rg 100 600 50 30 re f"
    val doc = PdfDocument.load(SynthPdf.onePage(content)).toOption.get
    // crop exactly to the rect: (left, bottom, right, top) cuts per side
    val cropped = Rasterizer.render(doc.page(0), crop = (100, 600, 612 - 150, 792 - 630))
    assert(cropped.width == 50 && cropped.height == 30)
    assert(cropped.get(25, 15) == 0xFFFF0000)
    // custom backdrop color shows through unpainted pixels
    val green = Rasterizer.render(doc.page(0), fillColor = 0xFF00FF00)
    assert(green.get(5, 5) == 0xFF00FF00)
    assert(green.get(125, 175) == 0xFFFF0000)
  }

  test("color_tohex: reference test_misc.py:14-32 values") {
    assert(render.Bitmap.colorToHex(170, 187, 204, 221) == 0xDDAABBCC)
    assert(render.Bitmap.colorToHex(170, 187, 204, 221, revByteorder = true) == 0xDDCCBBAA)
    intercept[IllegalArgumentException] { render.Bitmap.colorToHex(256, 0, 0, 0) }
  }

  test("bitmap formats: BGRA/RGB/Gray byte layouts (bitmap.py analog)") {
    val bmp = new render.Bitmap(2, 1)
    bmp.set(0, 0, 0xFF112233); bmp.set(1, 0, 0xFFFFFFFF)
    val bgra = bmp.toBytes("BGRA")
    assert(bgra.take(4).toSeq == Seq(0x33.toByte, 0x22.toByte, 0x11.toByte, 0xFF.toByte))
    val rgb = bmp.toBytes("RGB")
    assert(rgb.take(3).toSeq == Seq(0x11.toByte, 0x22.toByte, 0x33.toByte))
    val gray = bmp.toBytes("Gray")
    assert((gray(1) & 0xff) == 0xff) // white stays white
    val l0 = gray(0) & 0xff          // BT.601 luma of 112233
    assert(math.abs(l0 - ((77 * 0x11 + 150 * 0x22 + 29 * 0x33) >> 8)) == 0)
    intercept[IllegalArgumentException] { bmp.toBytes("CMYK") }
  }

  test("rg after scn clears the stale pattern (§8.6.8)") {
    val pat = ("<</PatternType 2/Shading<</ShadingType 2/ColorSpace/DeviceRGB" +
      "/Coords[0 0 612 0]/Extend[true true]" +
      "/Function<</FunctionType 2/C0[0 0 0]/C1[1 1 1]/N 1>>>>>>").getBytes
    val content = "/Pattern cs /P1 scn 1 0 0 rg 100 600 50 30 re f"
    val doc = PdfDocument.load(pageWith(content, "/Pattern<</P1 4 0 R>>", Vector(pat))).toOption.get
    val bmp = Rasterizer.render(doc.page(0))
    assert(bmp.get(125, 175) == 0xFFFF0000, f"got ${bmp.get(125, 175)}%08x — stale pattern painted")
  }
}
