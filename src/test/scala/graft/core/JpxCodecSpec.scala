package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** JPEG 2000 codec (T.800). The lossless 5/3 round trip is the load-bearing
  * check: encode → decode must reproduce every sample EXACTLY, which jointly
  * exercises tag trees, packet headers, the T1 three-pass MQ coder, the
  * multi-level 5/3 DWT and the RCT. Context tables are additionally pinned
  * by hand-derived values from T.800 Tables D.1/D.3 so a mirrored
  * encoder/decoder bug in the tables cannot hide. */
class JpxCodecSpec extends AnyFunSuite {

  test("5/3 DWT: forward then inverse is the identity on random signals") {
    val rnd = new scala.util.Random(3)
    for (n <- Seq(1, 2, 3, 4, 5, 8, 13, 64, 65)) {
      val a = Array.fill(n)(rnd.nextInt(4096) - 2048)
      val b = a.clone()
      JpxCodec.fd53(b, 0, 1, n)
      JpxCodec.sr53(b, 0, 1, n)
      assert(b.toSeq == a.toSeq, s"n=$n")
    }
  }

  test("significance context table pins (T.800 Table D.1, hand-derived)") {
    // LL/LH orientation (0 and 2): h-driven
    assert(JpxCodec.sigCtx(0, 2, 0, 0) == 8)
    assert(JpxCodec.sigCtx(0, 1, 1, 0) == 7)
    assert(JpxCodec.sigCtx(0, 1, 0, 1) == 6)
    assert(JpxCodec.sigCtx(0, 1, 0, 0) == 5)
    assert(JpxCodec.sigCtx(0, 0, 2, 0) == 4)
    assert(JpxCodec.sigCtx(0, 0, 1, 0) == 3)
    assert(JpxCodec.sigCtx(0, 0, 0, 2) == 2)
    assert(JpxCodec.sigCtx(0, 0, 0, 1) == 1)
    assert(JpxCodec.sigCtx(0, 0, 0, 0) == 0)
    // HL (1): h and v swapped
    assert(JpxCodec.sigCtx(1, 0, 2, 0) == 8)
    assert(JpxCodec.sigCtx(1, 1, 0, 0) == 3)
    assert(JpxCodec.sigCtx(1, 0, 1, 1) == 6)
    // HH (3): diagonal-driven
    assert(JpxCodec.sigCtx(3, 0, 0, 3) == 8)
    assert(JpxCodec.sigCtx(3, 1, 0, 2) == 7)
    assert(JpxCodec.sigCtx(3, 0, 0, 2) == 6)
    assert(JpxCodec.sigCtx(3, 2, 0, 1) == 5)
    assert(JpxCodec.sigCtx(3, 1, 0, 1) == 4)
    assert(JpxCodec.sigCtx(3, 0, 0, 1) == 3)
    assert(JpxCodec.sigCtx(3, 2, 0, 0) == 2)
    assert(JpxCodec.sigCtx(3, 1, 0, 0) == 1)
    assert(JpxCodec.sigCtx(3, 0, 0, 0) == 0)
  }

  test("sign context table pins (T.800 Table D.3)") {
    assert(JpxCodec.signCtx(1, 1) == ((13, 0)))
    assert(JpxCodec.signCtx(0, 0) == ((9, 0)))
    assert(JpxCodec.signCtx(0, -1) == ((10, 1)))
    assert(JpxCodec.signCtx(-1, -1) == ((13, 1)))
    assert(JpxCodec.signCtx(-1, 0) == ((12, 1)))
  }

  private def randImage(w: Int, h: Int, bpc: Int, seed: Int): Array[Int] = {
    val rnd = new scala.util.Random(seed)
    // mix of smooth gradient + noise + flat patches: exercises RL mode,
    // refinement and multi-plane significance
    Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      val v = (x * 3 + y * 5) % (1 << bpc)
      if (rnd.nextInt(4) == 0) rnd.nextInt(1 << bpc)
      else if (rnd.nextInt(5) == 0) 0
      else v
    }
  }

  test("lossless gray round trip: exact sample recovery across sizes/levels") {
    for (((w, h), lv) <- Seq(((16, 16), 1), ((37, 23), 2), ((64, 64), 3), ((65, 33), 2),
      ((5, 5), 1), ((1, 7), 1), ((100, 41), 3))) {
      val img = randImage(w, h, 8, w * 1000 + h)
      val cs = JpxCodec.encodeLossless(Array(img), w, h, bpc = 8, levels = lv, useRct = false)
      val dec = JpxCodec.decode(cs)
      assert(dec.width == w && dec.height == h && dec.components == 1)
      assert(dec.samples(0).toSeq == img.toSeq, s"${w}x$h levels=$lv")
    }
  }

  test("lossless RGB + RCT round trip: exact recovery") {
    val w = 48; val h = 31
    val comps = Array.tabulate(3)(c => randImage(w, h, 8, 77 + c))
    val cs = JpxCodec.encodeLossless(comps, w, h, bpc = 8, levels = 2, useRct = true)
    val dec = JpxCodec.decode(cs)
    assert(dec.components == 3)
    (0 until 3).foreach(c => assert(dec.samples(c).toSeq == comps(c).toSeq, s"component $c"))
  }

  test("small code blocks force deep tag trees; still exact") {
    val w = 70; val h = 50
    val img = randImage(w, h, 8, 5)
    val cs = JpxCodec.encodeLossless(Array(img), w, h, bpc = 8, levels = 2,
      useRct = false, cbExp = 3) // 8×8 blocks → 9×7 grid at res max
    val dec = JpxCodec.decode(cs)
    assert(dec.samples(0).toSeq == img.toSeq)
  }

  test("16-bit depth round trip") {
    val w = 20; val h = 20
    val rnd = new scala.util.Random(9)
    val img = Array.fill(w * h)(rnd.nextInt(1 << 12))
    val cs = JpxCodec.encodeLossless(Array(img), w, h, bpc = 12, levels = 2, useRct = false)
    val dec = JpxCodec.decode(cs)
    assert(dec.bpc == 12)
    assert(dec.samples(0).toSeq == img.toSeq)
  }

  test("JP2 container wrapping decodes the same as the raw codestream") {
    val w = 24; val h = 16
    val img = randImage(w, h, 8, 11)
    val raw = JpxCodec.encodeLossless(Array(img), w, h, bpc = 8, levels = 1, useRct = false)
    // wrap in minimal JP2 boxes (signature + ftyp + jp2c)
    val out = new java.io.ByteArrayOutputStream()
    def w32(v: Long): Unit = { out.write((v >> 24).toInt); out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt) }
    w32(12); w32(0x6a502020L); w32(0x0d0a870aL)
    w32(20); w32(0x66747970L); w32(0x6a703220L); w32(0); w32(0x6a703220L)
    w32(8L + raw.length); w32(0x6a703263L); out.write(raw)
    val dec = JpxCodec.decode(out.toByteArray)
    assert(dec.samples(0).toSeq == img.toSeq)
  }

  test("fuzz: mutated codestreams fail cleanly within bounded time") {
    val w = 32; val h = 24
    val img = randImage(w, h, 8, 13)
    val cs = JpxCodec.encodeLossless(Array(img), w, h, bpc = 8, levels = 2, useRct = false)
    val rnd = new scala.util.Random(99)
    (0 until 80).foreach { k =>
      val m = cs.clone()
      if (k % 3 == 0) {
        val cut = 4 + rnd.nextInt(cs.length - 4)
        val t0 = System.nanoTime()
        try { JpxCodec.decode(java.util.Arrays.copyOf(m, cut)); () }
        catch { case _: Exception => () }
        assert((System.nanoTime() - t0) / 1000000 < 20000, s"truncate $k slow")
      } else {
        (0 until 3).foreach(_ => m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte)
        val t0 = System.nanoTime()
        try { JpxCodec.decode(m); () }
        catch { case _: Exception => () }
        assert((System.nanoTime() - t0) / 1000000 < 20000, s"mutate $k slow")
      }
    }
  }

  test("end-to-end PDF path: JPX image extracts as PNG with the exact source pixels and renders real ink") {
    val w = 48; val h = 32
    val pat = SynthPdf.jpxPattern(w, h)
    val doc = PdfDocument.load(SynthPdf.jpxDecodePdf(w, h)).toOption.get
    val img = ImageExtract.pageImages(doc.page(0)).head
    assert(img.format == "png")
    val bi = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(img.data))
    assert(bi.getWidth == w && bi.getHeight == h)
    for (i <- Seq(0, w * h / 2, w * h - 1)) {
      val exp = 0xFF000000 | (pat(0)(i) << 16) | (pat(1)(i) << 8) | pat(2)(i)
      assert(bi.getRGB(i % w, i / w) == exp, s"pixel $i")
    }
    // rasterizer draws the decoded pixels, not the gray fallback: the
    // top-left pattern pixel is (r=0, g=0, b=230) — nothing like 0x808080
    val bmp = graft.core.render.Rasterizer.render(doc.page(0), scale = 1.0)
    val tl = bmp.get(0, bmp.height - 1) // PDF y-up: image row 0 at top
    val anyPatternColor = (0 until bmp.width).exists { x =>
      val p = bmp.get(x, bmp.height / 2)
      p != 0xFF808080 && p != 0xFFFFFFFF
    }
    assert(anyPatternColor, f"row pixels look like placeholder/background (tl=$tl%08x)")
    // header-only fixture still falls back to passthrough
    val doc2 = PdfDocument.load(SynthPdf.jpxPdf(64, 48)).toOption.get
    assert(ImageExtract.pageImages(doc2.page(0)).head.format == "jp2")
  }

  test("adversarial headers rejected before allocation") {
    // giant SIZ dims must throw the size guard, not allocate
    val w = 24; val h = 16
    val cs = JpxCodec.encodeLossless(Array(randImage(w, h, 8, 1)), w, h, bpc = 8, levels = 1, useRct = false)
    // Xsiz at offset 2(SOC) + 4(marker+len) + 2(Rsiz) = 8
    val m = cs.clone()
    m(8) = 0x7f.toByte; m(9) = 0xff.toByte; m(10) = 0xff.toByte; m(11) = 0xff.toByte
    assertThrows[IllegalArgumentException](JpxCodec.decode(m))
  }
}
