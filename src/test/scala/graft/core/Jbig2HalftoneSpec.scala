package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** JBIG2 halftone pages (T.88 §6.6 halftone region + §6.7 pattern
  * dictionary, Annex C gray-code bitplanes). The expected page is computed
  * directly from the gray grid and pattern bitmaps — the decode must match
  * stamp-for-stamp. */
class Jbig2HalftoneSpec extends AnyFunSuite {

  /** 4 density patterns 6×6: 0, ~33%, ~66%, solid. */
  private def densityPatterns(): Vector[Jbig2.Sym] = {
    val w = 6; val h = 6
    Vector.tabulate(4) { level =>
      val bm = new Array[Byte](w * h)
      var k = 0
      while (k < bm.length) {
        bm(k) = (if (level == 3) 1 else if (level > 0 && k % 4 < level) 1 else 0).toByte
        k += 1
      }
      (w, h, bm)
    }
  }

  private def expectedPage(patterns: Vector[Jbig2.Sym], grays: Array[Int],
                           hgw: Int, hgh: Int, pw: Int, ph: Int): Array[Byte] = {
    val (sw, sh, _) = patterns.head
    val exp = new Array[Byte](pw * ph)
    for (mg <- 0 until hgh; ng <- 0 until hgw) {
      val (_, _, pb) = patterns(grays(mg * hgw + ng))
      val x0 = ng * sw; val y0 = mg * sh
      for (yy <- 0 until sh; xx <- 0 until sw if pb(yy * sw + xx) == 1) {
        val px = x0 + xx; val py = y0 + yy
        if (px < pw && py < ph) exp(py * pw + px) = 1
      }
    }
    exp
  }

  test("halftone page round trip: 2-bit gray grid stamps the right patterns") {
    val patterns = densityPatterns()
    val hgw = 8; val hgh = 6
    // a gradient of gray values exercises both bitplanes and the gray-code XOR
    val grays = Array.tabulate(hgw * hgh)(k => (k % hgw) * 4 / hgw)
    val pw = hgw * 6; val ph = hgh * 6
    val emb = Jbig2.encodeEmbeddedHalftone(patterns, grays, hgw, hgh, pw, ph)
    val got = Jbig2.decode(emb, None, pw, ph)
    val exp = expectedPage(patterns, grays, hgw, hgh, pw, ph)
    assert(java.util.Arrays.equals(got, exp))
    assert(got.exists(_ == 1) && got.exists(_ == 0), "page should be mixed ink")
  }

  test("single-bit gray (2 patterns) and non-power-of-two pattern counts") {
    val two = densityPatterns().take(2)
    val hgw = 5; val hgh = 5
    val grays = Array.tabulate(hgw * hgh)(k => k % 2)
    val emb = Jbig2.encodeEmbeddedHalftone(two, grays, hgw, hgh, 30, 30)
    val got = Jbig2.decode(emb, None, 30, 30)
    assert(java.util.Arrays.equals(got, expectedPage(two, grays, hgw, hgh, 30, 30)))
    // 3 patterns → bpp 2 with an unused code point
    val three = densityPatterns().take(3)
    val grays3 = Array.tabulate(hgw * hgh)(k => k % 3)
    val emb3 = Jbig2.encodeEmbeddedHalftone(three, grays3, hgw, hgh, 30, 30)
    assert(java.util.Arrays.equals(Jbig2.decode(emb3, None, 30, 30),
      expectedPage(three, grays3, hgw, hgh, 30, 30)))
  }

  test("MMR-coded gray planes decode identically to the arithmetic coding") {
    val patterns = densityPatterns()
    val hgw = 8; val hgh = 6
    val grays = Array.tabulate(hgw * hgh)(k => (k % hgw) * 4 / hgw)
    val pw = hgw * 6; val ph = hgh * 6
    val arith = Jbig2.decode(
      Jbig2.encodeEmbeddedHalftone(patterns, grays, hgw, hgh, pw, ph), None, pw, ph)
    val mmr = Jbig2.decode(
      Jbig2.encodeEmbeddedHalftone(patterns, grays, hgw, hgh, pw, ph, mmrGray = true), None, pw, ph)
    assert(java.util.Arrays.equals(arith, mmr))
    assert(java.util.Arrays.equals(mmr, expectedPage(patterns, grays, hgw, hgh, pw, ph)))
  }

  test("halftone through the PDF filter path") {
    val patterns = densityPatterns()
    val hgw = 4; val hgh = 4
    val grays = Array.tabulate(hgw * hgh)(k => k % 4)
    val emb = Jbig2.encodeEmbeddedHalftone(patterns, grays, hgw, hgh, 24, 24)
    val packed = Jbig2.decodeFilter(emb, None, 24, 24)
    assert(packed.length == 3 * 24) // (24+7)/8 * 24
    // cell (3,0) is the solid pattern → pixel (18,0) black → bit 0
    assert(((packed(0 * 3 + 2) >> (7 - 2)) & 1) == 0)
    // cell (0,0) is the empty pattern → pixel (0,0) white → bit 1
    assert(((packed(0) >> 7) & 1) == 1)
  }

  test("mutated halftone streams fail cleanly, bounded time") {
    val patterns = densityPatterns()
    val grays = Array.tabulate(16)(k => k % 4)
    val emb = Jbig2.encodeEmbeddedHalftone(patterns, grays, 4, 4, 24, 24)
    val rnd = new scala.util.Random(23)
    (0 until 60).foreach { k =>
      val m = emb.clone()
      if (k % 3 == 0) {
        val cut = 12 + rnd.nextInt(math.max(1, emb.length - 12))
        val t0 = System.nanoTime()
        try { Jbig2.decode(java.util.Arrays.copyOf(m, cut), None, 24, 24); () }
        catch { case _: Exception => () }
        assert((System.nanoTime() - t0) / 1000000 < 20000)
      } else {
        (0 until 3).foreach(_ => m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte)
        val t0 = System.nanoTime()
        try { Jbig2.decode(m, None, 24, 24); () }
        catch { case _: Exception => () }
        assert((System.nanoTime() - t0) / 1000000 < 20000)
      }
    }
  }
}
