package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** JBIG2 refinement coding (T.88 §6.3 generic refinement; §6.5.8.2 REFAGG
  * symbol dictionaries; §6.4.11 SBREFINE text instances; §7.4.7 immediate
  * refinement regions over the page buffer). Expected pages are computed
  * by direct stamping of the known bitmaps — decode must match exactly. */
class Jbig2RefinementSpec extends AnyFunSuite {

  private def box(w: Int, h: Int): Array[Byte] = {
    val bm = new Array[Byte](w * h)
    for (x <- 0 until w) { bm(x) = 1; bm((h - 1) * w + x) = 1 }
    for (y <- 0 until h) { bm(y * w) = 1; bm(y * w + w - 1) = 1 }
    bm
  }

  test("GRR core: encode/decode round trip, both templates, with and without offset") {
    val rnd = new scala.util.Random(41)
    for (template <- Seq(0, 1); (dx, dy) <- Seq((0, 0), (2, -1))) {
      val w = 23; val h = 17
      val ref = Array.fill[Byte](w * h)(if (rnd.nextInt(3) == 0) 1 else 0)
      // target = reference with sparse flips (the realistic refinement shape)
      val bm = ref.clone()
      (0 until 25).foreach(_ => {
        val k = rnd.nextInt(bm.length); bm(k) = (1 - bm(k)).toByte
      })
      val at: Array[(Int, Int)] = Array((-1, -1), (-1, -1))
      val enc = new Jbig2.MQEncoder
      val cxe = new Array[Short](1 << 13)
      Jbig2.encodeRefinementInto(enc, cxe, bm, w, h, template, at, ref, w, h, dx, dy)
      val data = enc.flush()
      val mq = new Jbig2.MQDecoder(data, 0, data.length)
      val got = Jbig2.decodeRefinementArith(mq, w, h, template, at, tpgron = false,
        ref, w, h, dx, dy)
      assert(java.util.Arrays.equals(got, bm), s"template=$template offset=($dx,$dy)")
    }
  }

  test("immediate refinement region refines the page buffer in place (type 42)") {
    val w = 32; val h = 24
    val base = box(w, h)
    val refined = base.clone()
    for (x <- 8 until 24) refined((h / 2) * w + x) = 1 // add a mid bar
    refined(0) = 0 // and knock out a corner pixel
    val emb = Jbig2.encodeEmbeddedPageRefinement(base, refined, w, h)
    val got = Jbig2.decode(emb, None, w, h)
    assert(java.util.Arrays.equals(got, refined))
  }

  test("REFAGG symbol dict + SBREFINE text region: refined symbols and instances place exactly") {
    val w0 = 10; val h0 = 8
    val sym0 = (w0, h0, box(w0, h0))
    // dict symbol 1: a wider refinement of symbol 0 (box + center dot)
    val w1 = 12
    val ref1 = {
      val bm = new Array[Byte](w1 * h0)
      for (x <- 0 until w1) { bm(x) = 1; bm((h0 - 1) * w1 + x) = 1 }
      for (y <- 0 until h0) { bm(y * w1) = 1; bm(y * w1 + w1 - 1) = 1 }
      bm((h0 / 2) * w1 + w1 / 2) = 1
      bm
    }
    val sym1 = (w1, h0, ref1)
    // a refined text INSTANCE of symbol 0: grown by (+2, +2), filled border
    val rdw = 2; val rdh = 2
    val inst = {
      val w2 = w0 + rdw; val h2 = h0 + rdh
      (w2, h2, box(w2, h2))
    }
    val places = Seq(
      (0, 2, 2, None), // plain symbol 0
      (1, 18, 2, None), // the REFAGG-decoded dict symbol
      (0, 2, 16, Some((inst, rdw, rdh)))) // per-instance refinement
    val pw = 40; val ph = 30
    val emb = Jbig2.encodeEmbeddedRefined(sym0, sym1, places, pw, ph)
    val got = Jbig2.decode(emb, None, pw, ph)
    val exp = new Array[Byte](pw * ph)
    def stamp(s: (Int, Int, Array[Byte]), x0: Int, y0: Int): Unit = {
      val (sw, sh, sb) = s
      for (yy <- 0 until sh; xx <- 0 until sw if sb(yy * sw + xx) == 1) {
        val px = x0 + xx; val py = y0 + yy
        if (px >= 0 && px < pw && py >= 0 && py < ph) exp(py * pw + px) = 1
      }
    }
    stamp(sym0, 2, 2)
    stamp(sym1, 18, 2)
    stamp(inst, 2, 16)
    assert(java.util.Arrays.equals(got, exp))
  }

  test("mutated refinement streams fail cleanly, bounded time") {
    val w = 32; val h = 24
    val base = box(w, h)
    val refined = base.clone(); refined(5) = 1
    val emb = Jbig2.encodeEmbeddedPageRefinement(base, refined, w, h)
    val rnd = new scala.util.Random(17)
    (0 until 60).foreach { k =>
      val m = emb.clone()
      if (k % 3 == 0) {
        val cut = 12 + rnd.nextInt(math.max(1, emb.length - 12))
        // wall-clock bound is generous because the full suite runs these
        // decodes alongside 32 busy Spark threads — the bound exists to
        // catch unbounded loops (minutes), not scheduler noise (seconds)
        val t0 = System.nanoTime()
        try { Jbig2.decode(java.util.Arrays.copyOf(m, cut), None, w, h); () }
        catch { case _: Exception => () }
        assert((System.nanoTime() - t0) / 1000000 < 20000)
      } else {
        (0 until 3).foreach(_ => m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte)
        val t0 = System.nanoTime()
        try { Jbig2.decode(m, None, w, h); () }
        catch { case _: Exception => () }
        assert((System.nanoTime() - t0) / 1000000 < 20000)
      }
    }
  }
}
