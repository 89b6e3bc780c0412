package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** JBIG2 MQ coder + generic region + embedded-stream coverage, and JPX
  * header parsing. The MQ pair is validated by round trip (encoder and
  * decoder are independent transcriptions of the T.88 Annex E flowcharts;
  * agreement over adversarial bit sequences exercises every table path),
  * plus structural invariants that don't depend on the encoder. */
class Jbig2Spec extends AnyFunSuite {

  private def deterministicBits(n: Int): Array[Int] = {
    // mixed-bias stream: long MPS runs, alternations, bursts — walks the
    // state machine through NMPS/NLPS/SWITCH transitions
    var x = 0x12345678L
    Array.tabulate(n) { i =>
      x = x * 6364136223846793005L + 1442695040888963407L
      if (i % 97 < 60) 0 else ((x >>> 33) & 1).toInt
    }
  }

  test("MQ coder round trip: single context, 10k mixed-bias bits") {
    val bits = deterministicBits(10000)
    val enc = new Jbig2.MQEncoder
    val cxe = new Array[Short](1)
    bits.foreach(b => enc.encodeBit(cxe, 0, b))
    val data = enc.flush()
    val dec = new Jbig2.MQDecoder(data, 0, data.length)
    val cxd = new Array[Short](1)
    bits.zipWithIndex.foreach { case (b, i) =>
      assert(dec.readBit(cxd, 0) == b, s"bit $i differs")
    }
  }

  test("MQ coder round trip: many contexts (generic-region shaped)") {
    val bits = deterministicBits(5000)
    val enc = new Jbig2.MQEncoder
    val cxe = new Array[Short](1 << 16)
    bits.zipWithIndex.foreach { case (b, i) => enc.encodeBit(cxe, (i * 131) & 0xffff, b) }
    val data = enc.flush()
    val dec = new Jbig2.MQDecoder(data, 0, data.length)
    val cxd = new Array[Short](1 << 16)
    bits.zipWithIndex.foreach { case (b, i) =>
      assert(dec.readBit(cxd, (i * 131) & 0xffff) == b, s"bit $i differs")
    }
  }

  private def checkerboard(w: Int, h: Int): Array[Byte] =
    Array.tabulate(w * h)(i => (((i % w) / 4 + (i / w) / 4) % 2).toByte)

  private def textLike(w: Int, h: Int): Array[Byte] = {
    // sparse strokes — the statistics JBIG2 generic templates are tuned for
    val bm = new Array[Byte](w * h)
    for (y <- 8 until h - 8 by 12; x <- 4 until w - 4)
      bm(y * w + x) = 1
    for (x <- 10 until w - 10 by 16; y <- 4 until h - 4)
      bm(y * w + x) = 1
    bm
  }

  test("generic region round trip: checkerboard and text-like bitmaps, all templates") {
    for (tmpl <- 0 to 3; bm <- Seq(checkerboard(48, 40), textLike(64, 52))) {
      val w = if (bm.length == 48 * 40) 48 else 64
      val h = bm.length / w
      val data = Jbig2.encodeGenericArith(bm, w, h, tmpl)
      val dec = Jbig2.decodeGenericArith(
        new Jbig2.MQDecoder(data, 0, data.length), w, h, tmpl, Jbig2.nominalAt(tmpl), tpgdon = false)
      assert(java.util.Arrays.equals(dec, bm), s"template $tmpl mismatch")
    }
  }

  test("embedded stream: page info + immediate generic region + EOP decodes to the source bitmap") {
    val w = 72; val h = 56
    val bm = textLike(w, h)
    val emb = Jbig2.encodeEmbedded(bm, w, h)
    val dec = Jbig2.decode(emb, None, w, h)
    assert(java.util.Arrays.equals(dec, bm))
    // filter polarity: PDF output has 0 = black
    val packed = Jbig2.decodeFilter(emb, None, w, h)
    assert(packed.length == ((w + 7) / 8) * h)
    val x0y8 = (packed(8 * ((w + 7) / 8) + 0) >> (7 - 4)) & 1 // (4,8) is a stroke pixel
    assert(bm(8 * w + 4) == 1 && x0y8 == 0, "black must pack as 0")
  }

  test("symbol/text segments are rejected, not silently mangled") {
    // embedded stream with a text-region segment type (4)
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int) = out.write(v & 0xff)
    def u32(v: Long) = { u8((v >> 24).toInt); u8((v >> 16).toInt); u8((v >> 8).toInt); u8(v.toInt) }
    u32(0); u8(4); u8(0); u8(1); u32(2); u8(0); u8(0)
    intercept[IllegalArgumentException] { Jbig2.decode(out.toByteArray, None, 8, 8) }
  }

  test("JPX header: raw codestream and JP2 container both yield dims") {
    val jp2 = Jpx.synthHeaderOnly(640, 480, components = 3, bpc = 8)
    assert(Jpx.parseHeader(jp2).contains(Jpx.JpxInfo(640, 480, 3, 8)))
    // raw codestream = the jp2c payload: find SOC and parse from there
    val socIdx = jp2.indices.find(i =>
      (jp2(i) & 0xff) == 0xff && (jp2(i + 1) & 0xff) == 0x4f).get
    val raw = java.util.Arrays.copyOfRange(jp2, socIdx, jp2.length)
    assert(Jpx.parseHeader(raw).contains(Jpx.JpxInfo(640, 480, 3, 8)))
    assert(Jpx.parseHeader(Array.fill[Byte](32)(0x41)).isEmpty)
  }
}
