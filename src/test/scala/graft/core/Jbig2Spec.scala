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

  test("intermediate segments skip silently; truncated regions throw, never mangle") {
    def seg(segType: Int, payload: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def u8(v: Int) = out.write(v & 0xff)
      def u32(v: Long) = { u8((v >> 24).toInt); u8((v >> 16).toInt); u8((v >> 8).toInt); u8(v.toInt) }
      u32(0); u8(segType); u8(0); u8(1); u32(payload.length.toLong)
      out.write(payload); out.toByteArray
    }
    // intermediate refinement region (type 40): input to a later segment,
    // skipped without painting — must NOT throw
    assert(Jbig2.decode(seg(40, Array[Byte](0, 0)), None, 8, 8).forall(_ == 0))
    intercept[Exception] {
      Jbig2.decode(seg(42, Array[Byte](0, 0)), None, 8, 8) // truncated refinement region
    }
    intercept[Exception] {
      Jbig2.decode(seg(22, Array[Byte](0, 0)), None, 8, 8) // truncated halftone region
    }
    intercept[Exception] {
      Jbig2.decode(seg(6, Array[Byte](0, 0)), None, 8, 8) // truncated text region
    }
  }

  test("arithmetic integer coder round trip: all value classes, negatives, OOB") {
    val values = Seq(0, 1, 3, 4, 19, 20, 83, 84, 339, 340, 4435, 4436, 100000,
      -1, -4, -20, -84, -340, -4436, -99999, Jbig2.OOB, 7, -7, 0, Jbig2.OOB, 42)
    val enc = new Jbig2.MQEncoder
    val cxe = new Array[Short](512)
    values.foreach(v => Jbig2.encodeInt(enc, cxe, v))
    val data = enc.flush()
    val dec = new Jbig2.MQDecoder(data, 0, data.length)
    val cxd = new Array[Short](512)
    values.zipWithIndex.foreach { case (v, i) =>
      assert(Jbig2.decodeInt(dec, cxd) == v, s"value $i ($v) differs")
    }
  }

  test("IAID coder round trip") {
    val ids = Seq(0, 1, 2, 3, 7, 5, 0, 6)
    val enc = new Jbig2.MQEncoder
    val cxe = new Array[Short](1 << 4)
    ids.foreach(id => Jbig2.encodeIaid(enc, cxe, 3, id))
    val data = enc.flush()
    val dec = new Jbig2.MQDecoder(data, 0, data.length)
    val cxd = new Array[Short](1 << 4)
    ids.foreach(id => assert(Jbig2.decodeIaid(dec, cxd, 3) == id))
  }

  test("symbol dictionary + text region: symbols decode and place exactly") {
    // two 12×10 glyph-ish symbols: a solid-bordered box and a cross
    val w = 12; val h = 10
    val box = new Array[Byte](w * h)
    for (x <- 0 until w) { box(x) = 1; box((h - 1) * w + x) = 1 }
    for (y <- 0 until h) { box(y * w) = 1; box(y * w + w - 1) = 1 }
    val cross = new Array[Byte](w * h)
    for (x <- 0 until w) cross((h / 2) * w + x) = 1
    for (y <- 0 until h) cross(y * w + w / 2) = 1
    val syms = Vector((w, h, box), (w, h, cross))
    // place: box at (4,3), cross at (30,3) same strip, box at (10,25)
    val placements = Seq((0, 4, 3), (1, 30, 3), (0, 10, 25))
    val pw = 64; val ph = 48
    val emb = Jbig2.encodeEmbeddedText(syms, placements, pw, ph)
    val got = Jbig2.decode(emb, None, pw, ph)
    // reference composition computed directly
    val exp = new Array[Byte](pw * ph)
    placements.foreach { case (id, x0, y0) =>
      val (sw, sh, sb) = syms(id)
      for (yy <- 0 until sh; xx <- 0 until sw if sb(yy * sw + xx) == 1)
        exp((y0 + yy) * pw + (x0 + xx)) = 1
    }
    assert(java.util.Arrays.equals(got, exp))
  }

  test("symbol stream via PDF filter: decodes through the image path") {
    val w = 12; val h = 10
    val bar = new Array[Byte](w * h)
    for (y <- 2 until 8; x <- 2 until 10) bar(y * w + x) = 1
    val emb = Jbig2.encodeEmbeddedText(Vector((w, h, bar)), Seq((0, 6, 6)), 32, 24)
    val packed = Jbig2.decodeFilter(emb, None, 32, 24)
    // (8,8) inside the placed bar → black → bit 0; (0,0) white → 1
    val stride = 4
    assert(((packed(8 * stride + 1) >> (7 - 0)) & 1) == 0) // x=8 → byte 1 bit 0
    assert(((packed(0) >> 7) & 1) == 1)
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
