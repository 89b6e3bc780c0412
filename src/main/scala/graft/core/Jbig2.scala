package graft.core

/** JBIG2 (ITU-T T.88) decoder for the PDF `JBIG2Decode` filter
  * (PDF 32000-1 §7.4.7) — the embedded-stream organization: a sequence of
  * segments without file header, optionally preceded by a /JBIG2Globals
  * segment stream.
  *
  * Scope (documented, honest): pages composed of immediate GENERIC regions —
  * arithmetic-coded (MQ coder, templates 0-3, TPGDON, custom AT pixels) or
  * MMR-coded (delegated to the in-repo T.6 decoder, [[Ccitt]]) — the shape
  * simple scanners and `jbig2enc -generic` produce. Symbol-dictionary/text/
  * halftone/refinement segments are NOT decoded; encountering one throws and
  * the caller falls back to raw passthrough (reference behavior for
  * undecodable payloads, pageobjects.py:598-630).
  *
  * The MQ coder follows the T.88 Annex E flowcharts in their standard
  * software form (the same structure as the public jbig2dec/pdf.js/openjpeg
  * implementations); the Qe state table is transcribed from T.88 Table E.1.
  * Context formation per template matches T.88 §6.2.5.7 figures (bit order
  * identical to jbig2dec's generic-region path). An [[MQEncoder]] is
  * provided so specs and fixture synthesis can round-trip the coder without
  * external test data.
  *
  * Internal bitmap convention: 1 = black (JBIG2's own). [[decodeFilter]]
  * inverts to the PDF image-model polarity (0 = black for 1-bpc DeviceGray,
  * the same convention as the CCITT default) and packs rows MSB-first. */
object Jbig2 {

  // T.88 Table E.1: (Qe, NMPS, NLPS, SWITCH)
  private[core] val QeTable: Array[(Int, Int, Int, Int)] = Array(
    (0x5601, 1, 1, 1), (0x3401, 2, 6, 0), (0x1801, 3, 9, 0), (0x0AC1, 4, 12, 0),
    (0x0521, 5, 29, 0), (0x0221, 38, 33, 0), (0x5601, 7, 6, 1), (0x5401, 8, 14, 0),
    (0x4801, 9, 14, 0), (0x3801, 10, 14, 0), (0x3001, 11, 17, 0), (0x2401, 12, 18, 0),
    (0x1C01, 13, 20, 0), (0x1601, 29, 21, 0), (0x5601, 15, 14, 1), (0x5401, 16, 14, 0),
    (0x5101, 17, 15, 0), (0x4801, 18, 16, 0), (0x3801, 19, 17, 0), (0x3401, 20, 18, 0),
    (0x3001, 21, 19, 0), (0x2801, 22, 19, 0), (0x2401, 23, 20, 0), (0x2201, 24, 21, 0),
    (0x1C01, 25, 22, 0), (0x1801, 26, 23, 0), (0x1601, 27, 24, 0), (0x1401, 28, 25, 0),
    (0x1201, 29, 26, 0), (0x1101, 30, 27, 0), (0x0AC1, 31, 28, 0), (0x09C1, 32, 29, 0),
    (0x08A1, 33, 30, 0), (0x0521, 34, 31, 0), (0x0441, 35, 32, 0), (0x02A1, 36, 33, 0),
    (0x0221, 37, 34, 0), (0x0141, 38, 35, 0), (0x0111, 39, 36, 0), (0x0085, 40, 37, 0),
    (0x0049, 41, 38, 0), (0x0025, 42, 39, 0), (0x0015, 43, 40, 0), (0x0009, 44, 41, 0),
    (0x0005, 45, 42, 0), (0x0001, 45, 43, 0), (0x5601, 46, 46, 0))

  /** MQ arithmetic decoder (T.88 Annex E, INITDEC/DECODE/BYTEIN). Contexts
    * are caller-owned: `cx(i)` packs (state << 1) | mps. */
  final class MQDecoder(data: Array[Byte], start: Int, end: Int) {
    private var bp = start
    @inline private def byteAt(i: Int): Int = if (i < end) data(i) & 0xff else 0xff
    private var chigh = byteAt(start)
    private var clow = 0
    private var ct = 0
    private var a = 0
    byteIn()
    chigh = ((chigh << 7) & 0xffff) | ((clow >> 9) & 0x7f)
    clow = (clow << 7) & 0xffff
    ct -= 7
    a = 0x8000

    private def byteIn(): Unit = {
      if (byteAt(bp) == 0xff) {
        if (byteAt(bp + 1) > 0x8f) { clow += 0xff00; ct = 8 }
        else { bp += 1; clow += byteAt(bp) << 9; ct = 7 }
      } else {
        bp += 1
        clow += (if (bp < end) byteAt(bp) << 8 else 0xff00)
        ct = 8
      }
      if (clow > 0xffff) { chigh += clow >> 16; clow &= 0xffff }
    }

    def readBit(cx: Array[Short], pos: Int): Int = {
      var icx = cx(pos) >> 1
      var mps = cx(pos) & 1
      val (qe, nmps, nlps, sw) = QeTable(icx)
      var d = 0
      var aa = a - qe
      if (chigh < qe) {
        if (aa < qe) { aa = qe; d = mps; icx = nmps } // LPS exchange: MPS decoded
        else { aa = qe; d = 1 ^ mps; if (sw == 1) mps = d; icx = nlps }
      } else {
        chigh -= qe
        if ((aa & 0x8000) != 0) { a = aa; return mps }
        if (aa < qe) { d = 1 ^ mps; if (sw == 1) mps = d; icx = nlps }
        else { d = mps; icx = nmps }
      }
      while ({
        if (ct == 0) byteIn()
        aa <<= 1
        chigh = ((chigh << 1) & 0xffff) | ((clow >> 15) & 1)
        clow = (clow << 1) & 0xffff
        ct -= 1
        (aa & 0x8000) == 0
      }) ()
      a = aa
      cx(pos) = ((icx << 1) | mps).toShort
      d
    }
  }

  /** MQ arithmetic encoder (T.88 Annex E flowcharts, openjpeg-style
    * byteout/flush) — spec + fixture support: round-trips against
    * [[MQDecoder]] so the coder pair is validated without external vectors. */
  final class MQEncoder {
    private var a = 0x8000
    private var c = 0L
    private var ct = 12
    private val buf = new java.io.ByteArrayOutputStream()
    private var bLast = -1 // value of the last emitted byte (scratch = -1)

    private def byteOut(): Unit = {
      if (bLast == 0xff) {
        emit((c >> 20).toInt & 0xff); c &= 0xfffff; ct = 7
      } else if (c < 0x8000000L) {
        emit((c >> 19).toInt & 0xff); c &= 0x7ffff; ct = 8
      } else {
        // carry into the previous byte
        bumpLast()
        if (bLast == 0xff) { c &= 0x7ffffff; emit((c >> 20).toInt & 0xff); c &= 0xfffff; ct = 7 }
        else { emit((c >> 19).toInt & 0xff); c &= 0x7ffff; ct = 8 }
      }
    }
    private def emit(b: Int): Unit = { buf.write(b); bLast = b }
    private def bumpLast(): Unit = {
      val bytes = buf.toByteArray
      if (bytes.isEmpty) { bLast = 0 } // carry into the scratch byte: dropped
      else {
        bytes(bytes.length - 1) = (bytes(bytes.length - 1) + 1).toByte
        buf.reset(); buf.write(bytes, 0, bytes.length)
        bLast = bytes(bytes.length - 1) & 0xff
      }
    }

    def encodeBit(cx: Array[Short], pos: Int, d: Int): Unit = {
      var icx = cx(pos) >> 1
      var mps = cx(pos) & 1
      val (qe, nmps, nlps, sw) = QeTable(icx)
      if (d == mps) { // CODEMPS
        a -= qe
        if ((a & 0x8000) == 0) {
          if (a < qe) a = qe else c += qe
          icx = nmps
          renorm()
        } else c += qe
      } else { // CODELPS
        a -= qe
        if (a < qe) c += qe else a = qe
        if (sw == 1) mps = 1 - mps
        icx = nlps
        renorm()
      }
      cx(pos) = ((icx << 1) | mps).toShort
    }

    private def renorm(): Unit = {
      while ({
        if (ct == 0) byteOut()
        a <<= 1
        c <<= 1
        ct -= 1
        (a & 0x8000) == 0
      }) ()
    }

    /** FLUSH (T.88 E.3.8, SETBITS + two byteouts), returns the codestream. */
    def flush(): Array[Byte] = {
      val tempc = c + a
      c |= 0xffff
      if (c >= tempc) c -= 0x8000
      c <<= ct; byteOut()
      c <<= ct; byteOut()
      buf.toByteArray
    }
  }

  // ---- generic region (T.88 §6.2) -----------------------------------------

  /** SLTP (typical-prediction) context per template. */
  private val SltpCx = Array(0x9B25, 0x0795, 0x00E5, 0x0195)

  /** Nominal AT pixel positions per template (T.88 §6.2.5.3 defaults). */
  def nominalAt(template: Int): Array[(Int, Int)] = template match {
    case 0 => Array((3, -1), (-3, -1), (2, -2), (-2, -2))
    case 1 => Array((3, -1))
    case 2 => Array((2, -1))
    case _ => Array((2, -1))
  }

  /** Context for pixel (x,y) of `bm` (w×h bytes, 1 = black) under the given
    * template and AT pixels — bit order per the T.88 template figures
    * (identical to jbig2dec's generic path). Shared by decoder and encoder. */
  private def context(bm: Array[Byte], w: Int, h: Int, x: Int, y: Int,
                      template: Int, at: Array[(Int, Int)]): Int = {
    @inline def p(dx: Int, dy: Int): Int = {
      val xx = x + dx; val yy = y + dy
      if (xx < 0 || xx >= w || yy < 0 || yy >= h) 0 else bm(yy * w + xx)
    }
    @inline def pa(i: Int): Int = p(at(i)._1, at(i)._2)
    template match {
      case 0 =>
        p(-1, 0) | (p(-2, 0) << 1) | (p(-3, 0) << 2) | (p(-4, 0) << 3) |
          (pa(0) << 4) | (p(2, -1) << 5) | (p(1, -1) << 6) | (p(0, -1) << 7) |
          (p(-1, -1) << 8) | (p(-2, -1) << 9) | (pa(1) << 10) | (pa(2) << 11) |
          (p(1, -2) << 12) | (p(0, -2) << 13) | (p(-1, -2) << 14) | (pa(3) << 15)
      case 1 =>
        p(-1, 0) | (p(-2, 0) << 1) | (p(-3, 0) << 2) | (pa(0) << 3) |
          (p(2, -1) << 4) | (p(1, -1) << 5) | (p(0, -1) << 6) | (p(-1, -1) << 7) |
          (p(-2, -1) << 8) | (p(2, -2) << 9) | (p(1, -2) << 10) | (p(0, -2) << 11) |
          (p(-1, -2) << 12)
      case 2 =>
        p(-1, 0) | (p(-2, 0) << 1) | (pa(0) << 2) |
          (p(1, -1) << 3) | (p(0, -1) << 4) | (p(-1, -1) << 5) | (p(-2, -1) << 6) |
          (p(1, -2) << 7) | (p(0, -2) << 8) | (p(-1, -2) << 9)
      case _ =>
        p(-1, 0) | (p(-2, 0) << 1) | (p(-3, 0) << 2) | (p(-4, 0) << 3) |
          (pa(0) << 4) | (p(1, -1) << 5) | (p(0, -1) << 6) | (p(-1, -1) << 7) |
          (p(-2, -1) << 8) | (p(-3, -1) << 9)
    }
  }

  /** Decode an arithmetic generic region into a w×h byte bitmap (1=black). */
  def decodeGenericArith(mq: MQDecoder, w: Int, h: Int, template: Int,
                         at: Array[(Int, Int)], tpgdon: Boolean): Array[Byte] = {
    val bm = new Array[Byte](w * h)
    val cx = new Array[Short](1 << 16)
    var ltp = false
    var y = 0
    while (y < h) {
      if (tpgdon) {
        if (mq.readBit(cx, SltpCx(template)) == 1) ltp = !ltp
      }
      if (tpgdon && ltp) {
        if (y > 0) System.arraycopy(bm, (y - 1) * w, bm, y * w, w)
      } else {
        var x = 0
        while (x < w) {
          bm(y * w + x) = mq.readBit(cx, context(bm, w, h, x, y, template, at)).toByte
          x += 1
        }
      }
      y += 1
    }
    bm
  }

  /** Encode a w×h byte bitmap (1=black) as an arithmetic generic region —
    * fixture/spec support, no TPGDON. */
  def encodeGenericArith(bm: Array[Byte], w: Int, h: Int, template: Int = 0): Array[Byte] = {
    val enc = new MQEncoder
    val cx = new Array[Short](1 << 16)
    val at = nominalAt(template)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        enc.encodeBit(cx, context(bm, w, h, x, y, template, at), bm(y * w + x))
        x += 1
      }
      y += 1
    }
    enc.flush()
  }

  // ---- embedded segment stream (T.88 annex + PDF §7.4.7) -------------------

  private final case class Segment(num: Long, segType: Int, page: Long,
                                   data: Array[Byte])

  private def parseSegments(data: Array[Byte]): Vector[Segment] = {
    val out = Vector.newBuilder[Segment]
    var i = 0
    def u8(): Int = { val v = data(i) & 0xff; i += 1; v }
    def u16(): Int = { (u8() << 8) | u8() }
    def u32(): Long = { (u16().toLong << 16) | u16() }
    while (i + 11 <= data.length) {
      val num = u32()
      val flags = u8()
      val segType = flags & 0x3f
      val pageAssoc4 = (flags & 0x40) != 0
      val rts = u8()
      val refCount =
        if ((rts >> 5) == 7) {
          i -= 1
          val cnt = (u32() & 0x1fffffffL).toInt
          i += (cnt + 8) / 8 // retain bits
          cnt
        } else rts >> 5
      val refSize = if (num <= 256) 1 else if (num <= 65536) 2 else 4
      i += refCount * refSize
      val page = if (pageAssoc4) u32() else u8().toLong
      val len = u32()
      if (len == 0xffffffffL)
        throw new IllegalArgumentException("JBIG2: unknown segment length unsupported")
      val seg = Segment(num, segType, page, java.util.Arrays.copyOfRange(data, i, i + len.toInt))
      i += len.toInt
      out += seg
    }
    out.result()
  }

  /** Decode the embedded JBIG2 stream (+ optional globals) to a byte bitmap
    * (1=black) of the page. `imgW`/`imgH` are the PDF /Width / /Height —
    * authoritative for the output size (T.88 page info may carry 0xffffffff
    * height for striped pages). */
  def decode(embedded: Array[Byte], globals: Option[Array[Byte]],
             imgW: Int, imgH: Int): Array[Byte] = {
    val segs = globals.map(parseSegments).getOrElse(Vector.empty) ++ parseSegments(embedded)
    val page = new Array[Byte](imgW * imgH)
    var defaultPixel = 0
    segs.foreach { seg =>
      seg.segType match {
        case 48 => // page info: use default pixel value (flags bit 2)
          if (seg.data.length >= 17) {
            val flags = seg.data(16) & 0xff
            defaultPixel = (flags >> 2) & 1
            if (defaultPixel == 1) java.util.Arrays.fill(page, 1.toByte)
          }
        case 36 | 38 | 39 => // generic region (intermediate or immediate)
          val d = seg.data
          var i = 0
          def u32(): Long = {
            val v = ((d(i) & 0xffL) << 24) | ((d(i + 1) & 0xffL) << 16) |
              ((d(i + 2) & 0xffL) << 8) | (d(i + 3) & 0xffL)
            i += 4; v
          }
          val rw = u32().toInt; val rh = u32().toInt
          val rx = u32().toInt; val ry = u32().toInt
          val combOp = d(i) & 0x7; i += 1
          val gFlags = d(i) & 0xff; i += 1
          val mmr = (gFlags & 1) != 0
          val template = (gFlags >> 1) & 3
          val tpgdon = (gFlags & 8) != 0
          val at: Array[(Int, Int)] =
            if (mmr) Array.empty
            else {
              val n = if (template == 0) 4 else 1
              Array.fill(n) { val ax = d(i).toInt; val ay = d(i + 1).toInt; i += 2; (ax, ay) }
            }
          val bm: Array[Byte] =
            if (mmr) {
              // MMR = pure T.6 two-dimensional coding (K<0), no EOL;
              // blackIs1=true makes the packed rows carry JBIG2's own
              // 1=black polarity, unpacked below into the byte bitmap
              val packed = Ccitt.decode(d.drop(i), rw, rh, -1,
                blackIs1 = true, encodedByteAlign = false)
              val out = new Array[Byte](rw * rh)
              var y = 0
              while (y < rh) {
                val rowOff = y * ((rw + 7) / 8)
                var x = 0
                while (x < rw) {
                  out(y * rw + x) = ((packed(rowOff + (x >> 3)) >> (7 - (x & 7))) & 1).toByte
                  x += 1
                }
                y += 1
              }
              out
            } else {
              val mq = new MQDecoder(d, i, d.length)
              decodeGenericArith(mq, rw, rh, template, at, tpgdon)
            }
          // compose onto the page (region bounds clipped to image bounds)
          var y = 0
          while (y < rh) {
            val py = ry + y
            if (py >= 0 && py < imgH) {
              var x = 0
              while (x < rw) {
                val px = rx + x
                if (px >= 0 && px < imgW) {
                  val v = bm(y * rw + x)
                  val o = py * imgW + px
                  page(o) = (combOp match {
                    case 0 => page(o) | v // OR
                    case 1 => page(o) & v // AND
                    case 2 => page(o) ^ v // XOR
                    case 3 => (page(o) ^ v) ^ 1 // XNOR
                    case _ => v // REPLACE
                  }).toByte
                }
                x += 1
              }
            }
            y += 1
          }
        case 0 | 4 | 5 | 6 | 7 | 16 | 20 | 22 | 23 | 40 | 41 | 42 | 43 =>
          throw new IllegalArgumentException(
            s"JBIG2: segment type ${seg.segType} (symbol/text/halftone/refinement) not supported")
        case _ => () // page default window, end-of-page/file, extensions: skip
      }
    }
    page
  }

  /** PDF JBIG2Decode filter: decode and return packed 1-bpp rows, MSB-first,
    * 0 = black — the PDF image-model polarity for 1-bpc DeviceGray (the
    * JBIG2-internal 1=black is inverted here, as every PDF viewer does). */
  def decodeFilter(embedded: Array[Byte], globals: Option[Array[Byte]],
                   imgW: Int, imgH: Int): Array[Byte] = {
    val bm = decode(embedded, globals, imgW, imgH)
    val stride = (imgW + 7) / 8
    val out = new Array[Byte](stride * imgH)
    var y = 0
    while (y < imgH) {
      var x = 0
      while (x < imgW) {
        if (bm(y * imgW + x) == 0) // white → bit 1 (0 = black)
          out(y * stride + (x >> 3)) = (out(y * stride + (x >> 3)) | (0x80 >> (x & 7))).toByte
        x += 1
      }
      y += 1
    }
    out
  }

  /** Build the embedded-stream bytes for a single generic-region page —
    * fixture synthesis for specs/queries (page info + immediate lossless
    * generic region, template 0, nominal AT, MQ-coded). */
  def encodeEmbedded(bm: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def u32(v: Long): Unit = { u16((v >> 16).toInt); u16(v.toInt) }
    def header(num: Long, segType: Int, dataLen: Int): Unit = {
      u32(num); u8(segType); u8(0) /* no referred segments */ ; u8(1) /* page 1 */
      u32(dataLen.toLong)
    }
    // page info (type 48): W H Xres Yres flags striping
    header(0, 48, 19)
    u32(w.toLong); u32(h.toLong); u32(0); u32(0); u8(0); u16(0)
    // immediate lossless generic region (type 39)
    val mqData = encodeGenericArith(bm, w, h, template = 0)
    val at = nominalAt(0)
    header(1, 39, 17 + 1 + at.length * 2 + mqData.length)
    u32(w.toLong); u32(h.toLong); u32(0); u32(0); u8(0) // region info, OR
    u8(0) // generic flags: MMR=0, template 0, TPGDON=0
    at.foreach { case (ax, ay) => u8(ax); u8(ay) }
    out.write(mqData)
    // end of page (type 49)
    header(2, 49, 0)
    out.toByteArray
  }
}
