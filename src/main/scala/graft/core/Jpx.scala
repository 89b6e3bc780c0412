package graft.core

/** JPEG-2000 (`JPXDecode`) HEADER parsing — dimensions, component count and
  * bit depth from either a raw codestream (SOC+SIZ, ITU-T T.800 §A.5.1) or a
  * JP2 container (ISO base-media boxes down to `jp2c`). Pixel decoding
  * lives in [[JpxCodec]] (baseline Part-1 path); this header surface stays
  * the cheap geometry probe for reports and for payloads outside the
  * decoder's scope, which pass through byte-identical (the reference's own
  * fallback shape for exotic codecs, pageobjects.py:598-630). */
object Jpx {

  final case class JpxInfo(width: Int, height: Int, components: Int, bpc: Int)

  /** Parse dims from raw-codestream or JP2-container payloads. */
  def parseHeader(data: Array[Byte]): Option[JpxInfo] = {
    if (data.length >= 4 && (data(0) & 0xff) == 0xff && (data(1) & 0xff) == 0x4f)
      parseCodestream(data, 0)
    else if (data.length >= 12 && u32(data, 0) == 12L && u32(data, 4) == 0x6a502020L)
      parseBoxes(data)
    else None
  }

  @inline private def u16(d: Array[Byte], i: Int): Int =
    ((d(i) & 0xff) << 8) | (d(i + 1) & 0xff)
  @inline private def u32(d: Array[Byte], i: Int): Long =
    ((d(i) & 0xffL) << 24) | ((d(i + 1) & 0xffL) << 16) | ((d(i + 2) & 0xffL) << 8) | (d(i + 3) & 0xffL)

  /** SOC (FF4F) then SIZ (FF51): grid minus offsets = image size. */
  private def parseCodestream(d: Array[Byte], start: Int): Option[JpxInfo] = {
    var i = start + 2 // past SOC
    while (i + 4 <= d.length) {
      if ((d(i) & 0xff) != 0xff) return None
      val marker = d(i + 1) & 0xff
      if (marker == 0x51) { // SIZ
        if (i + 40 > d.length) return None
        val xsiz = u32(d, i + 6); val ysiz = u32(d, i + 10)
        val xo = u32(d, i + 14); val yo = u32(d, i + 18)
        val csiz = u16(d, i + 38)
        val bpc = if (i + 40 + 1 <= d.length) (d(i + 40) & 0x7f) + 1 else 8
        return Some(JpxInfo((xsiz - xo).toInt, (ysiz - yo).toInt, csiz, bpc))
      }
      val len = u16(d, i + 2)
      i += 2 + len
    }
    None
  }

  /** Walk JP2 boxes: prefer the `jp2c` codestream's SIZ (authoritative),
    * fall back to the `jp2h`/`ihdr` header box. */
  private def parseBoxes(d: Array[Byte]): Option[JpxInfo] = {
    var ihdr: Option[JpxInfo] = None
    var i = 0
    while (i + 8 <= d.length) {
      var len = u32(d, i)
      val boxType = u32(d, i + 4)
      var payload = i + 8
      if (len == 1L && i + 16 <= d.length) { // 64-bit extended length
        val xl = u32(d, i + 8) // high word must be 0 for in-memory payloads
        len = if (xl == 0L) u32(d, i + 12) else return ihdr
        payload = i + 16
      } else if (len == 0L) len = d.length - i // box runs to EOF
      boxType match {
        case 0x6a703263L => // jp2c
          if (payload + 2 <= d.length && (d(payload) & 0xff) == 0xff && (d(payload + 1) & 0xff) == 0x4f)
            return parseCodestream(d, payload).orElse(ihdr)
        case 0x6a703268L => // jp2h superbox: scan inside for ihdr
          var j = payload
          val boxEnd = math.min(d.length, i + len.toInt)
          while (j + 8 <= boxEnd) {
            val slen = u32(d, j); val stype = u32(d, j + 4)
            if (stype == 0x69686472L && j + 22 <= d.length) { // ihdr
              val h = u32(d, j + 8).toInt; val w = u32(d, j + 12).toInt
              val nc = u16(d, j + 16)
              val bpc = (d(j + 18) & 0x7f) + 1
              ihdr = Some(JpxInfo(w, h, nc, bpc))
            }
            j += math.max(8L, slen).toInt
          }
        case _ => ()
      }
      i += math.max(8L, len).toInt
    }
    ihdr
  }

  /** Minimal JP2 container with a header-only codestream (SOC+SIZ) — the
    * fixture for header-parse coverage; not a renderable image. */
  def synthHeaderOnly(w: Int, h: Int, components: Int = 3, bpc: Int = 8): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def w32(v: Long): Unit = { w16((v >> 16).toInt); w16(v.toInt) }
    // signature box
    w32(12); w32(0x6a502020L); w32(0x0d0a870aL)
    // ftyp box
    w32(20); w32(0x66747970L); w32(0x6a703220L); w32(0); w32(0x6a703220L)
    // jp2h + ihdr
    w32(8 + 22); w32(0x6a703268L)
    w32(22); w32(0x69686472L); w32(h.toLong); w32(w.toLong); w16(components); u8(bpc - 1); u8(7); u8(0); u8(0)
    // jp2c: SOC + SIZ only
    val sizLen = 38 + 3 * components
    w32(8 + 2 + 2 + sizLen); w32(0x6a703263L)
    u8(0xff); u8(0x4f) // SOC
    u8(0xff); u8(0x51); w16(sizLen) // SIZ, Lsiz
    w16(0) // Rsiz
    w32(w.toLong); w32(h.toLong); w32(0); w32(0) // grid, offsets
    w32(w.toLong); w32(h.toLong); w32(0); w32(0) // tiles
    w16(components)
    (0 until components).foreach { _ => u8(bpc - 1); u8(1); u8(1) }
    out.toByteArray
  }
}
