package graft.core

/** CCITT Group 3/4 fax decoder (ITU-T T.4 / T.6), the `CCITTFaxDecode`
  * filter (PDF 32000-1 §7.4.6). Implements:
  *  - K < 0: pure two-dimensional MMR (Group 4) — the PDF-generator norm;
  *  - K = 0: one-dimensional MH rows;
  *  - K > 0: mixed mode (per-row 1D/2D tag bit after EOL).
  * Supports Columns/Rows/BlackIs1/EncodedByteAlign/EndOfLine DecodeParms.
  *
  * Output is packed 1 bpp, MSB-first, rows padded to byte boundaries.
  * Per the PDF default (BlackIs1=false) black pixels decode to 0 bits.
  *
  * The run-length Huffman tables are transcribed from the public T.4
  * standard (terminating + makeup + shared extended makeup codes). The
  * reference reaches this codec through PDFium's fax module; this is an
  * independent implementation against the standard. */
object Ccitt {

  // (runLength, bitCount, code) — T.4 tables
  private val whiteCodes: Array[(Int, Int, Int)] = Array(
    (0, 8, 0x35), (1, 6, 0x07), (2, 4, 0x07), (3, 4, 0x08), (4, 4, 0x0B),
    (5, 4, 0x0C), (6, 4, 0x0E), (7, 4, 0x0F), (8, 5, 0x13), (9, 5, 0x14),
    (10, 5, 0x07), (11, 5, 0x08), (12, 6, 0x08), (13, 6, 0x03), (14, 6, 0x34),
    (15, 6, 0x35), (16, 6, 0x2A), (17, 6, 0x2B), (18, 7, 0x27), (19, 7, 0x0C),
    (20, 7, 0x08), (21, 7, 0x17), (22, 7, 0x03), (23, 7, 0x04), (24, 7, 0x28),
    (25, 7, 0x2B), (26, 7, 0x13), (27, 7, 0x24), (28, 7, 0x18), (29, 8, 0x02),
    (30, 8, 0x03), (31, 8, 0x1A), (32, 8, 0x1B), (33, 8, 0x12), (34, 8, 0x13),
    (35, 8, 0x14), (36, 8, 0x15), (37, 8, 0x16), (38, 8, 0x17), (39, 8, 0x28),
    (40, 8, 0x29), (41, 8, 0x2A), (42, 8, 0x2B), (43, 8, 0x2C), (44, 8, 0x2D),
    (45, 8, 0x04), (46, 8, 0x05), (47, 8, 0x0A), (48, 8, 0x0B), (49, 8, 0x52),
    (50, 8, 0x53), (51, 8, 0x54), (52, 8, 0x55), (53, 8, 0x24), (54, 8, 0x25),
    (55, 8, 0x58), (56, 8, 0x59), (57, 8, 0x5A), (58, 8, 0x5B), (59, 8, 0x4A),
    (60, 8, 0x4B), (61, 8, 0x32), (62, 8, 0x33), (63, 8, 0x34),
    // makeup
    (64, 5, 0x1B), (128, 5, 0x12), (192, 6, 0x17), (256, 7, 0x37),
    (320, 8, 0x36), (384, 8, 0x37), (448, 8, 0x64), (512, 8, 0x65),
    (576, 8, 0x68), (640, 8, 0x67), (704, 9, 0xCC), (768, 9, 0xCD),
    (832, 9, 0xD2), (896, 9, 0xD3), (960, 9, 0xD4), (1024, 9, 0xD5),
    (1088, 9, 0xD6), (1152, 9, 0xD7), (1216, 9, 0xD8), (1280, 9, 0xD9),
    (1344, 9, 0xDA), (1408, 9, 0xDB), (1472, 9, 0x98), (1536, 9, 0x99),
    (1600, 9, 0x9A), (1664, 6, 0x18), (1728, 9, 0x9B))

  private val blackCodes: Array[(Int, Int, Int)] = Array(
    (0, 10, 0x37), (1, 3, 0x02), (2, 2, 0x03), (3, 2, 0x02), (4, 3, 0x03),
    (5, 4, 0x03), (6, 4, 0x02), (7, 5, 0x03), (8, 6, 0x05), (9, 6, 0x04),
    (10, 7, 0x04), (11, 7, 0x05), (12, 7, 0x07), (13, 8, 0x04), (14, 8, 0x07),
    (15, 9, 0x18), (16, 10, 0x17), (17, 10, 0x18), (18, 10, 0x08),
    (19, 11, 0x67), (20, 11, 0x68), (21, 11, 0x6C), (22, 11, 0x37),
    (23, 11, 0x28), (24, 11, 0x17), (25, 11, 0x18), (26, 12, 0xCA),
    (27, 12, 0xCB), (28, 12, 0xCC), (29, 12, 0xCD), (30, 12, 0x68),
    (31, 12, 0x69), (32, 12, 0x6A), (33, 12, 0x6B), (34, 12, 0xD2),
    (35, 12, 0xD3), (36, 12, 0xD4), (37, 12, 0xD5), (38, 12, 0xD6),
    (39, 12, 0xD7), (40, 12, 0x6C), (41, 12, 0x6D), (42, 12, 0xDA),
    (43, 12, 0xDB), (44, 12, 0x54), (45, 12, 0x55), (46, 12, 0x56),
    (47, 12, 0x57), (48, 12, 0x64), (49, 12, 0x65), (50, 12, 0x52),
    (51, 12, 0x53), (52, 12, 0x24), (53, 12, 0x37), (54, 12, 0x38),
    (55, 12, 0x27), (56, 12, 0x28), (57, 12, 0x58), (58, 12, 0x59),
    (59, 12, 0x2B), (60, 12, 0x2C), (61, 12, 0x5A), (62, 12, 0x66),
    (63, 12, 0x67),
    // makeup
    (64, 10, 0x0F), (128, 12, 0xC8), (192, 12, 0xC9), (256, 12, 0x5B),
    (320, 12, 0x33), (384, 12, 0x34), (448, 12, 0x35), (512, 13, 0x6C),
    (576, 13, 0x6D), (640, 13, 0x4A), (704, 13, 0x4B), (768, 13, 0x4C),
    (832, 13, 0x4D), (896, 13, 0x72), (960, 13, 0x73), (1024, 13, 0x74),
    (1088, 13, 0x75), (1152, 13, 0x76), (1216, 13, 0x77), (1280, 13, 0x52),
    (1344, 13, 0x53), (1408, 13, 0x54), (1472, 13, 0x55), (1536, 13, 0x5A),
    (1600, 13, 0x5B), (1664, 13, 0x64), (1728, 13, 0x65))

  // extended makeup, shared between colors (T.4 §4.1)
  private val extCodes: Array[(Int, Int, Int)] = Array(
    (1792, 11, 0x08), (1856, 11, 0x0C), (1920, 11, 0x0D), (1984, 12, 0x12),
    (2048, 12, 0x13), (2112, 12, 0x14), (2176, 12, 0x15), (2240, 12, 0x16),
    (2304, 12, 0x17), (2368, 12, 0x1C), (2432, 12, 0x1D), (2496, 12, 0x1E),
    (2560, 12, 0x1F))

  /** Decode lookup: (bits, code) → runLength, via per-color maps keyed by
    * (len << 16 | code). */
  private def buildMap(codes: Array[(Int, Int, Int)]): java.util.HashMap[Int, Int] = {
    val m = new java.util.HashMap[Int, Int]()
    (codes ++ extCodes).foreach { case (run, len, code) => m.put((len << 16) | code, run) }
    m
  }
  private val whiteMap = buildMap(whiteCodes)
  private val blackMap = buildMap(blackCodes)
  // encode lookup (used by the spec round-trip; cheap to keep here)
  private[core] def encodeTableFor(white: Boolean): Array[(Int, Int, Int)] =
    (if (white) whiteCodes else blackCodes) ++ extCodes

  final class BitReader(data: Array[Byte]) {
    var bitPos: Int = 0
    def atEnd: Boolean = bitPos >= data.length * 8
    def remaining: Int = data.length * 8 - bitPos
    def peek(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val p = bitPos + i
        val bit =
          if (p < data.length * 8) (data(p >> 3) >> (7 - (p & 7))) & 1
          else 0
        v = (v << 1) | bit
        i += 1
      }
      v
    }
    def skip(n: Int): Unit = bitPos += n
    def alignByte(): Unit = if ((bitPos & 7) != 0) bitPos = (bitPos | 7) + 1
  }

  private def readRun(br: BitReader, white: Boolean): Int = {
    // runs >= 64 use one or more makeup codes followed by a terminating code
    var total = 0
    var terminated = false
    while (!terminated) {
      val m = if (white) whiteMap else blackMap
      var len = if (white) 4 else 2
      var run = -1
      var found = false
      while (!found && len <= 13) {
        val key = (len << 16) | br.peek(len)
        if (m.containsKey(key)) { // run 0 is a valid code — test presence, not value
          run = m.get(key)
          br.skip(len)
          found = true
        } else len += 1
      }
      if (!found) throw new java.io.IOException(s"ccitt: bad ${if (white) "white" else "black"} run code @bit ${br.bitPos}")
      total += run
      if (run < 64) terminated = true // terminating code ends the run
    }
    total
  }

  /** Decode one G4/2D-coded row given the reference row's changing elements.
    * `ref` holds transition positions (color flips) of the reference line,
    * terminated by two sentinels = columns. Returns this row's transitions. */
  private def decode2DRow(br: BitReader, ref: Array[Int], refLen: Int,
                          columns: Int): (Array[Int], Int) = {
    val cur = new Array[Int](columns + 2)
    var curLen = 0
    var a0 = -1
    var white = true // color of the run starting at a0
    while (a0 < columns) {
      // locate b1: first ref transition > a0 whose "new color" is opposite
      // of `white`'s run (i.e. transition index parity matches color)
      var bi = 0
      while (bi < refLen && (ref(bi) <= a0 || ((bi & 1) == 0) != white)) bi += 1
      // note: even transition index = white→black flip (rows start white)
      val b1 = if (bi < refLen) ref(bi) else columns
      val b2 = if (bi + 1 < refLen) ref(bi + 1) else columns

      // mode codes
      if (br.peek(1) == 1) { // V0
        br.skip(1)
        cur(curLen) = b1; curLen += 1
        a0 = b1; white = !white
      } else if (br.peek(3) == 1) { // 001 horizontal
        br.skip(3)
        val s = if (a0 < 0) 0 else a0
        val r1 = readRun(br, white)
        val r2 = readRun(br, !white)
        val a1 = math.min(s + r1, columns)
        val a2 = math.min(a1 + r2, columns)
        cur(curLen) = a1; curLen += 1
        cur(curLen) = a2; curLen += 1
        a0 = a2 // color unchanged
      } else if (br.peek(4) == 1) { // 0001 pass
        br.skip(4)
        a0 = b2 // color unchanged, no transition recorded
      } else if (br.peek(3) == 3) { // 011 VR1
        br.skip(3); val a1 = math.min(b1 + 1, columns)
        cur(curLen) = a1; curLen += 1; a0 = a1; white = !white
      } else if (br.peek(3) == 2) { // 010 VL1
        br.skip(3); val a1 = math.max(b1 - 1, 0)
        cur(curLen) = a1; curLen += 1; a0 = a1; white = !white
      } else if (br.peek(6) == 3) { // 000011 VR2
        br.skip(6); val a1 = math.min(b1 + 2, columns)
        cur(curLen) = a1; curLen += 1; a0 = a1; white = !white
      } else if (br.peek(6) == 2) { // 000010 VL2
        br.skip(6); val a1 = math.max(b1 - 2, 0)
        cur(curLen) = a1; curLen += 1; a0 = a1; white = !white
      } else if (br.peek(7) == 3) { // 0000011 VR3
        br.skip(7); val a1 = math.min(b1 + 3, columns)
        cur(curLen) = a1; curLen += 1; a0 = a1; white = !white
      } else if (br.peek(7) == 2) { // 0000010 VL3
        br.skip(7); val a1 = math.max(b1 - 3, 0)
        cur(curLen) = a1; curLen += 1; a0 = a1; white = !white
      } else if (br.peek(12) == 1 || br.peek(12) == 0 || br.remaining < 12) {
        // EOL / EOFB, zero fill, or exhausted input → end of data (no valid
        // mode code has 12 leading zeros; EOL is eleven zeros + 1)
        return (cur, -1)
      } else {
        throw new java.io.IOException(s"ccitt: bad 2D mode code @bit ${br.bitPos}")
      }
      if (curLen > columns + 1)
        throw new java.io.IOException("ccitt: transition overflow (corrupt row)")
    }
    (cur, curLen)
  }

  /** Decode one MH (1D) row. Returns the row's transitions. */
  private def decode1DRow(br: BitReader, columns: Int): (Array[Int], Int) = {
    val cur = new Array[Int](columns + 2)
    var curLen = 0
    var pos = 0
    var white = true
    while (pos < columns) {
      if (br.remaining < 2) return (cur, if (pos == 0) -1 else curLen)
      val run = readRun(br, white)
      pos = math.min(pos + run, columns)
      cur(curLen) = pos; curLen += 1
      white = !white
    }
    (cur, curLen)
  }

  /** Full decode → packed 1bpp rows (MSB first). `rows <= 0` means decode
    * until the data ends (EOFB or exhaustion). */
  def decode(data: Array[Byte], columns: Int, rows: Int, k: Int,
             blackIs1: Boolean, encodedByteAlign: Boolean): Array[Byte] = {
    val br = new BitReader(data)
    val rowBytes = (columns + 7) / 8
    val out = new java.io.ByteArrayOutputStream()
    // reference line starts as an imaginary all-white row (no transitions)
    var ref = new Array[Int](columns + 2)
    var refLen = 0
    var rowCount = 0
    var done = false
    while (!done && (rows <= 0 || rowCount < rows) && !br.atEnd) {
      if (encodedByteAlign) br.alignByte()
      // skip EOL codes (000000000001), with optional 2D tag bit for K>0
      var is2D = k < 0
      while (br.remaining >= 12 && br.peek(12) == 1) {
        br.skip(12)
        if (k > 0 && br.remaining >= 1) { is2D = br.peek(1) == 0; br.skip(1) }
      }
      if (br.remaining < 2) done = true
      else {
        val (cur, curLen) =
          if (k < 0 || (k > 0 && is2D)) decode2DRow(br, ref, refLen, columns)
          else decode1DRow(br, columns)
        if (curLen < 0) done = true
        else {
          // render transitions → packed bits (1 = black internally)
          val rowBuf = new Array[Byte](rowBytes)
          var i = 0
          var pos = 0
          var white = true
          while (i <= curLen) {
            val end = if (i < curLen) cur(i) else columns
            if (!white) {
              var p = pos
              while (p < end) { rowBuf(p >> 3) = (rowBuf(p >> 3) | (0x80 >> (p & 7))).toByte; p += 1 }
            }
            pos = end
            white = !white
            i += 1
          }
          if (!blackIs1) { // PDF default: black = 0 → invert
            var bi = 0
            while (bi < rowBytes) { rowBuf(bi) = (~rowBuf(bi)).toByte; bi += 1 }
          }
          // zero the pad bits beyond `columns` for determinism
          if ((columns & 7) != 0)
            rowBuf(rowBytes - 1) = (rowBuf(rowBytes - 1) & (0xff << (8 - (columns & 7)))).toByte
          out.write(rowBuf)
          ref = cur
          refLen = if (curLen >= 0) curLen else 0
          rowCount += 1
        }
      }
    }
    out.toByteArray
  }

  /** DecodeParms-driven entry (PDF §7.4.6). */
  def decodeFilter(data: Array[Byte], parms: PdfDict, resolve: PdfObject => PdfObject): Array[Byte] = {
    def int(key: String, dflt: Int): Int = resolve(parms(key)) match {
      case PdfNumber(v) => v.toInt; case _ => dflt
    }
    def bool(key: String, dflt: Boolean): Boolean = resolve(parms(key)) match {
      case PdfBool(b) => b; case _ => dflt
    }
    decode(data,
      columns = int("Columns", 1728),
      rows = int("Rows", 0),
      k = int("K", 0),
      blackIs1 = bool("BlackIs1", dflt = false),
      encodedByteAlign = bool("EncodedByteAlign", dflt = false))
  }
}
