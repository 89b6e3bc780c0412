package graft.core

/** JBIG2 Huffman coding support (ITU-T T.88 Annex B) for the pre-arithmetic
  * scanner shape: standard tables B.1-B.15, the §B.3 canonical prefix-code
  * assignment, custom table segments (type 53, §B.2), and the MSB-first bit
  * I/O both the decoder and the fixture encoder share.
  *
  * Table data is transcribed from the T.88 Annex B tables. Two structural
  * invariants validate the transcription in Jbig2HuffmanSpec without
  * external vectors: (1) each table's ranges tile the value space without
  * gap or overlap (low(i+1) = low(i) + 2^rangeLen(i)), which pins RANGELOW
  * and RANGELEN jointly; (2) the canonical assignment yields a prefix-free
  * code with Kraft sum ≤ 1 (equal to 1 for every table except B.10, which
  * is incomplete in the spec), which pins PREFLEN. The reference reaches
  * this machinery through PDFium's JBIG2 module (pdfium_setup.md toolchain;
  * behavior surface pageobjects.py:473-498 image extraction). */
object Jbig2Huffman {

  /** MSB-first bit reader over `data[start, end)`. Reads past the end
    * throw — a truncated Huffman stream must fail fast, not loop. */
  final class BitReader(data: Array[Byte], start: Int, end: Int) {
    private var pos = start
    private var bitPos = 0
    def bit(): Int = {
      if (pos >= end) throw new IllegalArgumentException("JBIG2: Huffman stream exhausted")
      val b = (data(pos) >> (7 - bitPos)) & 1
      bitPos += 1
      if (bitPos == 8) { bitPos = 0; pos += 1 }
      b
    }
    def bits(n: Int): Long = {
      var v = 0L; var k = 0
      while (k < n) { v = (v << 1) | bit(); k += 1 }
      v
    }
    def byteAlign(): Unit = if (bitPos != 0) { bitPos = 0; pos += 1 }
    /** Byte offset (only meaningful when byte-aligned). */
    def bytePos: Int = pos
    def skipBytes(n: Int): Unit = {
      require(bitPos == 0, "skipBytes requires byte alignment")
      pos += n
      if (pos > end) throw new IllegalArgumentException("JBIG2: Huffman stream exhausted")
    }
    def remaining: Int = end - pos
  }

  /** MSB-first bit writer (fixture/spec encoder side). */
  final class BitWriter {
    private val buf = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nBits = 0
    def bit(b: Int): Unit = {
      cur = (cur << 1) | (b & 1)
      nBits += 1
      if (nBits == 8) { buf.write(cur); cur = 0; nBits = 0 }
    }
    def bits(v: Long, n: Int): Unit = {
      var k = n - 1
      while (k >= 0) { bit(((v >>> k) & 1L).toInt); k -= 1 }
    }
    def byteAlign(): Unit = while (nBits != 0) bit(0)
    def writeBytes(bs: Array[Byte]): Unit = { byteAlign(); buf.write(bs) }
    def toBytes: Array[Byte] = { byteAlign(); buf.toByteArray }
  }

  /** One table line. kind: 0 = normal range, 1 = lower range (value =
    * rangeLow − 32-bit offset), 2 = OOB. prefLen 0 = line unused (custom
    * tables may leave lower/upper/OOB codeless). */
  final case class Line(prefLen: Int, rangeLen: Int, rangeLow: Int, kind: Int = 0)

  /** §B.3 canonical prefix-code assignment over (index → codeLength):
    * returns (len, code) → index. Shared by tables and the text-region
    * symbol-ID code (§6.4.5.1). */
  def assignCanonical(lengths: IndexedSeq[Int]): Map[(Int, Int), Int] = {
    if (lengths.forall(_ == 0)) return Map.empty
    val maxLen = lengths.max
    require(maxLen <= 32, "JBIG2: Huffman code length > 32")
    val counts = new Array[Int](maxLen + 1)
    lengths.foreach(l => if (l > 0) counts(l) += 1)
    val next = new Array[Int](maxLen + 2)
    var len = 1
    while (len <= maxLen) { next(len) = (next(len - 1) + counts(len - 1)) << 1; len += 1 }
    val out = Map.newBuilder[(Int, Int), Int]
    var i = 0
    while (i < lengths.length) {
      val l = lengths(i)
      if (l > 0) {
        val code = next(l); next(l) += 1
        if (code >= (1 << l))
          throw new IllegalArgumentException("JBIG2: Huffman code overflow (Kraft > 1)")
        out += ((l, code) -> i)
      }
      i += 1
    }
    out.result()
  }

  /** A decodable Huffman table: lines + canonically assigned prefix codes. */
  final class Table(val lines: Vector[Line]) {
    private val byLenCode: Map[(Int, Int), Int] = assignCanonical(lines.map(_.prefLen))
    val maxPrefLen: Int = if (lines.isEmpty) 0 else lines.map(_.prefLen).max

    private def decodeLine(r: BitReader): Line = {
      var code = 0; var len = 0
      while (len < maxPrefLen) {
        code = (code << 1) | r.bit(); len += 1
        byLenCode.get((len, code)) match {
          case Some(idx) => return lines(idx)
          case None => ()
        }
      }
      throw new IllegalArgumentException("JBIG2: invalid Huffman prefix")
    }

    /** Decode one value; OOB lines yield [[Jbig2.OOB]]. */
    def decode(r: BitReader): Int = {
      val l = decodeLine(r)
      if (l.kind == 2) Jbig2.OOB
      else {
        val off = r.bits(l.rangeLen)
        val v = if (l.kind == 1) l.rangeLow.toLong - off else l.rangeLow.toLong + off
        if (v < Int.MinValue.toLong + 1 || v > Int.MaxValue.toLong)
          throw new IllegalArgumentException("JBIG2: Huffman value out of range")
        v.toInt
      }
    }

    // ---- encoder side (fixtures/specs; round-trips the decoder) ----------
    private val codeOf: Map[Int, Int] = byLenCode.map { case ((_, c), idx) => idx -> c }
    def encode(w: BitWriter, value: Int): Unit = {
      // pick the FIRST normal line whose range holds the value, else
      // lower/upper extension lines
      var i = 0
      while (i < lines.length) {
        val l = lines(i)
        if (l.prefLen > 0 && l.kind == 0) {
          val span = if (l.rangeLen >= 32) Long.MaxValue else 1L << l.rangeLen
          val lo = l.rangeLow.toLong
          if (value >= lo && value - lo < span) {
            w.bits(codeOf(i).toLong, l.prefLen)
            w.bits(value - lo, l.rangeLen)
            return
          }
        }
        i += 1
      }
      i = 0
      while (i < lines.length) { // lower-range line
        val l = lines(i)
        if (l.prefLen > 0 && l.kind == 1 && value <= l.rangeLow) {
          w.bits(codeOf(i).toLong, l.prefLen)
          w.bits(l.rangeLow.toLong - value, 32)
          return
        }
        i += 1
      }
      throw new IllegalArgumentException(s"JBIG2: value $value not encodable by table")
    }
    def encodeOob(w: BitWriter): Unit = {
      val i = lines.indexWhere(l => l.kind == 2 && l.prefLen > 0)
      require(i >= 0, "table has no OOB code")
      w.bits(codeOf(i).toLong, lines(i).prefLen)
    }
  }

  private def t(ls: (Int, Int, Int)*): Vector[Line] =
    ls.toVector.map { case (p, r, lo) => Line(p, r, lo) }
  private def lower(p: Int, lo: Int) = Line(p, 32, lo, kind = 1)
  private def upper(p: Int, lo: Int) = Line(p, 32, lo, kind = 0)
  private def oob(p: Int) = Line(p, 0, 0, kind = 2)

  /** T.88 Annex B standard tables, 1-based (B.1 … B.15). */
  val standardTables: Vector[Table] = Vector(
    // B.1 (A)
    new Table(t((1, 4, 0), (2, 8, 16), (3, 16, 272)) :+ upper(3, 65808)),
    // B.2 (B)
    new Table(t((1, 0, 0), (2, 0, 1), (3, 0, 2), (4, 3, 3), (5, 6, 11)) ++
      Vector(upper(6, 75), oob(6))),
    // B.3 (C)
    new Table(t((8, 8, -256), (1, 0, 0), (2, 0, 1), (3, 0, 2), (4, 3, 3), (5, 6, 11)) ++
      Vector(lower(8, -257), upper(7, 75), oob(6))),
    // B.4 (D)
    new Table(t((1, 0, 1), (2, 0, 2), (3, 0, 3), (4, 3, 4), (5, 6, 12)) :+ upper(5, 76)),
    // B.5 (E)
    new Table(t((7, 8, -255), (1, 0, 1), (2, 0, 2), (3, 0, 3), (4, 3, 4), (5, 6, 12)) ++
      Vector(lower(7, -256), upper(6, 76))),
    // B.6 (F)
    new Table(t((5, 10, -2048), (4, 9, -1024), (4, 8, -512), (4, 7, -256), (5, 6, -128),
      (5, 5, -64), (4, 5, -32), (2, 7, 0), (3, 7, 128), (3, 8, 256), (4, 9, 512),
      (4, 10, 1024)) ++ Vector(lower(6, -2049), upper(6, 2048))),
    // B.7 (G)
    new Table(t((4, 9, -1024), (3, 8, -512), (4, 7, -256), (5, 6, -128), (5, 5, -64),
      (4, 5, -32), (4, 5, 0), (5, 5, 32), (5, 6, 64), (4, 7, 128), (3, 8, 256),
      (3, 9, 512), (3, 10, 1024)) ++ Vector(lower(5, -1025), upper(5, 2048))),
    // B.8 (H)
    new Table(t((8, 3, -15), (9, 1, -7), (8, 1, -5), (9, 0, -3), (7, 0, -2), (4, 0, -1),
      (2, 1, 0), (5, 0, 2), (6, 0, 3), (3, 4, 4), (6, 1, 20), (4, 4, 22), (4, 5, 38),
      (5, 6, 70), (5, 7, 134), (6, 7, 262), (7, 8, 390), (6, 10, 646)) ++
      Vector(lower(9, -16), upper(9, 1670), oob(2))),
    // B.9 (I)
    new Table(t((8, 4, -31), (9, 2, -15), (8, 2, -11), (9, 1, -7), (7, 1, -5), (4, 1, -3),
      (3, 1, -1), (3, 1, 1), (5, 1, 3), (6, 1, 5), (3, 5, 7), (6, 2, 39), (4, 5, 43),
      (4, 6, 75), (5, 7, 139), (5, 8, 267), (6, 8, 523), (7, 9, 779), (6, 11, 1291)) ++
      Vector(lower(9, -32), upper(9, 3339), oob(2))),
    // B.10 (J) — the one spec table whose code is not complete (Kraft < 1)
    new Table(t((7, 4, -21), (8, 0, -5), (7, 0, -4), (5, 0, -3), (2, 2, -2), (5, 0, 2),
      (6, 0, 3), (7, 0, 4), (8, 0, 5), (2, 6, 6), (5, 5, 70), (6, 5, 102), (7, 6, 134),
      (8, 7, 198), (9, 8, 326), (9, 9, 582), (9, 10, 1094), (9, 11, 2118)) ++
      Vector(lower(9, -22), upper(9, 4166), oob(2))),
    // B.11 (K)
    new Table(t((1, 0, 1), (2, 1, 2), (4, 0, 4), (4, 1, 5), (5, 1, 7), (5, 2, 9),
      (6, 2, 13), (7, 2, 17), (7, 3, 21), (7, 4, 29), (7, 5, 45), (7, 6, 77)) :+
      upper(7, 141)),
    // B.12 (L)
    new Table(t((1, 0, 1), (2, 0, 2), (3, 1, 3), (5, 0, 5), (5, 1, 6), (6, 1, 8),
      (7, 0, 10), (7, 1, 11), (7, 2, 13), (7, 3, 17), (7, 4, 25), (8, 5, 41)) :+
      upper(8, 73)),
    // B.13 (M)
    new Table(t((1, 0, 1), (3, 0, 2), (4, 0, 3), (5, 0, 4), (4, 1, 5), (3, 3, 7),
      (6, 1, 15), (6, 2, 17), (6, 3, 21), (6, 4, 29), (6, 5, 45), (7, 6, 77)) :+
      upper(7, 141)),
    // B.14 (N) — bounded range −2…2, no extension lines
    new Table(t((3, 0, -2), (3, 0, -1), (1, 0, 0), (3, 0, 1), (3, 0, 2))),
    // B.15 (O)
    new Table(t((7, 4, -24), (6, 2, -8), (5, 1, -4), (4, 0, -2), (3, 0, -1), (1, 0, 0),
      (3, 0, 1), (4, 0, 2), (5, 1, 3), (6, 2, 5), (7, 4, 9)) ++
      Vector(lower(7, -25), upper(7, 25))))

  /** B.<n> accessor (1-based, matching the spec numbering). */
  def standard(n: Int): Table = standardTables(n - 1)

  /** Parse a custom table segment payload (type 53, §B.2). */
  def parseTableSegment(data: Array[Byte]): Table = {
    if (data.length < 9) throw new IllegalArgumentException("JBIG2: short table segment")
    val flags = data(0) & 0xff
    val htOob = (flags & 1) != 0
    val htPs = ((flags >> 1) & 7) + 1
    val htRs = ((flags >> 4) & 7) + 1
    def i32(o: Int): Int =
      ((data(o) & 0xff) << 24) | ((data(o + 1) & 0xff) << 16) |
        ((data(o + 2) & 0xff) << 8) | (data(o + 3) & 0xff)
    val htLow = i32(1)
    val htHigh = i32(5)
    if (htLow >= htHigh) throw new IllegalArgumentException("JBIG2: table HTLOW >= HTHIGH")
    val r = new BitReader(data, 9, data.length)
    val lines = Vector.newBuilder[Line]
    var curLow = htLow.toLong
    var n = 0
    while (curLow < htHigh) {
      if (n > (1 << 16)) throw new IllegalArgumentException("JBIG2: implausible table size")
      val prefLen = r.bits(htPs).toInt
      val rangeLen = r.bits(htRs).toInt
      if (rangeLen > 32) throw new IllegalArgumentException("JBIG2: table range length > 32")
      lines += Line(prefLen, rangeLen, curLow.toInt)
      curLow += (if (rangeLen >= 32) Long.MaxValue / 2 else 1L << rangeLen)
      n += 1
    }
    lines += Line(r.bits(htPs).toInt, 32, htLow - 1, kind = 1) // lower range
    lines += Line(r.bits(htPs).toInt, 32, htHigh, kind = 0) // upper range
    if (htOob) lines += Line(r.bits(htPs).toInt, 0, 0, kind = 2)
    new Table(lines.result())
  }

  /** Fixture encoder for a type-53 custom table segment payload. `normal`
    * lines must tile [htLow, htHigh); lower/upper/oob prefix lengths of 0
    * leave those codes unused. */
  def encodeTableSegment(htLow: Int, htHigh: Int, normal: Seq[(Int, Int)],
                         lowerPref: Int, upperPref: Int, oobPref: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val htPs = 4; val htRs = 6 // fixed sizes large enough for fixtures
    out.write((if (oobPref > 0) 1 else 0) | ((htPs - 1) << 1) | ((htRs - 1) << 4))
    def i32(v: Int): Unit = { out.write(v >> 24); out.write((v >> 16) & 0xff); out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    i32(htLow); i32(htHigh)
    val w = new BitWriter
    normal.foreach { case (pref, range) => w.bits(pref.toLong, htPs); w.bits(range.toLong, htRs) }
    w.bits(lowerPref.toLong, htPs)
    w.bits(upperPref.toLong, htPs)
    if (oobPref > 0) w.bits(oobPref.toLong, htPs)
    out.write(w.toBytes)
    out.toByteArray
  }
}
