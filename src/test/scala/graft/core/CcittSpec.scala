package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** CCITT G4/G3 decoder validation: (1) encode→decode round trips over random
  * bitmaps with an independent test-side T.4/T.6 encoder, (2) a real
  * PDFium-era CCITTFaxDecode stream (images.pdf, K=-1, 115×48) decodes
  * cleanly to the exact row geometry the reference expectations pin. */
object CcittTestEncoder {

  final class BitWriter {
    private val buf = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nBits = 0
    def write(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        cur = (cur << 1) | ((code >> i) & 1)
        nBits += 1
        if (nBits == 8) { buf.write(cur); cur = 0; nBits = 0 }
        i -= 1
      }
    }
    def finish(): Array[Byte] = {
      if (nBits > 0) { buf.write(cur << (8 - nBits)); cur = 0; nBits = 0 }
      buf.toByteArray
    }
  }

  private def writeRun(bw: BitWriter, run0: Int, white: Boolean): Unit = {
    val table = Ccitt.encodeTableFor(white).map(e => e._1 -> (e._2, e._3)).toMap
    var run = run0
    // greedy makeups (largest first), then the terminating code
    while (run >= 64) {
      val mk = table.keys.filter(k => k >= 64 && k <= run).max
      val (len, code) = table(mk)
      bw.write(code, len)
      run -= mk
    }
    val (len, code) = table(run)
    bw.write(code, len)
  }

  private def transitions(row: Array[Boolean]): Array[Int] = {
    val out = Vector.newBuilder[Int]
    var prev = false // rows start white
    var i = 0
    while (i < row.length) {
      if (row(i) != prev) { out += i; prev = row(i) }
      i += 1
    }
    out.result().toArray
  }

  /** Group 4 (K<0) encoder. `bitmap(r)(c)` true = black. */
  def encodeG4(bitmap: Array[Array[Boolean]]): Array[Byte] = {
    val columns = bitmap(0).length
    val bw = new BitWriter()
    var ref = Array.empty[Int]
    bitmap.foreach { row =>
      val cur = transitions(row)
      var a0 = -1
      var white = true
      while (a0 < columns) {
        // b1: first ref transition > a0 with color parity matching `white`
        var bi = 0
        while (bi < ref.length && (ref(bi) <= a0 || ((bi & 1) == 0) != white)) bi += 1
        val b1 = if (bi < ref.length) ref(bi) else columns
        val b2 = if (bi + 1 < ref.length) ref(bi + 1) else columns
        // a1: first cur transition > a0 (next color change on this row)
        var ai = 0
        while (ai < cur.length && cur(ai) <= a0) ai += 1
        val a1 = if (ai < cur.length) cur(ai) else columns
        if (b2 < a1) { // pass
          bw.write(1, 4)
          a0 = b2
        } else if (math.abs(a1 - b1) <= 3) { // vertical
          (a1 - b1) match {
            case 0 => bw.write(1, 1)
            case 1 => bw.write(3, 3)
            case 2 => bw.write(3, 6)
            case 3 => bw.write(3, 7)
            case -1 => bw.write(2, 3)
            case -2 => bw.write(2, 6)
            case -3 => bw.write(2, 7)
          }
          a0 = a1
          white = !white
        } else { // horizontal
          val a2 = if (ai + 1 < cur.length) cur(ai + 1) else columns
          bw.write(1, 3)
          val s = if (a0 < 0) 0 else a0
          writeRun(bw, a1 - s, white)
          writeRun(bw, a2 - a1, !white)
          a0 = a2
        }
      }
      ref = cur
    }
    // EOFB: two EOLs
    bw.write(1, 12); bw.write(1, 12)
    bw.finish()
  }

  /** Group 3 one-dimensional (K=0) encoder. */
  def encodeMH(bitmap: Array[Array[Boolean]]): Array[Byte] = {
    val columns = bitmap(0).length
    val bw = new BitWriter()
    bitmap.foreach { row =>
      val tr = transitions(row)
      var pos = 0
      var white = true
      var ti = 0
      while (pos < columns) {
        val next = if (ti < tr.length) tr(ti) else columns
        writeRun(bw, next - pos, white)
        pos = next
        white = !white
        ti += 1
      }
    }
    bw.write(1, 12) // EOL tail
    bw.finish()
  }

  /** Group 3 mixed two-dimensional (K>0) encoder: every row prefixed by
    * EOL + a tag bit (1 = 1D row, 0 = 2D row); rows alternate modes. */
  def encodeMixed(bitmap: Array[Array[Boolean]]): Array[Byte] = {
    val columns = bitmap(0).length
    val bw = new BitWriter()
    var ref = Array.empty[Int]
    bitmap.zipWithIndex.foreach { case (row, r) =>
      bw.write(1, 12) // EOL
      val use1D = r % 2 == 0
      bw.write(if (use1D) 1 else 0, 1) // tag bit
      val cur = transitions(row)
      if (use1D) {
        var pos = 0
        var white = true
        var ti = 0
        while (pos < columns) {
          val next = if (ti < cur.length) cur(ti) else columns
          writeRun(bw, next - pos, white)
          pos = next
          white = !white
          ti += 1
        }
      } else {
        var a0 = -1
        var white = true
        while (a0 < columns) {
          var bi = 0
          while (bi < ref.length && (ref(bi) <= a0 || ((bi & 1) == 0) != white)) bi += 1
          val b1 = if (bi < ref.length) ref(bi) else columns
          val b2 = if (bi + 1 < ref.length) ref(bi + 1) else columns
          var ai = 0
          while (ai < cur.length && cur(ai) <= a0) ai += 1
          val a1 = if (ai < cur.length) cur(ai) else columns
          if (b2 < a1) { bw.write(1, 4); a0 = b2 }
          else if (math.abs(a1 - b1) <= 3) {
            (a1 - b1) match {
              case 0 => bw.write(1, 1)
              case 1 => bw.write(3, 3)
              case 2 => bw.write(3, 6)
              case 3 => bw.write(3, 7)
              case -1 => bw.write(2, 3)
              case -2 => bw.write(2, 6)
              case -3 => bw.write(2, 7)
            }
            a0 = a1; white = !white
          } else {
            val a2 = if (ai + 1 < cur.length) cur(ai + 1) else columns
            bw.write(1, 3)
            val s = if (a0 < 0) 0 else a0
            writeRun(bw, a1 - s, white)
            writeRun(bw, a2 - a1, !white)
            a0 = a2
          }
        }
      }
      ref = cur
    }
    bw.write(1, 12)
    bw.finish()
  }

  def pack(bitmap: Array[Array[Boolean]], blackIs1: Boolean): Array[Byte] = {
    val columns = bitmap(0).length
    val rowBytes = (columns + 7) / 8
    val out = new Array[Byte](bitmap.length * rowBytes)
    bitmap.zipWithIndex.foreach { case (row, r) =>
      var c = 0
      while (c < columns) {
        val black = row(c)
        val bit = if (blackIs1) black else !black
        if (bit) out(r * rowBytes + (c >> 3)) = (out(r * rowBytes + (c >> 3)) | (0x80 >> (c & 7))).toByte
        c += 1
      }
    }
    out
  }
}

class CcittSpec extends AnyFunSuite {

  private def randomBitmap(rows: Int, cols: Int, seed: Int, density: Double): Array[Array[Boolean]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(rows, cols)(rnd.nextDouble() < density)
  }

  test("G4 round trip: random bitmaps at several densities and widths") {
    for ((seed, density, cols, rows) <- Seq(
      (1, 0.05, 64, 20), (2, 0.5, 115, 48), (3, 0.9, 200, 10),
      (4, 0.2, 33, 7), (5, 0.0, 40, 5), (6, 1.0, 40, 5))) {
      val bm = randomBitmap(rows, cols, seed, density)
      val enc = CcittTestEncoder.encodeG4(bm)
      val dec = Ccitt.decode(enc, cols, rows, k = -1, blackIs1 = true, encodedByteAlign = false)
      val exp = CcittTestEncoder.pack(bm, blackIs1 = true)
      assert(dec.length == exp.length, s"seed=$seed: ${dec.length} vs ${exp.length}")
      assert(java.util.Arrays.equals(dec, exp), s"seed=$seed pixel mismatch")
    }
  }

  test("G4 round trip honors BlackIs1=false inversion (PDF default)") {
    val bm = randomBitmap(12, 50, 7, 0.3)
    val enc = CcittTestEncoder.encodeG4(bm)
    val dec = Ccitt.decode(enc, 50, 12, k = -1, blackIs1 = false, encodedByteAlign = false)
    assert(java.util.Arrays.equals(dec, CcittTestEncoder.pack(bm, blackIs1 = false)))
  }

  test("MH (K=0) round trip") {
    val bm = randomBitmap(9, 80, 11, 0.35)
    val enc = CcittTestEncoder.encodeMH(bm)
    val dec = Ccitt.decode(enc, 80, 9, k = 0, blackIs1 = true, encodedByteAlign = false)
    assert(java.util.Arrays.equals(dec, CcittTestEncoder.pack(bm, blackIs1 = true)))
  }

  test("mixed mode (K>0) round trip: alternating 1D/2D rows with EOL tags") {
    val bm = randomBitmap(10, 70, 21, 0.3)
    val enc = CcittTestEncoder.encodeMixed(bm)
    val dec = Ccitt.decode(enc, 70, 10, k = 4, blackIs1 = true, encodedByteAlign = false)
    assert(java.util.Arrays.equals(dec, CcittTestEncoder.pack(bm, blackIs1 = true)))
  }

  test("long runs exercise makeup codes (>64 and >1728 pixels)") {
    val cols = 2400
    val bm = Array.tabulate(4, cols)((r, c) => (c / (300 + r * 100)) % 2 == 1)
    val enc = CcittTestEncoder.encodeG4(bm)
    val dec = Ccitt.decode(enc, cols, 4, k = -1, blackIs1 = true, encodedByteAlign = false)
    assert(java.util.Arrays.equals(dec, CcittTestEncoder.pack(bm, blackIs1 = true)))
  }

  test("images.pdf real CCITT stream decodes to the pinned geometry (115×48, G4)") {
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/tests/resources/images.pdf"))
    val doc = PdfDocument.load(bytes).toOption.get
    val imgs = ImageExtract.pageImages(doc.page(0))
    assert(imgs.length == 1)
    val img = imgs.head
    assert(img.format == "pix", s"got ${img.format}")
    assert(img.width == 115 && img.height == 48)
    // 48 rows × ceil(115/8)=15 bytes — a desynced decode can't produce this
    assert(img.data.length == 48 * 15, s"len=${img.data.length}")
    // the fixture is a real glyph image: some ink, not solid
    val ink = img.data.map(b => java.lang.Integer.bitCount(b & 0xff)).sum
    assert(ink > 100 && ink < 48 * 115, s"ink=$ink")
  }
}
