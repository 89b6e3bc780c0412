package graft.core

/** Minimal T.6 (MMR / Group 4) ENCODER — fixture and spec support only: it
  * round-trips [[Ccitt.decode]] (k < 0, no EOL, no byte-align) so the
  * two-dimensional decode path and the JBIG2 Huffman symbol dictionary's
  * MMR collective-bitmap branch can be tested without external streams.
  * Emits pass / vertical(±3) / horizontal modes per T.6 §2; horizontal run
  * lengths use the shared T.4 white/black terminating + makeup codes. */
object MmrEncode {

  private def runMap(white: Boolean): Map[Int, (Int, Int)] =
    Ccitt.encodeTableFor(white).map { case (run, len, code) => run -> (len, code) }.toMap
  private val whiteRuns = runMap(white = true)
  private val blackRuns = runMap(white = false)
  private val makeups: Array[Int] =
    (whiteRuns.keys.filter(_ >= 64).toArray :+ 0).filter(_ > 0).sorted

  private def writeRun(bw: Jbig2Huffman.BitWriter, run0: Int, white: Boolean): Unit = {
    var run = run0
    val m = if (white) whiteRuns else blackRuns
    while (run >= 64) {
      // largest makeup ≤ run (makeups are shared sizes across both colors)
      var pick = 64
      makeups.foreach(mk => if (mk <= run) pick = mk)
      val (len, code) = m(pick)
      bw.bits(code.toLong, len)
      run -= pick
    }
    val (len, code) = m(run)
    bw.bits(code.toLong, len)
  }

  /** Encode a byte bitmap (1 = black) of size w×h as raw MMR data. */
  def encode(bm: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val bw = new Jbig2Huffman.BitWriter
    // transitions of a row: positions where color changes, first change is
    // white→black (rows notionally start white); even index = to-black
    def transitions(y: Int): Array[Int] = {
      val b = Array.newBuilder[Int]
      var prev = 0
      var x = 0
      while (x < w) {
        val v = bm(y * w + x).toInt
        if (v != prev) { b += x; prev = v }
        x += 1
      }
      b.result()
    }
    // smallest transition > a0 with the given parity (even = to-black); w if none
    def nextAt(tr: Array[Int], a0: Int, parity: Int): Int = {
      var i = parity
      while (i < tr.length) {
        if (tr(i) > a0) return tr(i)
        i += 2
      }
      w
    }
    def nextAfterIdx(tr: Array[Int], pos: Int, parity: Int): Int = {
      // transition strictly after `pos` with given parity; w if none
      var i = parity
      while (i < tr.length) {
        if (tr(i) > pos) return tr(i)
        i += 2
      }
      w
    }
    var ref = Array.empty[Int] // imaginary all-white reference above row 0
    var y = 0
    while (y < h) {
      val cur = transitions(y)
      var a0 = -1
      var color = 0 // 0 = white
      while (a0 < w) {
        val parity = if (color == 0) 0 else 1
        val a1 = nextAt(cur, a0, parity)
        val b1 = nextAt(ref, a0, parity)
        val b2 = if (b1 >= w) w else nextAfterIdx(ref, b1, 1 - parity)
        if (b2 < a1) {
          bw.bits(0x1L, 4) // pass: 0001
          a0 = b2
        } else if (math.abs(a1 - b1) <= 3) {
          a1 - b1 match {
            case 0 => bw.bits(0x1L, 1) // V0: 1
            case 1 => bw.bits(0x3L, 3) // VR1: 011
            case 2 => bw.bits(0x3L, 6) // VR2: 000011
            case 3 => bw.bits(0x3L, 7) // VR3: 0000011
            case -1 => bw.bits(0x2L, 3) // VL1: 010
            case -2 => bw.bits(0x2L, 6) // VL2: 000010
            case _ => bw.bits(0x2L, 7) // VL3: 0000010
          }
          a0 = a1
          color ^= 1
        } else {
          val a2 = if (a1 >= w) w else nextAfterIdx(cur, a1, 1 - parity)
          bw.bits(0x1L, 3) // horizontal: 001
          val start = if (a0 < 0) 0 else a0
          writeRun(bw, a1 - start, color == 0)
          writeRun(bw, a2 - a1, color != 0)
          a0 = a2
        }
      }
      ref = cur
      y += 1
    }
    bw.toBytes
  }
}
