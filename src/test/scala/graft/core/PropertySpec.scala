package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Property-style tests (seeded, dependency-free) for pieces the reference
  * cannot randomize (SURVEY.md §5): codec round trips, matrix algebra laws
  * (matrix.py:76-181), range compression (_parsers.py:40-61). */
class PropertySpec extends AnyFunSuite {

  private def cases[T](n: Int)(gen: scala.util.Random => T)(check: T => Unit): Unit = {
    val rnd = new scala.util.Random(42)
    (0 until n).foreach { _ => check(gen(rnd)) }
  }
  private def bytesGen(rnd: scala.util.Random): Array[Byte] = {
    val n = rnd.nextInt(2048)
    val a = new Array[Byte](n); rnd.nextBytes(a); a
  }

  test("ASCIIHex encode→decode round trip") {
    cases(50)(bytesGen) { data =>
      val hex = data.map(b => f"$b%02X").mkString + ">"
      assert(Filters.asciiHex(hex.getBytes("ISO-8859-1")).toVector == data.toVector)
    }
  }

  test("ASCII85 encode→decode round trip") {
    cases(50)(bytesGen) { data =>
      val sb = new StringBuilder
      data.grouped(4).foreach { g =>
        val padded = g.padTo(4, 0.toByte)
        var t = 0L
        padded.foreach(b => t = (t << 8) | (b & 0xff))
        val cs = new Array[Char](5)
        var i = 4
        while (i >= 0) { cs(i) = ((t % 85) + '!').toChar; t /= 85; i -= 1 }
        sb.appendAll(cs, 0, if (g.length == 4) 5 else g.length + 1)
      }
      sb.append("~>")
      assert(Filters.ascii85(sb.toString.getBytes("ISO-8859-1")).toVector == data.toVector)
    }
  }

  test("RunLength encode→decode round trip (literal runs)") {
    cases(50)(bytesGen) { data =>
      val out = new java.io.ByteArrayOutputStream()
      data.grouped(128).foreach { g => out.write(g.length - 1); out.write(g, 0, g.length) }
      out.write(128)
      assert(Filters.runLength(out.toByteArray).toVector == data.toVector)
    }
  }

  test("Flate round trip via Deflater") {
    cases(50)(bytesGen) { data =>
      val d = new java.util.zip.Deflater()
      d.setInput(data); d.finish()
      val buf = new Array[Byte](data.length * 2 + 64)
      val n = d.deflate(buf)
      d.end()
      assert(Filters.flate(java.util.Arrays.copyOf(buf, n)).toVector == data.toVector)
    }
  }

  test("LZW encode→decode round trip") {
    def lzwEncode(data: Array[Byte]): Array[Byte] = {
      val dict = scala.collection.mutable.Map[Vector[Byte], Int]()
      (0 until 256).foreach(i => dict(Vector(i.toByte)) = i)
      var nextCode = 258
      var codeLen = 9
      val out = new java.io.ByteArrayOutputStream()
      var bitBuf = 0L; var bitCnt = 0
      def put(code: Int): Unit = {
        // early-change: decoder has nextCode-1 entries when it reads this
        // code and bumps at >= 2^len - 1 entries → bump when nextCode >= 2^len
        if (nextCode >= (1 << codeLen) && codeLen < 12) codeLen += 1
        bitBuf = (bitBuf << codeLen) | code; bitCnt += codeLen
        while (bitCnt >= 8) { out.write(((bitBuf >> (bitCnt - 8)) & 0xff).toInt); bitCnt -= 8 }
      }
      put(256)
      var w = Vector.empty[Byte]
      data.foreach { b =>
        val wb = w :+ b
        if (dict.contains(wb)) w = wb
        else {
          put(dict(w))
          dict(wb) = nextCode; nextCode += 1
          w = Vector(b)
        }
      }
      if (w.nonEmpty) put(dict(w))
      put(257)
      if (bitCnt > 0) out.write(((bitBuf << (8 - bitCnt)) & 0xff).toInt)
      out.toByteArray
    }
    cases(30)(bytesGen) { data =>
      assert(Filters.lzw(lzwEncode(data), 1).toVector == data.toVector)
    }
  }

  private def matGen(rnd: scala.util.Random): Mat =
    Mat(rnd.nextDouble() * 200 - 100, rnd.nextDouble() * 200 - 100,
      rnd.nextDouble() * 200 - 100, rnd.nextDouble() * 200 - 100,
      rnd.nextDouble() * 200 - 100, rnd.nextDouble() * 200 - 100)

  test("matrix: compose-then-apply equals apply-then-apply") {
    cases(200)(r => (matGen(r), matGen(r), r.nextDouble() * 100, r.nextDouble() * 100)) {
      case (m1, m2, x, y) =>
        val viaCompose = m1.multiply(m2).onPoint(x, y)
        val sequential = { val (px, py) = m1.onPoint(x, y); m2.onPoint(px, py) }
        assert(math.abs(viaCompose._1 - sequential._1) < 1e-6 * (1 + math.abs(sequential._1)))
        assert(math.abs(viaCompose._2 - sequential._2) < 1e-6 * (1 + math.abs(sequential._2)))
    }
  }

  test("matrix: invert is inverse (when invertible)") {
    cases(200)(r => (matGen(r), r.nextDouble() * 100, r.nextDouble() * 100)) {
      case (m, x, y) =>
        if (math.abs(m.a * m.d - m.b * m.c) > 1e-3) {
          val inv = m.invert.get
          val (px, py) = m.onPoint(x, y)
          val (rx, ry) = inv.onPoint(px, py)
          assert(math.abs(rx - x) < 1e-4 && math.abs(ry - y) < 1e-4)
        }
    }
  }

  test("matrix: translate/scale/rotate semantics (matrix.py row-vector convention)") {
    val m = Mat.identity.translate(10, 20).scale(2, 3)
    assert(m.onPoint(1, 1) == ((22.0, 63.0))) // (1+10)*2, (1+20)*3
    val r = Mat.identity.rotate(90)
    val (x, y) = r.onPoint(1, 0)
    assert(math.abs(x) < 1e-12 && math.abs(y + 1) < 1e-12) // clockwise for +angles
    val mr = Mat.identity.mirror(vertical = true, horizontal = false)
    assert(mr.onPoint(3, 4) == ((-3.0, 4.0)))
  }

  test("rangeCompress expands back to the same set") {
    cases(100) { r => (0 until (1 + r.nextInt(40))).map(_ => 1 + r.nextInt(200)).distinct.sorted } { nums =>
      val s = Reports.rangeCompress(nums)
      val back = s.split(", ").flatMap { part =>
        if (part.contains('-')) { val Array(a, b) = part.split('-'); a.toInt to b.toInt }
        else Seq(part.toInt)
      }
      assert(back.toVector == nums.toVector)
    }
  }
}
