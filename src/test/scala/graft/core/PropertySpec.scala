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

  test("JBIG2 generic region: random bitmaps round-trip at every template") {
    cases(24) { rnd =>
      val w = 8 + rnd.nextInt(40)
      val h = 8 + rnd.nextInt(30)
      val density = rnd.nextDouble()
      val bm = Array.fill[Byte](w * h)(if (rnd.nextDouble() < density) 1 else 0)
      (w, h, bm, rnd.nextInt(4))
    } { case (w, h, bm, tmpl) =>
      val data = Jbig2.encodeGenericArith(bm, w, h, tmpl)
      val dec = Jbig2.decodeGenericArith(
        new Jbig2.MQDecoder(data, 0, data.length), w, h, tmpl,
        Jbig2.nominalAt(tmpl), tpgdon = false)
      assert(java.util.Arrays.equals(dec, bm), s"template $tmpl ${w}x$h")
    }
  }

  test("JBIG2 arithmetic integers: random values round-trip in one stream") {
    cases(20) { rnd =>
      Vector.fill(200) {
        if (rnd.nextInt(20) == 0) Jbig2.OOB
        else {
          val mag = rnd.nextInt(6) match {
            case 0 => rnd.nextInt(4)
            case 1 => 4 + rnd.nextInt(16)
            case 2 => 20 + rnd.nextInt(64)
            case 3 => 84 + rnd.nextInt(256)
            case 4 => 340 + rnd.nextInt(4096)
            case _ => 4436 + rnd.nextInt(1 << 20)
          }
          if (rnd.nextBoolean() && mag != 0) -mag else mag
        }
      }
    } { values =>
      val enc = new Jbig2.MQEncoder
      val cxe = new Array[Short](512)
      values.foreach(v => Jbig2.encodeInt(enc, cxe, v))
      val data = enc.flush()
      val dec = new Jbig2.MQDecoder(data, 0, data.length)
      val cxd = new Array[Short](512)
      values.zipWithIndex.foreach { case (v, i) =>
        assert(Jbig2.decodeInt(dec, cxd) == v, s"value $i ($v)")
      }
    }
  }

  test("JBIG2 symbol+text streams: random symbol sets and placements round-trip") {
    cases(10) { rnd =>
      val h = 6 + rnd.nextInt(8)
      val nSyms = 1 + rnd.nextInt(4)
      val syms = Vector.fill(nSyms) {
        val w = 4 + rnd.nextInt(10)
        (w, h, Array.fill[Byte](w * h)(if (rnd.nextBoolean()) 1 else 0))
      }
      val pw = 80; val ph = 60
      val placements = (0 until 1 + rnd.nextInt(6)).map { _ =>
        val id = rnd.nextInt(nSyms)
        (id, rnd.nextInt(pw - syms(id)._1), rnd.nextInt(ph - h))
      }
      (syms, placements, pw, ph)
    } { case (syms, placements, pw, ph) =>
      val emb = Jbig2.encodeEmbeddedText(syms, placements, pw, ph)
      val got = Jbig2.decode(emb, None, pw, ph)
      val exp = new Array[Byte](pw * ph)
      placements.foreach { case (id, x0, y0) =>
        val (sw, sh, sb) = syms(id)
        var yy = 0
        while (yy < sh) {
          var xx = 0
          while (xx < sw) {
            if (sb(yy * sw + xx) == 1) exp((y0 + yy) * pw + (x0 + xx)) = 1
            xx += 1
          }
          yy += 1
        }
      }
      assert(java.util.Arrays.equals(got, exp))
    }
  }
}
