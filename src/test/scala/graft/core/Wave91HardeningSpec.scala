package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Wave 91: adversarial hardening — parser nesting guard, decompression
  * caps, and the poison corpus end-to-end. A 10^12-row crawl WILL contain
  * these payloads; each must yield a clean error row, never a
  * StackOverflowError (invisible to catch-Exception) or an executor OOM. */
class Wave91HardeningSpec extends AnyFunSuite {

  test("lexer: 300-deep nesting throws a catchable Exception, 200-deep parses") {
    val deep200 = ("[" * 200) + "1" + ("]" * 200)
    val ok = new Lexer(deep200.getBytes("ISO-8859-1")).parseObject()
    assert(ok.isInstanceOf[PdfArray])
    val deep300 = ("[" * 300) + "1" + ("]" * 300)
    val e = intercept[Exception] {
      new Lexer(deep300.getBytes("ISO-8859-1")).parseObject()
    }
    assert(e.getMessage.contains("nesting"))
  }

  test("lexer: 100k-deep nest bomb fails fast as FORMAT, not StackOverflowError") {
    val bomb = graft.spark.SynthFixtures.poisonCorpus.toMap.apply("nest_bomb")
    val t0 = System.nanoTime()
    val r = Extract.extractText(bomb) // must NOT throw (SOE would escape)
    val ms = (System.nanoTime() - t0) / 1000000
    assert(!r.ok && r.errCode == ErrCodes.Format)
    assert(ms < 5000, s"nest bomb took ${ms}ms — guard not engaging")
  }

  test("lexer: 5M-element flat array hits the element cap as FORMAT") {
    val bomb = graft.spark.SynthFixtures.poisonCorpus.toMap.apply("array_bomb")
    val r = Extract.extractText(bomb)
    assert(!r.ok && r.errCode == ErrCodes.Format)
    // boundary: a 1000-element array is far under the cap and parses
    val small = ("[" + ("1 " * 1000) + "]").getBytes("ISO-8859-1")
    val o = new Lexer(small).parseObject()
    assert(o.asInstanceOf[PdfArray].items.length == 1000)
  }

  test("lexer: 2M-entry dict is rejected, normal dicts parse") {
    val ok = new Lexer("<</A 1/B 2>>".getBytes("ISO-8859-1")).parseObject()
    assert(ok.asInstanceOf[PdfDict].entries.size == 2)
    // build just over the cap cheaply? 1M+ entries is a ~10 MB string —
    // acceptable for one spec
    val sb = new StringBuilder("<<")
    var i = 0
    while (i <= (1 << 20)) { sb.append("/K").append(i).append(" 1 "); i += 1 }
    sb.append(">>")
    val e = intercept[Exception] {
      new Lexer(sb.toString.getBytes("ISO-8859-1")).parseObject()
    }
    assert(e.getMessage.contains("entries"))
  }

  test("flate: decompression bomb hits the output cap, not the heap") {
    // 300 MiB of zeros deflates to ~300 KB; decode must throw the cap
    // exception (NOT the corrupt-stream fallback, which would re-inflate)
    val d = new java.util.zip.Deflater(9)
    val out = new java.io.ByteArrayOutputStream()
    val zeros = new Array[Byte](1 << 20)
    val buf = new Array[Byte](1 << 16)
    var fed = 0
    while (fed < 300) {
      d.setInput(zeros)
      while (!d.needsInput()) out.write(buf, 0, d.deflate(buf))
      fed += 1
    }
    d.finish()
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    val e = intercept[Filters.DecodeCapException] { Filters.flate(out.toByteArray) }
    assert(e.getMessage.contains("exceeds"))
  }

  test("runlength: repeat bomb hits the output cap") {
    // each (0x81, b) pair expands to 128 bytes; 4 MiB of pairs → 256 MiB+
    val n = (4 << 20) + 1024
    val in = new Array[Byte](n)
    var i = 0
    while (i + 1 < n) { in(i) = 0x81.toByte; in(i + 1) = 'x'.toByte; i += 2 }
    intercept[Filters.DecodeCapException] { Filters.runLength(in) }
  }

  test("poison corpus: every class yields a clean deterministic row") {
    val byName = graft.spark.SynthFixtures.poisonCorpus.toMap
    def run(n: String) = Extract.extractText(byName(n))
    assert(run("healthy").ok && run("healthy").nPages == 3)
    assert(run("truncated_90").ok && run("truncated_90").nPages == 3) // xref recovery
    assert(!run("garbage").ok && run("garbage").errCode == ErrCodes.Format)
    val cycle = run("page_cycle") // must terminate (cycle-guarded walk)
    assert(cycle.nPages == 0)
    val bomb = run("flate_bomb") // must complete without 2 GB of heap
    assert(bomb.nPages == 1 && bomb.pages.forall(_.nChars == 0))
  }
}
