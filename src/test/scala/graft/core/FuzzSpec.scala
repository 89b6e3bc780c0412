package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Adversarial-input sweep: seeded random mutations of real fixtures must
  * never throw, never hang, and always produce a status row — the web-scale
  * contract (per-row error containment, SURVEY.md §7.4). */
class FuzzSpec extends AnyFunSuite {

  def fixture(name: String): Array[Byte] =
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"/root/reference/tests/resources/$name"))

  private def mutate(base: Array[Byte], rnd: scala.util.Random): Array[Byte] = {
    val b = base.clone()
    rnd.nextInt(4) match {
      case 0 => // byte flips
        (0 until 1 + rnd.nextInt(20)).foreach { _ =>
          b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
        }
        b
      case 1 => // truncation
        java.util.Arrays.copyOf(b, 1 + rnd.nextInt(b.length))
      case 2 => // splice two regions
        val at = rnd.nextInt(b.length)
        val len = rnd.nextInt(b.length - at)
        val src = rnd.nextInt(b.length - len)
        System.arraycopy(base, src, b, at, len)
        b
      case _ => // random prefix garbage
        val junk = new Array[Byte](rnd.nextInt(64))
        rnd.nextBytes(junk)
        junk ++ b
    }
  }

  test("300 seeded mutations of real PDFs: no throw, bounded time") {
    val bases = Seq("text.pdf", "attachments.pdf", "encrypted.pdf", "toc.pdf", "images.pdf").map(fixture)
    val rnd = new scala.util.Random(1234)
    var oks = 0
    var errs = 0
    (0 until 300).foreach { i =>
      val base = bases(i % bases.length)
      val bytes = mutate(base, rnd)
      val t0 = System.nanoTime()
      val r = Extract.extractAny(bytes) // must not throw
      val ms = (System.nanoTime() - t0) / 1000000
      assert(ms < 20000, s"mutation $i took ${ms}ms")
      if (r.ok) oks += 1 else errs += 1
    }
    // most mutations should still parse (small flips) — sanity that the
    // recovery machinery isn't rejecting everything
    assert(oks > 50, s"oks=$oks errs=$errs")
    assert(oks + errs == 300)
  }

  test("rasterizer fuzz: mutated PDFs render partially, never throw") {
    val bases = Seq("text.pdf", "render.pdf", "images.pdf").map(fixture)
    val rnd = new scala.util.Random(4321)
    var rendered = 0
    (0 until 60).foreach { i =>
      val bytes = mutate(bases(i % bases.length), rnd)
      PdfDocument.load(bytes).toOption.foreach { doc =>
        if (doc.pageCount > 0) {
          val t0 = System.nanoTime()
          val bmp = graft.core.render.Rasterizer.render(doc.page(0), scale = 0.25)
          assert(bmp.width > 0 && bmp.height > 0)
          assert((System.nanoTime() - t0) / 1000000 < 20000, s"mutation $i render too slow")
          rendered += 1
        }
      }
    }
    assert(rendered > 10, s"rendered=$rendered")
  }

  test("ccitt fuzz: random bitstreams decode or error cleanly, bounded output") {
    val rnd = new scala.util.Random(31337)
    (0 until 100).foreach { _ =>
      val b = new Array[Byte](rnd.nextInt(2048))
      rnd.nextBytes(b)
      try {
        val out = Ccitt.decode(b, columns = 115, rows = 64, k = -1,
          blackIs1 = true, encodedByteAlign = false)
        assert(out.length <= 64 * 15)
      } catch { case _: java.io.IOException => () } // clean decode error
    }
  }

  test("random garbage payloads: clean error rows") {
    val rnd = new scala.util.Random(99)
    (0 until 50).foreach { _ =>
      val b = new Array[Byte](rnd.nextInt(4096))
      rnd.nextBytes(b)
      val r = Extract.extractAny(b)
      assert(!r.ok || r.nPages >= 0)
    }
  }

  test("html fuzz: tag soup terminates") {
    val rnd = new scala.util.Random(7)
    val frags = Seq("<div>", "</p>", "<a href='x'>", "&amp;", "<!--", "<script>", "]]>", "<p ", "\"", "<html>", "text ")
    (0 until 100).foreach { _ =>
      val soup = (0 until 200).map(_ => frags(rnd.nextInt(frags.length))).mkString
      val r = Extract.extractAny(("<html>" + soup).getBytes("UTF-8"))
      assert(r.ok)
    }
  }

  test("jbig2 fuzz: random and mutated streams error cleanly, bounded time") {
    val rnd = new scala.util.Random(1337)
    val valid = Jbig2.encodeEmbeddedText(
      Vector((8, 6, Array.fill[Byte](48)(1))), Seq((0, 2, 2)), 32, 24)
    val t0 = System.nanoTime()
    (0 until 150).foreach { i =>
      val payload =
        if (i % 3 == 0) { val b = new Array[Byte](1 + rnd.nextInt(300)); rnd.nextBytes(b); b }
        else mutate(valid, rnd)
      try {
        val out = Jbig2.decode(payload, None, 32, 24)
        assert(out.length == 32 * 24) // if it decodes, shape is bounded
      } catch { case _: Exception => () } // clean error path
    }
    val sec = (System.nanoTime() - t0) / 1e9
    assert(sec < 30, s"jbig2 fuzz too slow: $sec s")
  }

  test("jbig2 HUFFMAN fuzz: mutated Annex-B streams error cleanly, bounded time") {
    val rnd = new scala.util.Random(7331)
    val syms = Vector[Jbig2.Sym]((8, 6, Array.fill[Byte](48)(1)), (5, 6, Array.fill[Byte](30)(1)))
    val plain = Jbig2.encodeEmbeddedTextHuffman(syms, Seq((0, 2, 2), (1, 14, 2)), 32, 24)
    val mmr = Jbig2.encodeEmbeddedTextHuffman(syms, Seq((0, 2, 2), (1, 14, 2)), 32, 24,
      mmrCollective = true)
    val t0 = System.nanoTime()
    (0 until 150).foreach { i =>
      val payload =
        if (i % 5 == 0) { val b = new Array[Byte](1 + rnd.nextInt(300)); rnd.nextBytes(b); b }
        else mutate(if (i % 2 == 0) plain else mmr, rnd)
      try {
        val out = Jbig2.decode(payload, None, 32, 24)
        assert(out.length == 32 * 24)
      } catch { case _: Exception => () } // clean error path
    }
    val sec = (System.nanoTime() - t0) / 1e9
    assert(sec < 30, s"jbig2 huffman fuzz too slow: $sec s")
  }

  test("web-scanner fuzz: hreflang/tag-sequence/feed/sitemap parsers never throw, bounded time") {
    val rnd = new scala.util.Random(4242)
    val seeds = Seq(
      "<html><head><link rel=\"alternate\" hreflang=\"en\" href=\"https://a/\"></head></html>",
      "<rss><channel><item><link>https://x/1</link><title>T &amp; t</title></item></channel></rss>",
      "<urlset><url><loc>https://s/1</loc></url></urlset>",
      "<html><head><script>x(\"<iframe>\")</script></head><body><p>t</p></body></html>")
    val t0 = System.nanoTime()
    (0 until 400).foreach { i =>
      val s =
        if (i % 4 == 0) { val b = new Array[Byte](1 + rnd.nextInt(400)); rnd.nextBytes(b); new String(b, java.nio.charset.StandardCharsets.ISO_8859_1) }
        else {
          val base = seeds(i % seeds.length).toCharArray
          (0 until 1 + rnd.nextInt(6)).foreach { _ =>
            base(rnd.nextInt(base.length)) = (rnd.nextInt(94) + 33).toChar
          }
          new String(base)
        }
      val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      // none of these may throw; outputs are bounded by input length
      val a = graft.ops.Hreflang.extractAlternates(s, "https://fuzz/")
      assert(a.length <= s.length)
      val seq = graft.ops.HtmlFeatures.tagSequence(s)
      assert(seq.length <= s.length * 2 + 16)
      val f = graft.ops.Feeds.parseFeed(bytes)
      assert(f.length <= s.length)
      val sm = graft.ops.Sitemaps.parseSitemap("https://fuzz/s.xml", bytes)
      assert(sm.length <= s.length)
    }
    val sec = (System.nanoTime() - t0) / 1e9
    assert(sec < 20, s"web-scanner fuzz too slow: $sec s")
  }

  test("page-gate scanner fuzz: forms/hidden/soft404/paywall/amp/iframe/charset never throw, bounded time") {
    val rnd = new scala.util.Random(8484)
    val seeds = Seq(
      """<form action="/q" method=post><input type="password" name=p><input type=search></form>""",
      """<div style="display:none"><div>inner</div> spam</div><p style="opacity: 0">x</p>""",
      """<title>404 Not Found</title><body><p>The page you requested could not be found.</p>""",
      """<script type="application/ld+json">{"isAccessibleForFree": false,
        |"@type":"BreadcrumbList","itemListElement":[{"position":1}]}</script>""".stripMargin,
      """<html amp><link rel="canonical" href="https://a/"><link rel=amphtml href=https://a/amp>""",
      """<iframe src="https://ads.doubleclick.net/x" sandbox></iframe><iframe src=/rel>""",
      """<meta charset="iso-8859-1"><body>café résumé �""",
      // regression: unterminated </script close inside a hidden block once
      // sent HiddenText.textChars back to index 0 (infinite loop)
      """<div hidden>spam<script>var x=1;</script""",
      """<style>.a{}</style  <p style="opacity: 0">x""")
    val t0 = System.nanoTime()
    (0 until 600).foreach { i =>
      val s =
        if (i % 5 == 0) {
          val b = new Array[Byte](1 + rnd.nextInt(500)); rnd.nextBytes(b)
          new String(b, java.nio.charset.StandardCharsets.ISO_8859_1)
        } else {
          val base = seeds(i % seeds.length).toCharArray
          (0 until 1 + rnd.nextInt(8)).foreach { _ =>
            base(rnd.nextInt(base.length)) = (rnd.nextInt(94) + 33).toChar
          }
          new String(base)
        }
      val bytes = s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
      // none of these may throw; outputs are bounded by input size
      val fo = graft.core.html.Forms.scan(s)
      assert(fo.length <= s.length)
      val h = graft.core.html.HiddenText.scan(s)
      assert(h.hiddenChars <= s.length && h.totalChars <= s.length)
      graft.core.html.Soft404.scan(s)
      graft.core.html.Paywall.scan(s)
      graft.core.html.AmpLinks.scan(s)
      graft.core.html.JsonLd.breadcrumbs(s)
      val ifr = graft.core.html.Iframes.scan(s, "fuzz.example")
      assert(ifr.length <= s.length)
      graft.core.html.CharsetAudit.scan(bytes)
      graft.core.html.CharsetAudit.scan(Array.empty[Byte])
    }
    val sec = (System.nanoTime() - t0) / 1e9
    assert(sec < 25, s"page-gate scanner fuzz too slow: $sec s")
  }
}
