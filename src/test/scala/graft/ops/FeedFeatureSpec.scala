package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** RSS/Atom feed parsing (Feeds) and HTML render-worthiness features
  * (HtmlFeatures): hand fixtures, decoys, malformed-input robustness. */
class FeedFeatureSpec extends AnyFunSuite {

  test("RSS: items parse in order, entities decode, pubDate captured") {
    val rss =
      """<?xml version="1.0"?><rss version="2.0"><channel><title>t</title>
        |<item><title>A &amp; B</title><link>https://x.com/1</link><pubDate>2024-01-01</pubDate></item>
        |<item><title>C</title><link>https://x.com/2</link><pubDate>2024-01-02</pubDate></item>
        |</channel></rss>""".stripMargin
    val es = Feeds.parseFeed(rss.getBytes("UTF-8"))
    assert(es.map(e => (e.fmt, e.idx, e.link, e.title, e.published)) == Vector(
      ("rss", 0L, "https://x.com/1", "A & B", "2024-01-01"),
      ("rss", 1L, "https://x.com/2", "C", "2024-01-02")))
  }

  test("Atom: link is the href attribute, updated captured") {
    val atom =
      """<feed xmlns="http://www.w3.org/2005/Atom"><title>f</title>
        |<entry><title>P</title><link href="https://y.org/a"/><updated>2024-02-03</updated></entry>
        |</feed>""".stripMargin
    val es = Feeds.parseFeed(atom.getBytes("UTF-8"))
    assert(es.map(e => (e.fmt, e.link, e.published)) ==
      Vector(("atom", "https://y.org/a", "2024-02-03")))
  }

  test("feeds: gzip sniff, malformed tail keeps parsed prefix, garbage empty") {
    val rss = "<rss><channel><item><link>https://z.net/1</link></item>" +
      "<item><link>https://z.net/2</link></item><item><link>https://z" // truncated
    val plain = Feeds.parseFeed(rss.getBytes("UTF-8"))
    assert(plain.map(_.link) == Vector("https://z.net/1", "https://z.net/2"))
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(rss.getBytes("UTF-8")); gz.close()
    assert(Feeds.parseFeed(bos.toByteArray).map(_.link) == plain.map(_.link))
    assert(Feeds.parseFeed("just text".getBytes).isEmpty)
    assert(Feeds.parseFeed(Array[Byte](0x1f, 0x8b.toByte, 9, 9)).isEmpty) // bad gzip
    assert(Feeds.parseFeed(null).isEmpty)
  }

  test("html features: script-body decoys and comments do not count") {
    val html = "<html><head><!-- <p>x</p><iframe> -->" +
      "<script>var a = \"<iframe src='no'></iframe><form><p>\";</script></head>" +
      "<body><p>one</p><P>two</P><iframe src=\"/y\"></iframe>" +
      "<form></form><a href=\"/l\">l</a></body></html>"
    val f = HtmlFeatures.features(html)
    assert(f == HtmlFeatures.Features(1, 1, 1, 2, 1))
  }

  test("html features: unterminated script consumes the tail, never throws") {
    val f = HtmlFeatures.features("<body><p>a</p><script>var x = '<p>ghost</p>'")
    assert(f.nP == 1 && f.nScript == 1)
    assert(HtmlFeatures.features(null) == HtmlFeatures.Features(0, 0, 0, 0, 0))
    assert(HtmlFeatures.features("<<<>>><p") == HtmlFeatures.Features(0, 0, 0, 0, 0))
  }

  test("routing formulas round-trip through synthesis + real parse") {
    val spark = graft.SparkSessionFixture.spark
    import spark.implicits._
    val out = HtmlFeatures.routing(Seq(0L, 3L, 7L, 11L).toDF("doc_id"))
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long, Long, Boolean)].collect().toSeq
    assert(out == Seq(
      (0L, 0L, 0L, 0L, 1L, 0L, false),
      (3L, 3L, 0L, 1L, 4L, 3L, false),
      (7L, 3L, 1L, 1L, 3L, 1L, false),
      (11L, 3L, 2L, 1L, 2L, 5L, true)))
  }
}
