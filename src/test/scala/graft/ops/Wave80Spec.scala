package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionFixture

/** Wave 80: hidden-text gate, soft-404 gate, chrome-phrase residue gate. */
class Wave80Spec extends AnyFunSuite {
  lazy val spark = SparkSessionFixture.spark
  import spark.implicits._

  test("HiddenText.scan: style forms, nesting, thresholds") {
    import graft.core.html.HiddenText
    // display:none with nested same-tag children counts the whole subtree
    val nested = HiddenText.scan(
      """<body><div style="display:none"><div>inner spam</div> outer spam</div>
        |<p>visible text here</p></body>""".stripMargin)
    assert(nested.nHiddenBlocks == 1 && nested.hiddenChars == 20)
    // opacity:0 hides; opacity:0.8 does NOT (the ';' normalization guard)
    assert(HiddenText.scan("""<p style="opacity: 0">x y z</p>""").hiddenChars == 5)
    assert(HiddenText.scan("""<p style="opacity: 0.8">x y z</p>""").hiddenChars == 0)
    // bare hidden attribute and aria-hidden both hide; script/style bodies
    // are not text
    assert(HiddenText.scan("""<div hidden>secret words</div>""").hiddenChars == 12)
    assert(HiddenText.scan("""<div aria-hidden="true">a b</div>""").hiddenChars == 3)
    assert(HiddenText.scan(
      "<body><script>var x = 1;</script><p>ok text</p></body>").totalChars == 7)
    // suspicious needs BOTH >= 50 chars and >= 10% ratio
    val tiny = HiddenText.scan("""<span style="display:none">menu</span><p>""" +
      ("long visible prose " * 10) + "</p>")
    assert(!tiny.suspicious)
  }

  test("Soft404.scan: title/body/thin gating") {
    import graft.core.html.Soft404
    val long = ("Plenty of ordinary editorial prose in this block to clear " +
      "the main-text length threshold comfortably. ") * 6
    // error title + thin body → soft404
    val s1 = Soft404.scan("<title>404 Not Found</title><body><p>The page you requested could not be found anywhere.</p></body>")
    assert(s1.titleMarker && s1.bodyMarker && s1.shortMain && s1.soft404)
    // long article mentioning the phrase survives
    val s2 = Soft404.scan(s"<title>Essay</title><body><p>$long A page not found screen frustrates.</p></body>")
    assert(!s2.titleMarker && s2.bodyMarker && !s2.shortMain && !s2.soft404)
    // error title alone on a long page survives
    val s3 = Soft404.scan(s"<title>Error budgets</title><body><p>$long</p></body>")
    assert(s3.titleMarker && !s3.bodyMarker && !s3.soft404)
  }

  test("boilerplatePhrases: family counts, integer occurrence arithmetic") {
    val rows = Seq(
      (1L, "We use cookies here. we use cookies twice. Accept all cookies."),
      (2L, "Share on Facebook! Back to top. Skip to content."),
      (3L, "Plain prose with privacy policy mentioned once only."),
      (4L, ""))
      .toDF("doc_id", "text")
    val out = TextStats.boilerplatePhrases(rows).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getBoolean(7))).toMap
    assert(out(1L) == ((3L, 0L, 0L, 0L, 0L, 3L, true)))  // 2× use + 1× accept
    assert(out(2L) == ((0L, 0L, 1L, 2L, 0L, 3L, true)))
    assert(out(3L) == ((0L, 0L, 0L, 0L, 1L, 1L, false))) // one footer phrase is fine
    assert(out(4L) == ((0L, 0L, 0L, 0L, 0L, 0L, false)))
  }
}
