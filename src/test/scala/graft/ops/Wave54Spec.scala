package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionFixture
import graft.spark.PageRow

/** Wave 54: HTML heading outline, license-marker gate, readability. */
class Wave54Spec extends AnyFunSuite {

  lazy val spark = SparkSessionFixture.spark
  import spark.implicits._

  private val ts = java.sql.Timestamp.valueOf("2020-01-01 00:00:00")

  test("html outline: levels, order, nav flag, entity decode, case-insensitive tags") {
    val o1 =
      """<html><body><h1>Main Title &amp; More</h1><p>intro text</p>
        |<h2>Background</h2><p>body</p>
        |<nav><h2>Site Menu</h2></nav>
        |<h3>Details</h3></body></html>""".stripMargin
    val o2 = """<html><body><H2 class="x">Upper Case</H2><p>t</p></body></html>"""
    val rows = Seq(
      PageRow("a", ts, o1.getBytes("UTF-8"), null, "en"),
      PageRow("b", ts, o2.getBytes("UTF-8"), null, "en"),
      PageRow("c", ts, "<html><body><p>none</p></body></html>".getBytes("UTF-8"), null, "en"))
    val rs = HtmlMeta.outline(spark.createDataset(rows)).collect()
    info(rs.mkString("\n"))
    val a = rs.filter(_.url == "a").sortBy(_.ord)
    assert(a.map(r => (r.level, r.in_boilerplate, r.text)).toSeq == Seq(
      (1L, false, "Main Title & More"),
      (2L, false, "Background"),
      (2L, true, "Site Menu"),
      (3L, false, "Details")))
    val b = rs.filter(_.url == "b")
    assert(b.map(r => (r.level, r.text)).toSeq == Seq((2L, "Upper Case")))
    assert(!rs.exists(_.url == "c"))
  }

  test("robots meta: tokenization, 'none' expansion, restrictive union, malformed safety") {
    def page(u: String, h: String) = PageRow(u, ts, h.getBytes("UTF-8"), null, "en")
    val rows = Seq(
      page("a", """<meta name="robots" content="NOINDEX , NoFollow">"""),
      page("b", """<meta content="noindex" name="robots">"""),      // attr order
      page("c", """<meta name="robots">"""),                        // no content
      page("d", """<meta name="robotsx" content="noindex">"""),     // not robots
      page("e", "<meta"))                                           // truncated
    val rs = HtmlMeta.robotsMeta(spark.createDataset(rows)).collect()
      .map(r => r.url -> ((r.has_robots_meta, r.noindex, r.nofollow))).toMap
    assert(rs("a") == ((true, true, true)))
    assert(rs("b") == ((true, true, false)))
    assert(rs("c") == ((true, false, false)))
    assert(rs("d") == ((false, false, false)))
    assert(rs("e") == ((false, false, false)))
  }

  test("pdf link anchor: synthetic fixture's anchor text differs from its URI") {
    val doc = graft.core.PdfDocument.load(graft.core.SynthPdf.linkPdf, "").toOption.get
    val p = doc.pages.head
    val Vector((sub, r, uri)) = p.annotationInfos
    assert(sub == "Link" && uri == "https://t.example/x")
    val anchor = p.textPage.textBounded(Some(r.left), Some(r.bottom),
      Some(r.right), Some(r.top)).trim
    assert(anchor == "click here for details")
    // the unlinked line stays outside the rect
    assert(!anchor.contains("unlinked"))
  }

  test("html markdown: headings, list items, paragraphs; nav drops") {
    val h =
      """<html><body><h1>Guide &amp; Notes</h1><p>intro paragraph</p>
        |<ul><li>first item</li><li>second item</li></ul>
        |<nav><p>menu junk</p></nav>
        |<h2>Part</h2><p>closing text</p></body></html>""".stripMargin
    val md = HtmlMeta.markdownOf(graft.core.html.HtmlExtract.parseString(h))
    info("---\n" + md + "\n---")
    assert(md ==
      """# Guide & Notes
        |
        |intro paragraph
        |
        |- first item
        |
        |- second item
        |
        |## Part
        |
        |closing text""".stripMargin)
  }

  test("license gate: planted markers classify; unmarked docs keep") {
    val docs = Seq(
      (0L, "plain words"),  // %11==0 -> cc
      (1L, "plain words"),  // arr
      (2L, "plain words"),  // pd
      (3L, "plain words")   // unmarked
    ).toDF("doc_id", "text")
    val rs = TextStats.licenseFilter(TextStats.corpusWithLicenses(docs))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Boolean]("has_cc"), r.getAs[Boolean]("has_arr"),
          r.getAs[Boolean]("has_pd"), r.getAs[String]("license_class"),
          r.getAs[Boolean]("keep")))).toMap
    assert(rs(0L) == ((true, false, false, "permissive", true)))
    assert(rs(1L) == ((false, true, false, "restricted", false)))
    assert(rs(2L) == ((false, false, true, "permissive", true)))
    assert(rs(3L) == ((false, false, false, "unmarked", true)))
  }

  test("readability: hand-computed integer flesch on a known doc") {
    // 2 sentences, 6 tokens, syllable groups counted by vowel runs
    val docs = Seq((0L, "the scan runs. joins merge fast.")).toDF("doc_id", "text")
    val r = TextStats.readability(docs).collect().head
    assert(r.getAs[Long]("n_sentences") == 2L)
    assert(r.getAs[Long]("n_tokens") == 6L)
    // vowel groups: the(1: e) scan(1: a) runs(1: u) joins(2: oi..no: 'joins'
    // = oi -> 1) merge(2: e, e) fast(1: a) -> 1+1+1+1+2+1 = 7
    assert(r.getAs[Long]("n_syllables") == 7L)
    // flesch_x1000 = 206835 - (1015*6) div 2 - (84600*7) div 6
    //             = 206835 - 3045 - 98700 = 105090
    assert(r.getAs[Long]("flesch_x1000") == 105090L)
    assert(r.getAs[String]("band") == "easy")
  }

  test("readability: degenerate docs are zero, not errors") {
    val docs = Seq((0L, ""), (1L, "...")).toDF("doc_id", "text")
    val rs = TextStats.readability(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("flesch_x1000")).toMap
    assert(rs == Map(0L -> 0L, 1L -> 0L))
  }
}
