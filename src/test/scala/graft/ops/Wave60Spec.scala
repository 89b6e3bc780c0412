package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{Actions, PdfDates, PdfDocument, SynthPdf}
import graft.core.html.ImageCaptions

/** Wave 60: image–text pair mining, PDF action audit, PDF date parsing. */
class Wave60Spec extends AnyFunSuite {

  test("image captions: nesting, unclosed figure, srcless img, raw-text skip") {
    // nested figures: the img binds to its INNERMOST figure's caption
    val nested =
      """<figure><figcaption>outer cap</figcaption>
        |<figure><img src="in.png"><figcaption>inner cap</figcaption></figure>
        |<img src="out.png"></figure>""".stripMargin
    val rs = ImageCaptions.scan(nested)
    assert(rs.map(r => (r.src, r.caption)) ==
      Vector(("in.png", "inner cap"), ("out.png", "outer cap")))

    // unclosed figure at EOF still hands its caption over
    val unclosed = """<figure><img src="a.png"><figcaption>cap at eof</figcaption>"""
    assert(ImageCaptions.scan(unclosed).head.caption == "cap at eof")

    // srcless imgs don't emit and don't consume an ord
    val srcless = """<img alt="no src"><img src="b.png">"""
    val s2 = ImageCaptions.scan(srcless)
    assert(s2.length == 1 && s2.head.ord == 0 && s2.head.src == "b.png")

    // an <img> inside script text is not a tag
    val raw = """<script>var s = '<img src="fake.png">';</script><img src="real.png">"""
    assert(ImageCaptions.scan(raw).map(_.src) == Vector("real.png"))

    // figcaption text outside a figure is ignored; boilerplate depth nests
    val boiler = """<nav><header><img src="l.png" alt="x"></header></nav><img src="m.png">"""
    val b = ImageCaptions.scan(boiler)
    assert(b.map(r => (r.src, r.inBoilerplate)) ==
      Vector(("l.png", true), ("m.png", false)))
  }

  test("pdf dates: leap years, bounds, offsets, defaults") {
    def ep(s: String): Option[Long] = PdfDates.parse(s).map(_.epochSec)
    // leap-year Feb 29: valid in 2024, invalid in 2023
    assert(ep("D:20240229").isDefined)
    assert(ep("D:20230229").isEmpty)
    // century rule: 1900 not a leap year, 2000 is
    assert(ep("D:19000229").isEmpty)
    assert(ep("D:20000229").isDefined)
    // epoch zero and negative (pre-1970) instants
    assert(ep("D:19700101000000Z").contains(0L))
    assert(ep("D:19691231235959Z").contains(-1L))
    // offset sign: +02 is BEHIND utc epoch-wise
    val plus = PdfDates.parse("D:20220529190340+02'00'").get
    val zulu = PdfDates.parse("D:20220529190340Z").get
    assert(zulu.epochSec - plus.epochSec == 7200L)
    assert(plus.tzOffsetMin == 120)
    // unquoted offset minutes accepted
    assert(PdfDates.parse("D:20220101000000+0230").map(_.tzOffsetMin).contains(150))
    // truncated offset hour invalidates
    assert(PdfDates.parse("D:20220101000000+2").isEmpty)
    // month 13 / hour 24 / minute 60 invalidate
    assert(ep("D:20221301").isEmpty)
    assert(ep("D:20220101240000").isEmpty)
    assert(ep("D:20220101006000").isEmpty)
    // year 0000 invalid, bare minimal year valid
    assert(ep("D:0000").isEmpty)
    assert(ep("D:0001").isDefined)
  }

  test("action audit: self-referential /Next chain terminates and counts once") {
    val content = "BT /F1 12 Tf 50 700 Td (x) Tj ET"
    val pdf = SynthPdf.build(Vector(
      "<</Type/Catalog/Pages 2 0 R/OpenAction 6 0 R>>".getBytes,
      "<</Type/Pages/Kids[3 0 R]/Count 1>>".getBytes,
      ("<</Type/Page/Parent 2 0 R/MediaBox[0 0 612 792]" +
        "/Resources<</Font<</F1 4 0 R>>>>/Contents 5 0 R>>").getBytes,
      "<</Type/Font/Subtype/Type1/BaseFont/Helvetica>>".getBytes,
      (s"<</Length ${content.length}>>\nstream\n$content\nendstream").getBytes,
      "<</S/JavaScript/JS(loop\\(\\);)/Next 6 0 R>>".getBytes)) // self-loop
    val doc = PdfDocument.load(pdf, "").toOption.get
    val a = Actions.audit(doc)
    assert(a.nJs == 1 && a.hasJs && a.hasOpenAction)
  }

  test("action audit: planted fixture counts") {
    val doc = PdfDocument.load(SynthPdf.actionsPdf, "").toOption.get
    val a = Actions.audit(doc)
    assert(a.nJs == 2)      // OpenAction JS + names-tree JS
    assert(a.nNamed == 1)   // chained via /Next
    assert(a.nLaunch == 1)  // page /AA /O
    assert(a.nUri == 1)     // link annot
    assert(a.namesTreeJs == 1)
    assert(a.hasOpenAction && a.hasJs)
  }
}
