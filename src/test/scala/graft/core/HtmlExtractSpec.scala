package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.core.html.HtmlExtract

class HtmlExtractSpec extends AnyFunSuite {

  val page: String =
    """<!DOCTYPE html>
      |<html lang="en">
      |<head>
      |  <title>The Article &amp; Its Title</title>
      |  <meta name="description" content="A test page about extraction.">
      |  <style>body { color: red; } .x { content: "<p>not text</p>"; }</style>
      |  <script>if (a < b) { document.write("<div>junk</div>"); }</script>
      |</head>
      |<body>
      |  <header><h1>Site Banner</h1><p>A long tagline repeated on every single page of the site.</p></header>
      |  <nav><ul>
      |    <li><a href="/">Home</a></li><li><a href="/about">About us and the team</a></li>
      |  </ul></nav>
      |  <main>
      |    <article>
      |      <h2>The Article</h2>
      |      <p>This is the first paragraph of the main content, which is long
      |         enough to pass the minimum block length filter easily.</p>
      |      <p>Second paragraph with an <a href="x">inline link</a> inside it,
      |         but mostly plain prose so the link density stays low.</p>
      |      <p>Short.</p>
      |      <p>R&eacute;sum&eacute; &mdash; entities &#8230; and &#x2713; decoded.
      |         This sentence pads the block over the length threshold.</p>
      |    </article>
      |  </main>
      |  <aside><p>Related links and other sidebar junk that is fairly long too.</p></aside>
      |  <footer><p>Copyright notice and footer boilerplate text that is long.</p></footer>
      |</body></html>""".stripMargin

  lazy val doc = HtmlExtract.parseString(page)

  test("title / lang / meta description") {
    assert(doc.title == "The Article & Its Title")
    assert(doc.lang == "en")
    assert(doc.description == "A test page about extraction.")
  }

  test("script/style content never leaks into text") {
    assert(!doc.allText.contains("document.write"))
    assert(!doc.allText.contains("color: red"))
    assert(!doc.allText.contains("not text"))
  }

  test("boilerplate containers stripped from main text") {
    val main = doc.mainText()
    assert(!main.contains("Site Banner"))
    assert(!main.contains("tagline"))
    assert(!main.contains("About us"))
    assert(!main.contains("sidebar"))
    assert(!main.contains("Copyright"))
  }

  test("main content survives with entities decoded") {
    val main = doc.mainText()
    assert(main.contains("first paragraph of the main content"))
    assert(main.contains("link density stays low"))
    assert(main.contains("Résumé — entities … and ✓ decoded."))
    assert(!main.contains("Short.")) // below min block length
  }

  test("link-dense blocks are dropped") {
    val navBlock = doc.blocks.find(_.text.contains("About us"))
    assert(navBlock.exists(_.linkDensity > 0.33) || navBlock.exists(_.inBoilerplateContainer))
  }

  test("extractAny routes html payloads") {
    val r = Extract.extractAny(page.getBytes("UTF-8"))
    assert(r.ok && r.nPages == 1)
    assert(r.pages.head.text.contains("first paragraph"))
    // and PDFs still route to the PDF parser
    val pdf = Extract.extractAny(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/tests/resources/text.pdf")))
    assert(pdf.ok && pdf.nPages == 2)
  }

  test("declared meta charset is honored (windows-1252 smart quote)") {
    val html = ("<html><head><meta charset=\"windows-1252\"></head><body>" +
      "<p>A block with a “smart quote” long enough to pass filters fine.</p></body></html>")
      .getBytes(java.nio.charset.Charset.forName("windows-1252"))
    val doc = HtmlExtract.parse(html)
    assert(doc.mainText().contains("“smart quote”"), doc.mainText())
  }

  test("malformed html does not throw") {
    val r = Extract.extractAny("<html><body><p>unclosed".getBytes("UTF-8"))
    assert(r.ok)
    val r2 = Extract.extractAny("<html><<<>>&#xZZ; <p>ok</p>".getBytes("UTF-8"))
    assert(r2.ok)
  }
}
