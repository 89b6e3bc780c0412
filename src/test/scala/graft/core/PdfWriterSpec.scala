package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Writer round trips: a saved copy must re-load through our own parser and
  * yield byte-identical extracted text — the strongest in-repo invariant for
  * save/arrange/import semantics (reference document.py:247-275 save,
  * import_pages; arrange CLI). */
class PdfWriterSpec extends AnyFunSuite {

  private def fixture(name: String): Array[Byte] =
    java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"/root/reference/tests/resources/$name"))

  private def texts(bytes: Array[Byte], pw: String = ""): Vector[String] = {
    val ex = Extract.extractText(bytes, pw)
    assert(ex.ok, s"extract failed: ${ex.errCode} ${ex.errMsg}")
    ex.pages.map(_.text).toVector
  }

  test("save copy: every text fixture round-trips byte-identical text") {
    Seq("text.pdf", "multipage.pdf", "toc.pdf", "attachments.pdf",
      "render.pdf", "images.pdf", "forms.pdf").foreach { f =>
      val orig = fixture(f)
      val doc = PdfDocument.load(orig).toOption.get
      val saved = PdfWriter.write(doc)
      assert(texts(saved) == texts(orig), s"$f text changed through save")
    }
  }

  test("save copy of an encrypted doc opens without a password (decrypted copy)") {
    val orig = fixture("encrypted.pdf")
    val doc = PdfDocument.load(orig, "test_user").toOption.get
    val saved = PdfWriter.write(doc)
    assert(texts(saved) == texts(orig, "test_user"))
  }

  test("saved copy preserves metadata, TOC, and attachments") {
    val doc = PdfDocument.load(fixture("toc.pdf")).toOption.get
    val saved = PdfDocument.load(PdfWriter.write(doc)).toOption.get
    assert(saved.toc().map(e => (e.level, e.title)) == doc.toc().map(e => (e.level, e.title)))
    val adoc = PdfDocument.load(fixture("attachments.pdf")).toOption.get
    val asaved = PdfDocument.load(PdfWriter.write(adoc)).toOption.get
    assert(asaved.attachments.map(_.name) == adoc.attachments.map(_.name))
  }

  test("writePages: reverse + duplicate arrangement re-reads in that order") {
    val doc = PdfDocument.load(fixture("multipage.pdf")).toOption.get
    val n = doc.pageCount
    assert(n >= 3)
    val order = Seq(n - 1, 0, 0, 1) // reverse-ish with a duplicate
    val out = PdfWriter.writePages(order.map(i => (doc, i)))
    val origTexts = texts(fixture("multipage.pdf"))
    assert(texts(out) == order.map(origTexts).toVector)
  }

  test("writePages: cross-document import concatenates pages from two docs") {
    val a = PdfDocument.load(fixture("text.pdf")).toOption.get
    val b = PdfDocument.load(fixture("multipage.pdf")).toOption.get
    val out = PdfWriter.writePages(Seq((a, 0), (b, 0), (a, 0)))
    val ta = texts(fixture("text.pdf"))
    val tb = texts(fixture("multipage.pdf"))
    assert(texts(out) == Vector(ta(0), tb(0), ta(0)))
  }

  test("writer output is deterministic (byte-identical across runs)") {
    val doc1 = PdfDocument.load(fixture("text.pdf")).toOption.get
    val doc2 = PdfDocument.load(fixture("text.pdf")).toOption.get
    assert(java.util.Arrays.equals(PdfWriter.write(doc1), PdfWriter.write(doc2)))
  }
}
