package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Malformed-web-PDF robustness (SURVEY.md §7.4 item 3): PDFium reconstructs
  * broken xrefs by scanning for object headers; these tests corrupt a valid
  * fixture in the classic ways and require full recovery (same 438-char
  * page-1 extraction). */
class RecoverySpec extends AnyFunSuite {

  val clean: Array[Byte] = java.nio.file.Files.readAllBytes(
    java.nio.file.Paths.get("/root/reference/tests/resources/text.pdf"))

  private def assertRecovered(bytes: Array[Byte], hint: String): Unit = {
    val r = Extract.extractText(bytes)
    assert(r.ok, s"$hint: ${r.errCode} ${r.errMsg}")
    assert(r.nPages == 2, s"$hint: pages=${r.nPages}")
    assert(r.pages.head.nChars == 438, s"$hint: chars=${r.pages.head.nChars}")
  }

  test("garbage startxref offset → reconstruction") {
    val s = new String(clean, java.nio.charset.StandardCharsets.ISO_8859_1)
    val idx = s.lastIndexOf("startxref")
    val mangled = s.substring(0, idx) + "startxref\n999999999\n%%EOF\n"
    assertRecovered(mangled.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1), "garbage startxref")
  }

  test("writer over a RECOVERED document: save never throws, copy re-extracts") {
    // web-scale save path: a reconstructed (linear-scanned) document must
    // serialize to a clean classic-xref copy that round-trips
    val s = new String(clean, java.nio.charset.StandardCharsets.ISO_8859_1)
    val idx = s.lastIndexOf("startxref")
    val mangled = (s.substring(0, idx) + "startxref\n999999999\n%%EOF\n")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val doc = PdfDocument.load(mangled).toOption.get
    val saved = PdfWriter.write(doc)
    assertRecovered(saved, "saved copy of recovered doc")
    // and the copy now parses through the NORMAL xref path (no recovery)
    val re = PdfDocument.load(saved).toOption.get
    assert(re.pageCount == 2)
  }

  test("leading junk shifts all offsets → reconstruction") {
    val junk = "<!-- proxy noise -->\n".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val shifted = junk ++ clean
    assertRecovered(shifted, "leading junk")
  }

  test("truncated tail (no %%EOF / xref) → reconstruction") {
    // cut the classic xref table + trailer + startxref entirely
    val s = new String(clean, java.nio.charset.StandardCharsets.ISO_8859_1)
    val xrefAt = s.lastIndexOf("\nxref")
    val cut = java.util.Arrays.copyOf(clean, xrefAt)
    assertRecovered(cut, "truncated tail")
  }

  test("zeroed xref offsets → reconstruction") {
    val s = new String(clean, java.nio.charset.StandardCharsets.ISO_8859_1)
    val xrefAt = s.lastIndexOf("\nxref")
    val trailerAt = s.indexOf("trailer", xrefAt)
    val zeroed = s.substring(0, xrefAt) + "\nxref\n0 1\n0000000000 65535 f \n" +
      s.substring(trailerAt)
    assertRecovered(zeroed.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1), "zeroed xref")
  }
}
