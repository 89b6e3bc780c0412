package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** PdfUnspHandler analog (reference unsupported.py:15; names
  * internal/consts.py:149-166): structural detection of the FPDF_UNSP_*
  * feature set, including the Screen /IT/Img negative sub-case. */
class UnsupportedSpec extends AnyFunSuite {

  private def fixture(name: String): Array[Byte] =
    java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"/root/reference/tests/resources/$name"))

  test("synthesized fixture raises every detectable code, in document order") {
    val doc = PdfDocument.load(graft.spark.SynthFixtures.unsupportedPdf).toOption.get
    assert(doc.unsupportedFeatures == Seq(
      "XFA form", "Portable collection", "Shared form (acrobat)",
      "3D annotation", "Movie annotation", "Sound annotation",
      "Screen media annotation", "Screen rich media annotation",
      "Attachment annotation", "Signature annotation"))
    // the fixture also exercises formType's XFA classification
    assert(doc.formType == "XFAForeground")
  }

  test("embedded files raise the doc-attachment code; plain docs raise nothing") {
    val att = PdfDocument.load(fixture("attachments.pdf")).toOption.get
    assert(att.unsupportedFeatures == Seq("Attachment (incomplete support)"))
    for (name <- Seq("forms.pdf", "text.pdf", "render.pdf")) {
      val doc = PdfDocument.load(fixture(name)).toOption.get
      assert(doc.unsupportedFeatures.isEmpty, name)
    }
  }

  test("screen annot with /IT/Img alone does not raise") {
    val pdf = RawPdf.assemble(Seq(
      "<</Type/Catalog/Pages 2 0 R>>",
      "<</Type/Pages/Kids[3 0 R]/Count 1>>",
      "<</Type/Page/Parent 2 0 R/MediaBox[0 0 100 100]/Annots[4 0 R]>>",
      "<</Type/Annot/Subtype/Screen/IT/Img/Rect[0 0 10 10]>>"))
    val doc = PdfDocument.load(pdf).toOption.get
    assert(doc.unsupportedFeatures.isEmpty)
  }

  test("shared-form workflowType variants map to the reference strings") {
    def docWithWf(n: Int): Seq[String] = {
      val xmp = s"""<rdf:Description xmlns:adhocwf="http://ns.adobe.com/AcrobatAdhocWorkflow/1.0/"><adhocwf:workflowType>$n</adhocwf:workflowType></rdf:Description>"""
      val pdf = RawPdf.assemble(Seq(
        "<</Type/Catalog/Pages 2 0 R/Metadata 4 0 R>>",
        "<</Type/Pages/Kids[3 0 R]/Count 1>>",
        "<</Type/Page/Parent 2 0 R/MediaBox[0 0 100 100]>>",
        s"<</Type/Metadata/Subtype/XML/Length ${xmp.length}>>\nstream\n$xmp\nendstream"))
      PdfDocument.load(pdf).toOption.get.unsupportedFeatures
    }
    assert(docWithWf(0) == Seq("Shared form (email)"))
    assert(docWithWf(1) == Seq("Shared form (acrobat)"))
    assert(docWithWf(2) == Seq("Shared form (filesystem)"))
  }
}
