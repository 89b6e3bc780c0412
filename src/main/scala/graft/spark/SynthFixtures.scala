package graft.spark

import graft.core.RawPdf

/** Deterministic synthesized fixtures for oracle-pinned queries that need
  * document structures absent from the reference corpus. */
object SynthFixtures {

  /** One page carrying every structure the reference's PdfUnspHandler
    * surface reports (unsupported.py:15; names internal/consts.py:149-166):
    * XFA AcroForm, catalog /Collection, shared-form XMP (adhocwf
    * workflowType 1 = acrobat), and the unsupported annotation subtypes —
    * plus a Screen annot with /IT/Img as the negative case (PDFium raises
    * Screen media only when /IT is absent or != Img). */
  lazy val unsupportedPdf: Array[Byte] = {
    val xmp =
      """<?xpacket begin="" id="W5M0MpCehiHzreSzNTczkc9d"?>
        |<x:xmpmeta xmlns:x="adobe:ns:meta/">
        | <rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#">
        |  <rdf:Description xmlns:adhocwf="http://ns.adobe.com/AcrobatAdhocWorkflow/1.0/">
        |   <adhocwf:workflowType>1</adhocwf:workflowType>
        |  </rdf:Description>
        | </rdf:RDF>
        |</x:xmpmeta>
        |<?xpacket end="w"?>""".stripMargin
    val xfa = "<xdp:xdp xmlns:xdp=\"http://ns.adobe.com/xdp/\"></xdp:xdp>"
    RawPdf.assemble(Seq(
      // 1 catalog
      "<</Type/Catalog/Pages 2 0 R/AcroForm 4 0 R/Collection<</Type/Collection>>/Metadata 5 0 R>>",
      // 2 pages
      "<</Type/Pages/Kids[3 0 R]/Count 1>>",
      // 3 page
      "<</Type/Page/Parent 2 0 R/MediaBox[0 0 200 200]" +
        "/Annots[6 0 R 7 0 R 8 0 R 9 0 R 10 0 R 11 0 R 12 0 R 13 0 R]>>",
      // 4 acroform with XFA
      "<</XFA 14 0 R/Fields[13 0 R]>>",
      // 5 XMP metadata
      s"<</Type/Metadata/Subtype/XML/Length ${xmp.length}>>\nstream\n$xmp\nendstream",
      // 6-13 annotations
      "<</Type/Annot/Subtype/3D/Rect[0 0 10 10]>>",
      "<</Type/Annot/Subtype/Movie/Rect[10 0 20 10]>>",
      "<</Type/Annot/Subtype/Sound/Rect[20 0 30 10]>>",
      "<</Type/Annot/Subtype/Screen/Rect[30 0 40 10]>>",
      "<</Type/Annot/Subtype/Screen/IT/Img/Rect[40 0 50 10]>>",
      "<</Type/Annot/Subtype/RichMedia/Rect[50 0 60 10]>>",
      "<</Type/Annot/Subtype/FileAttachment/Rect[60 0 70 10]>>",
      "<</Type/Annot/Subtype/Widget/FT/Sig/T(sig1)/Rect[70 0 80 10]>>",
      // 14 xfa payload
      s"<</Length ${xfa.length}>>\nstream\n$xfa\nendstream"))
  }
}
