package graft.spark

import graft.core.RawPdf

/** Deterministic synthesized fixtures for oracle-pinned queries that need
  * document structures absent from the reference corpus. */
object SynthFixtures {

  /** PDF/A-1b-declaring document: XMP pdfaid part/conformance, Tagged
    * (MarkInfo/Marked true), catalog /Lang, one OutputIntent — the
    * archival-grade routing positive for [[graft.core.Reports.conformance]]. */
  lazy val pdfaPdf: Array[Byte] = {
    val xmp =
      """<?xpacket begin="" id="W5M0MpCehiHzreSzNTczkc9d"?>
        |<x:xmpmeta xmlns:x="adobe:ns:meta/">
        | <rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#">
        |  <rdf:Description rdf:about="" xmlns:pdfaid="http://www.aiim.org/pdfa/ns/id/">
        |   <pdfaid:part>1</pdfaid:part>
        |   <pdfaid:conformance>B</pdfaid:conformance>
        |  </rdf:Description>
        | </rdf:RDF>
        |</x:xmpmeta>
        |<?xpacket end="w"?>""".stripMargin
    RawPdf.assemble(Seq(
      "<</Type/Catalog/Pages 2 0 R/Metadata 4 0 R/MarkInfo<</Marked true>>" +
        "/Lang(en-US)/OutputIntents[5 0 R]>>",
      "<</Type/Pages/Kids[3 0 R]/Count 1>>",
      "<</Type/Page/Parent 2 0 R/MediaBox[0 0 200 200]>>",
      s"<</Type/Metadata/Subtype/XML/Length ${xmp.length}>>\nstream\n$xmp\nendstream",
      "<</Type/OutputIntent/S/GTS_PDFA1/OutputConditionIdentifier(sRGB)>>"))
  }

  /** Tagged-only document (Marked true, no PDF/A claim, no /Lang). */
  lazy val taggedPdf: Array[Byte] = RawPdf.assemble(Seq(
    "<</Type/Catalog/Pages 2 0 R/MarkInfo<</Marked true>>>>",
    "<</Type/Pages/Kids[3 0 R]/Count 1>>",
    "<</Type/Page/Parent 2 0 R/MediaBox[0 0 200 200]>>"))

  /** Deterministic hostile corpus for the poison-audit query — each case
    * is a payload class a 10^12-row Common-Crawl scan WILL contain, and
    * each must come back as a clean (ok=false, errCode) row or a degraded
    * parse, NEVER a thrown Error, an OOM, or an executor death:
    *  - nest_bomb: 100k-deep `[[[[…` — without the Lexer nesting guard
    *    this is a StackOverflowError (an Error, invisible to
    *    catch-Exception) that kills the task and, retried, the job;
    *  - flate_bomb: 2 GB of zeros deflated to ~2 MB — without the decode
    *    cap this OOMs the shared executor JVM;
    *  - page_cycle: a /Pages tree whose Kids loops back to its root;
    *  - truncated_10/50/90: the same healthy doc cut at 10/50/90% —
    *    90% keeps enough xref to recover (ok with recovery), short cuts
    *    must fail cleanly;
    *  - no_header / garbage: not a PDF at all;
    *  - healthy: the uncorrupted control row. */
  lazy val poisonCorpus: Seq[(String, Array[Byte])] = {
    val healthy = graft.core.SynthPdf.multiPage(3)
    def truncated(pct: Int) = healthy.take(healthy.length * pct / 100)
    val nestBomb = {
      val sb = new StringBuilder("%PDF-1.7\n1 0 obj\n")
      sb.append("[" * 100000).append("]" * 100000)
      sb.append("\nendobj\ntrailer<</Root 1 0 R>>\n%%EOF")
      sb.toString.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    }
    val flateBomb = {
      // deflate 256 MB + 1 MiB of zeros in streaming windows (heap-light
      // to BUILD; the attack is on the decoder)
      val d = new java.util.zip.Deflater(9)
      val out = new java.io.ByteArrayOutputStream(1 << 20)
      val zeros = new Array[Byte](1 << 20)
      val buf = new Array[Byte](1 << 16)
      var fed = 0L
      val total = (1L << 28) + (1L << 20)
      while (fed < total) {
        d.setInput(zeros)
        while (!d.needsInput()) out.write(buf, 0, d.deflate(buf))
        fed += zeros.length
      }
      d.finish()
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end()
      val z = out.toByteArray
      graft.core.RawPdf.assemble(Seq(
        "<</Type/Catalog/Pages 2 0 R>>",
        "<</Type/Pages/Kids[3 0 R]/Count 1>>",
        "<</Type/Page/Parent 2 0 R/MediaBox[0 0 200 200]/Contents 4 0 R>>",
        s"<</Length ${z.length}/Filter/FlateDecode>>\nstream\n" +
          new String(z, java.nio.charset.StandardCharsets.ISO_8859_1) + "\nendstream"))
    }
    val pageCycle = graft.core.RawPdf.assemble(Seq(
      "<</Type/Catalog/Pages 2 0 R>>",
      "<</Type/Pages/Kids[3 0 R]/Count 2>>",
      "<</Type/Pages/Parent 2 0 R/Kids[2 0 R]/Count 1>>"))
    val arrayBomb = {
      // 5M-element flat array (~10 MB payload): parsed into boxed objects
      // it would be GBs of heap — the Lexer element cap must reject it
      val sb = new StringBuilder("%PDF-1.7\n1 0 obj\n[")
      var i = 0
      while (i < 5000000) { sb.append("0 "); i += 1 }
      sb.append("]\nendobj\ntrailer<</Root 1 0 R>>\n%%EOF")
      sb.toString.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    }
    Seq(
      "healthy" -> healthy,
      "truncated_90" -> truncated(90),
      "truncated_50" -> truncated(50),
      "truncated_10" -> truncated(10),
      "no_header" -> "this is not a pdf at all, just plain text".getBytes("UTF-8"),
      "garbage" -> Array.tabulate[Byte](4096)(i => ((i * 131 + 7) % 251).toByte),
      "nest_bomb" -> nestBomb,
      "array_bomb" -> arrayBomb,
      "flate_bomb" -> flateBomb,
      "page_cycle" -> pageCycle)
  }

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
