package graft.core

/** Embedded-image byte extraction with the reference's "smart" decision tree
  * (pageobjects.py:543-659): DCT/JPX payloads pass through byte-identically
  * after applying any SIMPLE prefilters (tested byte-identical round trip,
  * tests/test_cli.py:108-119); everything else is returned as the decoded
  * (or raw codec) bytes with format "raw" — the re-encode branch of the
  * reference rasterizes via PDFium, which is out of the extraction scope. */
object ImageExtract {

  final case class ExtractedImage(
      name: String,
      format: String, // jpg | jp2 | raw
      data: Array[Byte],
      width: Int,
      height: Int)

  def pageImages(page: PdfPage, maxDepth: Int = 2): Vector[ExtractedImage] = {
    val doc = page.doc
    val out = Vector.newBuilder[ExtractedImage]
    def walk(resources: PdfDict, depth: Int): Unit = {
      if (depth > maxDepth) return
      doc.resolve(resources("XObject")) match {
        case xobjs: PdfDict =>
          xobjs.entries.toSeq.sortBy(_._1).foreach { case (name, ref) =>
            doc.resolve(ref) match {
              case s @ PdfStream(xd, _) =>
                doc.resolve(xd("Subtype")) match {
                  case PdfName("Image") =>
                    val w = doc.resolve(xd("Width")) match { case PdfNumber(v) => v.toInt; case _ => 0 }
                    val h = doc.resolve(xd("Height")) match { case PdfNumber(v) => v.toInt; case _ => 0 }
                    val filters = Filters.filterNames(xd, doc.resolve)
                    // decode applies simple prefilters and stops at the
                    // terminal codec, leaving its payload byte-identical
                    val codecData = doc.streamData(s)
                    val (format, data) = filters.lastOption match {
                      case Some("DCTDecode") | Some("DCT") => ("jpg", codecData)
                      case Some("JPXDecode") => ("jp2", codecData)
                      case Some("CCITTFaxDecode") | Some("CCF") =>
                        // smart-path decode branch (pageobjects.py:543-659):
                        // CCITT G3/G4 → packed 1bpp pixel rows
                        val parms = Filters.terminalFilter(xd, doc.resolve).map(_._2).getOrElse(PdfDict.empty)
                        try ("pix", Ccitt.decodeFilter(codecData, parms, doc.resolve))
                        catch { case _: Exception => ("raw", codecData) }
                      case _ => ("raw", codecData)
                    }
                    out += ExtractedImage(name, format, data, w, h)
                  case PdfName("Form") =>
                    doc.resolve(xd("Resources")) match {
                      case rd: PdfDict => walk(rd, depth + 1)
                      case _ => ()
                    }
                  case _ => ()
                }
              case _ => ()
            }
          }
        case _ => ()
      }
    }
    walk(page.resources, 0)
    out.result()
  }
}
