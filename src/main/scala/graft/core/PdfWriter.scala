package graft.core

import scala.collection.mutable

/** Document writer — the `save`/`FPDF_SaveAsCopy` analog (reference
  * src/pypdfium2/_helpers/document.py:247-275) plus page-selection rewrite
  * covering `import_pages`/`arrange` (document.py import_pages; CLI arrange).
  *
  * Serializes the LIVE object graph (every object reachable from /Root and
  * /Info) to a classic-xref PDF: objects renumbered in discovery order,
  * stream payloads written with their original filters (parse-time
  * decryption means an encrypted source saves as a plain copy, like the
  * reference's save of a decrypted handle), object streams and xref streams
  * from the source are dissolved into top-level objects.
  *
  * [[writePages]] rebuilds a FLAT page tree from (document, pageIndex)
  * selections — duplicates and cross-document imports allowed — with
  * inheritable attributes materialized onto each copied page dict.
  */
object PdfWriter {

  /** Full-document copy: everything reachable from the trailer. */
  def write(doc: PdfDocument): Array[Byte] = {
    val w = new Writer
    val rootRef: PdfObject = doc.trailer("Root") match {
      case r: PdfRef => PdfRef(-1 - w.internOld(doc, r.num), 0)
      case _ => // repaired doc with inline root: make it a synthetic object
        PdfRef(-1 - w.internSynthetic(doc, doc.catalog), 0)
    }
    val infoRef: Option[PdfObject] = doc.trailer.get("Info").collect {
      case r: PdfRef => PdfRef(-1 - w.internOld(doc, r.num), 0)
    }
    w.assemble(rootRef, infoRef)
  }

  /** Page-selection copy: a new catalog + flat /Pages over the given
    * (source document, page index) list — `arrange` when one doc,
    * `import_pages` when several; indices may repeat. */
  def writePages(selection: Seq[(PdfDocument, Int)]): Array[Byte] = {
    val w = new Writer
    val pagesSlot = w.reserveSynthetic()
    val kidSlots = selection.map { case (doc, idx) =>
      val pg = doc.page(idx)
      val body = PdfDict(pg.effectiveDict.entries + ("Parent" -> PdfRef(-1 - pagesSlot, 0)))
      w.internSynthetic(doc, body)
    }
    w.fillSynthetic(pagesSlot, null, PdfDict(Map(
      "Type" -> PdfName("Pages"),
      "Kids" -> PdfArray(kidSlots.map(s => PdfRef(-1 - s, 0)).toVector),
      "Count" -> PdfNumber(selection.length))))
    val catalogSlot = w.internSynthetic(null, PdfDict(Map(
      "Type" -> PdfName("Catalog"),
      "Pages" -> PdfRef(-1 - pagesSlot, 0))))
    w.assemble(PdfRef(-1 - catalogSlot, 0), None)
  }

  /** imgtopdf analog (reference src/pypdfium2_cli/imgtopdf.py:29-62 +
    * _helpers/pageobjects.py PdfImage.load_jpeg/set_bitmap): wrap images
    * into a fresh PDF — one page per image, page size = pixel size in
    * points, content `w 0 0 h 0 0 cm /Img Do` (the reference's
    * set_matrix(scale(w,h))). JPEG payloads embed byte-identical behind
    * /DCTDecode (load_jpeg path); PNG/GIF/BMP are decoded via javax.imageio
    * and embedded as Flate raw RGB (the set_bitmap path). */
  def imagesToPdf(images: Seq[Array[Byte]]): Array[Byte] = {
    require(images.nonEmpty, "imagesToPdf needs at least one image")
    val w = new Writer
    val pagesSlot = w.reserveSynthetic()
    val kidSlots = images.map { bytes =>
      val (stream, wpx, hpx) = encodeImageXObject(bytes)
      val imgSlot = w.internSynthetic(null, stream)
      val content = s"q $wpx 0 0 $hpx 0 0 cm /Img Do Q"
        .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
      val cSlot = w.internSynthetic(null, PdfStream(PdfDict(Map.empty), content))
      w.internSynthetic(null, PdfDict(Map(
        "Type" -> PdfName("Page"),
        "Parent" -> PdfRef(-1 - pagesSlot, 0),
        "MediaBox" -> PdfArray(Vector(PdfNumber(0), PdfNumber(0), PdfNumber(wpx), PdfNumber(hpx))),
        "Resources" -> PdfDict(Map("XObject" -> PdfDict(Map("Img" -> PdfRef(-1 - imgSlot, 0))))),
        "Contents" -> PdfRef(-1 - cSlot, 0))))
    }
    w.fillSynthetic(pagesSlot, null, PdfDict(Map(
      "Type" -> PdfName("Pages"),
      "Kids" -> PdfArray(kidSlots.map(s => PdfRef(-1 - s, 0)).toVector),
      "Count" -> PdfNumber(images.length))))
    val catalogSlot = w.internSynthetic(null, PdfDict(Map(
      "Type" -> PdfName("Catalog"),
      "Pages" -> PdfRef(-1 - pagesSlot, 0))))
    w.assemble(PdfRef(-1 - catalogSlot, 0), None)
  }

  /** Image bytes → (image XObject stream, width px, height px). */
  private def encodeImageXObject(bytes: Array[Byte]): (PdfStream, Int, Int) = {
    val isJpeg = bytes.length >= 3 &&
      (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8 && (bytes(2) & 0xff) == 0xff
    if (isJpeg) {
      // SOFn frame header: dims + component count (1 gray, 3 YCbCr, 4 CMYK).
      // Marker walk per ITU T.81 §B.1.1: any number of 0xFF fill bytes may
      // precede a marker code, and standalone markers (TEM, RSTn) carry no
      // length segment — both occur in valid JPEGs (ADVICE r3 #3).
      var i = 2
      var dims: (Int, Int, Int) = null
      while (dims == null && i + 1 < bytes.length) {
        if ((bytes(i) & 0xff) != 0xff) throw new IllegalArgumentException("bad JPEG marker stream")
        // skip 0xFF fill bytes: the marker code is the first non-FF byte
        while (i + 1 < bytes.length && (bytes(i + 1) & 0xff) == 0xff) i += 1
        if (i + 1 >= bytes.length) throw new IllegalArgumentException("truncated JPEG marker stream")
        val marker = bytes(i + 1) & 0xff
        if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd9)) {
          // standalone marker (TEM/RSTn/SOI/EOI): no length field
          i += 2
        } else {
          if (i + 3 >= bytes.length) throw new IllegalArgumentException("truncated JPEG segment")
          val len = ((bytes(i + 2) & 0xff) << 8) | (bytes(i + 3) & 0xff)
          if (marker >= 0xc0 && marker <= 0xcf && marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
            if (i + 9 >= bytes.length) throw new IllegalArgumentException("truncated SOF segment")
            dims = (((bytes(i + 7) & 0xff) << 8) | (bytes(i + 8) & 0xff),
                    ((bytes(i + 5) & 0xff) << 8) | (bytes(i + 6) & 0xff),
                    bytes(i + 9) & 0xff)
          }
          i += 2 + len
        }
      }
      if (dims == null) throw new IllegalArgumentException("JPEG without SOF marker")
      val cs = dims._3 match {
        case 1 => "DeviceGray"; case 4 => "DeviceCMYK"; case _ => "DeviceRGB"
      }
      (PdfStream(PdfDict(Map(
        "Type" -> PdfName("XObject"), "Subtype" -> PdfName("Image"),
        "Width" -> PdfNumber(dims._1), "Height" -> PdfNumber(dims._2),
        "BitsPerComponent" -> PdfNumber(8), "ColorSpace" -> PdfName(cs),
        "Filter" -> PdfName("DCTDecode"))), bytes), dims._1, dims._2)
    } else {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) throw new IllegalArgumentException("unsupported image format")
      val (wpx, hpx) = (img.getWidth, img.getHeight)
      val rgb = new Array[Byte](wpx * hpx * 3)
      var y = 0
      while (y < hpx) {
        var x = 0
        while (x < wpx) {
          val p = img.getRGB(x, y)
          val o = (y * wpx + x) * 3
          rgb(o) = ((p >> 16) & 0xff).toByte
          rgb(o + 1) = ((p >> 8) & 0xff).toByte
          rgb(o + 2) = (p & 0xff).toByte
          x += 1
        }
        y += 1
      }
      (PdfStream(PdfDict(Map(
        "Type" -> PdfName("XObject"), "Subtype" -> PdfName("Image"),
        "Width" -> PdfNumber(wpx), "Height" -> PdfNumber(hpx),
        "BitsPerComponent" -> PdfNumber(8), "ColorSpace" -> PdfName("DeviceRGB"),
        "Filter" -> PdfName("FlateDecode"))), Filters.deflate(rgb)), wpx, hpx)
    }
  }

  // -------------------------------------------------------------------------

  /** Accumulates objects for one output file. Object ids during accumulation
    * are SLOTS (0-based); a PdfRef with num = -1-slot marks an internal
    * reference, rewritten to `slot+1 0 R` at assembly. Old-document refs are
    * interned per (doc, oldNum) so shared objects dedupe. */
  private final class Writer {
    private val slots = mutable.ArrayBuffer[(PdfDocument, PdfObject)]() // may hold null placeholders
    private val oldKey = mutable.HashMap[(PdfDocument, Int), Int]()

    def reserveSynthetic(): Int = { slots += ((null, null)); slots.length - 1 }
    def fillSynthetic(slot: Int, doc: PdfDocument, obj: PdfObject): Unit =
      slots(slot) = (doc, obj)
    def internSynthetic(doc: PdfDocument, obj: PdfObject): Int = {
      slots += ((doc, obj)); slots.length - 1
    }
    /** Intern an existing object of `doc` by its old number. */
    def internOld(doc: PdfDocument, num: Int): Int =
      oldKey.getOrElseUpdate((doc, num), {
        val slot = reserveSynthetic()
        slots(slot) = (doc, doc.getObject(num))
        slot
      })

    def assemble(rootRef: PdfObject, infoRef: Option[PdfObject]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream(1 << 16)
      def wr(s: String): Unit = out.write(s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
      wr("%PDF-1.7\n%âãÏÓ\n")
      // serialize breadth-first: serializing slot i can intern new slots
      val offsets = mutable.ArrayBuffer[Int]()
      var i = 0
      while (i < slots.length) {
        val (doc, obj) = slots(i)
        offsets += out.size()
        wr(s"${i + 1} 0 obj\n")
        ser(doc, obj, out)
        wr("\nendobj\n")
        i += 1
      }
      val xrefAt = out.size()
      wr(s"xref\n0 ${slots.length + 1}\n0000000000 65535 f \n")
      offsets.foreach(o => wr(f"$o%010d 00000 n \n"))
      val info = infoRef.map(r => { val b = new java.io.ByteArrayOutputStream(); ser(null, r, b); "/Info " + b.toString("ISO-8859-1") }).getOrElse("")
      val root = { val b = new java.io.ByteArrayOutputStream(); ser(null, rootRef, b); b.toString("ISO-8859-1") }
      wr(s"trailer\n<</Size ${slots.length + 1}/Root $root$info>>\nstartxref\n$xrefAt\n%%EOF\n")
      out.toByteArray
    }

    private def ser(doc: PdfDocument, obj: PdfObject, out: java.io.ByteArrayOutputStream): Unit = {
      def wr(s: String): Unit = out.write(s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
      obj match {
        case PdfNull | null => wr("null")
        case PdfBool(b) => wr(if (b) "true" else "false")
        case PdfNumber(v) =>
          if (v == v.toLong.toDouble && math.abs(v) < 1e15) wr(v.toLong.toString)
          else wr(new java.math.BigDecimal(v).round(new java.math.MathContext(12)).stripTrailingZeros.toPlainString)
        case PdfName(n) =>
          wr("/")
          n.foreach { c =>
            if (c > ' ' && c <= '~' && "()<>[]{}/%#".indexOf(c) < 0) wr(c.toString)
            else wr(f"#${c.toInt & 0xff}%02X")
          }
        case PdfString(bytes) => // hex form: binary-safe, escape-free
          wr("<"); bytes.foreach(b => wr(f"${b & 0xff}%02X")); wr(">")
        case PdfArray(items) =>
          wr("[")
          items.zipWithIndex.foreach { case (it, k) => if (k > 0) wr(" "); ser(doc, it, out) }
          wr("]")
        case PdfRef(num, _) =>
          val slot = if (num < 0) -1 - num else internOld(doc, num)
          wr(s"${slot + 1} 0 R")
        case d: PdfDict => serDict(doc, d, out)
        case PdfStream(d, raw) =>
          serDict(doc, PdfDict(d.entries + ("Length" -> PdfNumber(raw.length))), out)
          wr("\nstream\n")
          out.write(raw, 0, raw.length)
          wr("\nendstream")
      }
    }

    private def serDict(doc: PdfDocument, d: PdfDict, out: java.io.ByteArrayOutputStream): Unit = {
      def wr(s: String): Unit = out.write(s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
      wr("<<")
      // deterministic key order → byte-stable output for golden tests
      d.entries.toSeq.sortBy(_._1).foreach { case (k, v) =>
        ser(doc, PdfName(k), out); wr(" "); ser(doc, v, out)
      }
      wr(">>")
    }
  }
}
