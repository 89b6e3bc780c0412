package graft.core

/** Digital-signature presence + ByteRange coverage (PDF 32000-1 §12.8):
  * the structural half of signature validation a corpus pipeline can do
  * without certificates — does each signature's /ByteRange cover the whole
  * file, and were bytes APPENDED after signing (the incremental-update
  * tamper channel [[graft.ops.PdfCompose.revisionReport]] exposes)?
  * Cryptographic verification of /Contents is out of scope by design
  * (no trust store in a data pipeline); coverage + trailing-byte deltas
  * are the curation/forensics signal. */
object Signatures {

  final case class SigInfo(
      fieldName: String,
      subFilter: String,
      signerName: String,
      signDate: String,
      byteRange: Vector[Long],
      /** ranges are [0, a+b) ∪ [c, c+d) with c+d == file length — nothing
        * outside the /Contents hole escapes the digest */
      coversFile: Boolean,
      /** bytes past the signed span — >0 means content was appended AFTER
        * signing (a later revision; pair with revisionReport) */
      trailingBytes: Long)

  def scan(doc: PdfDocument, fileLen: Long): Vector[SigInfo] = {
    val out = Vector.newBuilder[SigInfo]
    def str(d: PdfDict, k: String): String = doc.get(d, k) match {
      case s: PdfString => s.asText
      case PdfName(n) => n
      case _ => ""
    }
    def walkField(raw: PdfObject, depth: Int): Unit = {
      if (depth > 15) return
      doc.resolve(raw) match {
        case f: PdfDict =>
          val isSig = doc.get(f, "FT") == PdfName("Sig")
          if (isSig) doc.get(f, "V") match {
            case v: PdfDict =>
              val br = doc.get(v, "ByteRange") match {
                case PdfArray(items) => items.flatMap(o => doc.resolve(o) match {
                  case PdfNumber(x) => Some(x.toLong)
                  case _ => None
                })
                case _ => Vector.empty[Long]
              }
              // the digest hole [a+b, c) must be EXACTLY the /Contents hex
              // string (plus a little whitespace slack) — a hole anywhere
              // else, or wider than the signature blob, means unsigned
              // bytes the audit must not certify (a crafted
              // ByteRange [0, 16, len-16, 16] "covers" nothing)
              val contentsHexLen = doc.get(v, "Contents") match {
                case s: PdfString => 2L * s.bytes.length + 2L // <…hex…>
                case _ => -1L
              }
              val holeLen = if (br.length == 4) br(2) - (br(0) + br(1)) else -1L
              val covers = br.length == 4 && br(0) == 0L && br(1) > 0L &&
                br(0) + br(1) <= br(2) && br(2) + br(3) == fileLen &&
                contentsHexLen > 0 && holeLen >= contentsHexLen &&
                holeLen <= contentsHexLen + 16L
              val trailing = if (br.length == 4) fileLen - (br(2) + br(3)) else -1L
              out += SigInfo(str(f, "T"), str(v, "SubFilter"), str(v, "Name"),
                str(v, "M"), br, covers, trailing)
            case _ => // unsigned signature field: no /V
          }
          doc.resolve(f("Kids")) match {
            case PdfArray(kids) => kids.foreach(walkField(_, depth + 1))
            case _ =>
          }
        case _ =>
      }
    }
    doc.resolve(doc.catalog("AcroForm")) match {
      case af: PdfDict => doc.resolve(af("Fields")) match {
        case PdfArray(fields) => fields.foreach(walkField(_, 0))
        case _ =>
      }
      case _ =>
    }
    out.result()
  }
}
