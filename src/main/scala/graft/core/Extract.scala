package graft.core

/** Document-level extraction results — the value-level mirror of the
  * reference's extract-text pipeline (src/pypdfium2_cli/extract_text.py) and
  * the struct shape consumed by the Spark layer (SURVEY.md §1.5). */
final case class PageText(pageIndex: Int, text: String, nChars: Int)

final case class DocExtract(
    ok: Boolean,
    errCode: String,
    errMsg: String,
    nPages: Int,
    pages: Vector[PageText]) {

  /** CLI-equivalent report: "# Page N" headers + page text, CRLF→LF
    * normalized exactly like the reference test (tests/test_cli.py:122-124). */
  def cliReport: String =
    pages.map(p => s"# Page ${p.pageIndex + 1}\n" + p.text.replace("\r\n", "\n"))
      .mkString("", "\n\n", "\n")

  def fullText: String = pages.map(_.text).mkString("\r\n")
}

object Extract {

  /** Parse + extract all page texts from raw bytes. Never throws: failures
    * become (ok=false, errCode, ...) rows (misc.py:7-21 error-model analog). */
  def extractText(bytes: Array[Byte], password: String = ""): DocExtract =
    PdfDocument.load(bytes, password) match {
      case Left(err) => DocExtract(ok = false, err.code, err.msg, 0, Vector.empty)
      case Right(doc) =>
        try {
          val pages = doc.pages.zipWithIndex.map { case (p, i) =>
            val tp = p.textPage
            PageText(i, tp.text, tp.countChars)
          }
          DocExtract(ok = true, "", "", pages.length, pages)
        } catch {
          case e: Exception =>
            DocExtract(ok = false, ErrCodes.Unknown, s"${e.getClass.getSimpleName}: ${e.getMessage}", 0, Vector.empty)
        }
    }
}
