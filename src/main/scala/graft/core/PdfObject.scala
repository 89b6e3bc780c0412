package graft.core

/** PDF object model (PDF 32000-1:2008 §7.3).
  *
  * Semantics mirror the reference engine's data model (pypdfium2 wraps PDFium
  * handles; see /root/repo/SURVEY.md §1). All values are immutable; object
  * resolution (indirect references) happens lazily through [[PdfDocument]].
  */
sealed trait PdfObject

case object PdfNull extends PdfObject
final case class PdfBool(value: Boolean) extends PdfObject
final case class PdfNumber(value: Double) extends PdfObject {
  def toInt: Int = value.toInt
  def toLong: Long = value.toLong
}
/** String object; `bytes` are the raw (decrypted, unescaped) bytes. */
final case class PdfString(bytes: Array[Byte]) extends PdfObject {
  /** Text-string decode per PDF §7.9.2.2: UTF-16BE with BOM, else PDFDocEncoding
    * (approximated as Latin-1, which matches it for the printable range). */
  def asText: String =
    if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xfe && (bytes(1) & 0xff) == 0xff)
      new String(bytes, 2, bytes.length - 2, java.nio.charset.StandardCharsets.UTF_16BE)
    else if (bytes.length >= 3 && (bytes(0) & 0xff) == 0xef && (bytes(1) & 0xff) == 0xbb && (bytes(2) & 0xff) == 0xbf)
      new String(bytes, 3, bytes.length - 3, java.nio.charset.StandardCharsets.UTF_8)
    else new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
  override def toString: String = s"PdfString(${asText})"
}
final case class PdfName(name: String) extends PdfObject
final case class PdfArray(items: Vector[PdfObject]) extends PdfObject {
  def apply(i: Int): PdfObject = items(i)
  def length: Int = items.length
}
final case class PdfDict(entries: Map[String, PdfObject]) extends PdfObject {
  def get(key: String): Option[PdfObject] = entries.get(key)
  def apply(key: String): PdfObject = entries.getOrElse(key, PdfNull)
  def contains(key: String): Boolean = entries.contains(key)
}
object PdfDict { val empty: PdfDict = PdfDict(Map.empty) }
/** Indirect reference `num gen R`. */
final case class PdfRef(num: Int, gen: Int) extends PdfObject
/** Stream: dictionary + raw (still encoded) bytes; `decoded` applies filters.
  * Decryption is applied by the document loader before filters. */
final case class PdfStream(dict: PdfDict, raw: Array[Byte]) extends PdfObject
