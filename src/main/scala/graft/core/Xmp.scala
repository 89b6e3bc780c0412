package graft.core

/** XMP metadata packet extraction (PDF 32000-1 §14.3.2 metadata streams;
  * XMP = ISO 16684-1 RDF/XML): the catalog /Metadata stream carries Dublin
  * Core + XMP Basic + pdf: properties that frequently survive on web PDFs
  * whose /Info dict is empty or stripped — the extraction pipeline's
  * second chance at titles/authors/dates. The reference reaches document
  * metadata through the Info dict only (`_helpers/document.py:308-337`);
  * XMP is the pipeline-side complement, like the EXIF walker for images.
  *
  * Lenient bounded scanner, NOT an XML parser: tolerates namespace prefix
  * variance in spirit (fixed well-known prefixes), both RDF shapes —
  * element form (`<dc:title><rdf:Alt><rdf:li>T</rdf:li>...`) and
  * attribute form (`<rdf:Description pdf:Producer="X" ...>`) — flattens
  * rdf:Alt/Seq/Bag containers to "; "-joined item lists, decodes the five
  * XML entities + numeric references, never throws on garbage. */
object Xmp {

  /** The well-known properties worth carrying into a corpus table. */
  val Props: Vector[String] = Vector(
    "dc:title", "dc:creator", "dc:description", "dc:subject",
    "xmp:CreateDate", "xmp:ModifyDate", "xmp:CreatorTool",
    "pdf:Producer", "pdf:Keywords", "xmpMM:DocumentID",
    "pdfaid:part", "pdfaid:conformance")

  private val MaxPacket = 1 << 20 // bounded scan: 1 MiB of XMP is plenty

  /** Raw XMP packet bytes from the catalog /Metadata stream, if present. */
  def packet(doc: PdfDocument): Option[String] = {
    val bytes = doc.streamData(doc.catalog("Metadata"))
    if (bytes.isEmpty) None
    else Some(new String(bytes, 0, math.min(bytes.length, MaxPacket),
      java.nio.charset.StandardCharsets.UTF_8))
  }

  /** (prop, value) pairs found in the packet, in [[Props]] order; absent
    * properties are omitted. Malformed packets yield whatever scans. */
  def properties(xml: String): Vector[(String, String)] =
    Props.flatMap(p => property(xml, p).map(p -> _))

  def fromDocument(doc: PdfDocument): Vector[(String, String)] =
    packet(doc).map(properties).getOrElse(Vector.empty)

  private def property(xml: String, prop: String): Option[String] = {
    // element form: <prop ...> ... </prop>
    val open = xml.indexOf("<" + prop)
    if (open >= 0) {
      val gt = xml.indexOf('>', open)
      val close = xml.indexOf("</" + prop + ">", open)
      if (gt >= 0 && close > gt) {
        val inner = xml.substring(gt + 1, close)
        val items = liItems(inner)
        val v = if (items.nonEmpty) items.mkString("; ") else inner.trim
        return Some(decodeXml(stripTags(v).trim))
      }
      if (gt >= 0 && xml.charAt(gt - 1) == '/') return Some("") // <prop/>
    }
    // attribute form: prop="value" inside any tag
    val at = xml.indexOf(prop + "=")
    if (at >= 0 && at + prop.length + 1 < xml.length) {
      val q = xml.charAt(at + prop.length + 1)
      if (q == '"' || q == '\'') {
        val end = xml.indexOf(q, at + prop.length + 2)
        if (end >= 0) return Some(decodeXml(xml.substring(at + prop.length + 2, end)))
      }
    }
    None
  }

  /** rdf:li item texts inside a container block, container kind agnostic. */
  private def liItems(inner: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    var n = 0
    while (n < 64) { // bounded: no real Alt/Seq/Bag needs more
      val li = inner.indexOf("<rdf:li", i)
      if (li < 0) n = 64
      else {
        val gt = inner.indexOf('>', li)
        val close = inner.indexOf("</rdf:li>", li)
        if (gt < 0 || close < gt) n = 64
        else {
          out += inner.substring(gt + 1, close).trim
          i = close + 9
          n += 1
        }
      }
    }
    out.result().filter(_.nonEmpty)
  }

  private def stripTags(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var depth = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '<') depth += 1
      else if (c == '>') { if (depth > 0) depth -= 1 }
      else if (depth == 0) sb.append(c)
      i += 1
    }
    sb.toString
  }

  /** XML's five named entities + numeric character references. Kept
    * separate from html.HtmlExtract.decodeEntities ON PURPOSE: XMP is XML,
    * where `&copy;`-style HTML names are NOT entities and must pass
    * through verbatim — sharing the HTML decoder would over-decode. */
  private def decodeXml(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i)
        if (semi > i && semi - i <= 10) {
          val ent = s.substring(i + 1, semi)
          val rep: String = ent match {
            case "amp" => "&"
            case "lt" => "<"
            case "gt" => ">"
            case "quot" => "\""
            case "apos" => "'"
            case _ if ent.startsWith("#x") || ent.startsWith("#X") =>
              try new String(Character.toChars(Integer.parseInt(ent.drop(2), 16)))
              catch { case _: Exception => null }
            case _ if ent.startsWith("#") =>
              try new String(Character.toChars(Integer.parseInt(ent.drop(1))))
              catch { case _: Exception => null }
            case _ => null
          }
          if (rep != null) { sb.append(rep); i = semi + 1 }
          else { sb.append(c); i += 1 }
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }
}
