package graft.core

/** Tagged-PDF logical structure (PDF 32000-1 §14.7-14.8): the catalog's
  * /StructTreeRoot → /K tree carries semantic roles (Document/H1/P/Figure/
  * Table/Span…), /Alt image descriptions and /ActualText replacement text —
  * the accessibility layer a training pipeline mines for figure captions,
  * reading order, and OCR-free alt text. The reference ships this surface
  * as PDFium's FPDF_StructTree_* API (raw ctypes bindings only; the helper
  * layer never wrapped it), so semantics here follow the PDF spec directly.
  *
  * Bounded typed walk: depth cap, node cap, and a visited set on indirect
  * reference numbers (a crafted /K cycle terminates instead of spinning;
  * StructTreeSpec pins that). /K shapes handled: struct-elem dict, MCID
  * integer, MCR dict (/Type/MCR), OBJR dict (counts as content, not a
  * node), and arrays of any of these. */
object StructTree {

  /** One structure element in DFS pre-order. `n_mcids` counts marked-content
    * references directly under the element (its content payload size). */
  final case class Node(idx: Int, depth: Int, sType: String, alt: String,
                        actualText: String, lang: String, nMcids: Int)

  def walk(doc: PdfDocument, maxDepth: Int = 64,
           maxNodes: Int = 10000): Vector[Node] = {
    val out = Vector.newBuilder[Node]
    val visited = scala.collection.mutable.Set[(Int, Int)]()
    var idx = 0

    def str(d: PdfDict, key: String): String = doc.get(d, key) match {
      case s: PdfString => s.asText
      case PdfName(n) => n
      case _ => ""
    }

    def visit(raw: PdfObject, depth: Int): Unit = {
      if (depth > maxDepth || idx >= maxNodes) return
      // cycle guard on the indirect ref, BEFORE resolving
      raw match {
        case PdfRef(n, g) =>
          if (visited.contains((n, g))) return
          visited += ((n, g))
        case _ =>
      }
      doc.resolve(raw) match {
        case PdfArray(items) => items.foreach(visit(_, depth))
        case d: PdfDict =>
          doc.get(d, "Type") match {
            case PdfName("MCR") | PdfName("OBJR") => // content refs, not nodes
            case _ =>
              val children = doc.get(d, "K") match {
                case PdfArray(items) => items
                case PdfNull => Vector.empty[PdfObject]
                case other => Vector(other)
              }
              val nMcids = children.count { c =>
                doc.resolve(c) match {
                  case _: PdfNumber => true
                  case cd: PdfDict => doc.get(cd, "Type") match {
                    case PdfName("MCR") | PdfName("OBJR") => true
                    case _ => false
                  }
                  case _ => false
                }
              }
              val sType = doc.get(d, "S") match { case PdfName(n) => n; case _ => "" }
              out += Node(idx, depth, sType, str(d, "Alt"),
                str(d, "ActualText"), str(d, "Lang"), nMcids)
              idx += 1
              children.foreach(visit(_, depth + 1))
          }
        case _ => // MCID integers and anything else: content, not a node
      }
    }

    doc.resolve(doc.catalog("StructTreeRoot")) match {
      case root: PdfDict => visit(root("K"), 0)
      case _ =>
    }
    out.result()
  }
}
