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
    * references directly under the element (its content payload size,
    * OBJR included); `mcids` is the ORDERED list of (pageIdx, mcid) pairs
    * (bare integers inherit the element's effective /Pg, MCR dicts may
    * override it) \u2014 MCIDs are PER-PAGE (\u00a714.7.5.3), so multi-page
    * documents need the page key or logical assembly would collide across
    * pages. pageIdx is -1 when /Pg is absent or unresolvable (single-page
    * docs commonly omit it; readers treat -1 as page 0). */
  final case class Node(idx: Int, depth: Int, sType: String, alt: String,
                        actualText: String, lang: String, nMcids: Int,
                        mcids: Vector[(Int, Int)] = Vector.empty)

  def walk(doc: PdfDocument, maxDepth: Int = 64,
           maxNodes: Int = 10000): Vector[Node] = {
    val out = Vector.newBuilder[Node]
    val visited = scala.collection.mutable.Set[(Int, Int)]()
    var idx = 0
    // /Pg ref -> page index, by resolved-dict identity (stable via the
    // document object cache)
    lazy val pageDicts: Vector[PdfDict] =
      (0 until doc.pageCount).map(doc.page(_).dict).toVector
    def pageIdxOf(raw: PdfObject): Int = doc.resolve(raw) match {
      case d: PdfDict => pageDicts.indexWhere(_ eq d)
      case _ => -1
    }

    def str(d: PdfDict, key: String): String = doc.get(d, key) match {
      case s: PdfString => s.asText
      case PdfName(n) => n
      case _ => ""
    }

    def visit(raw: PdfObject, depth: Int, inheritedPg: Int): Unit = {
      if (depth > maxDepth || idx >= maxNodes) return
      // cycle guard on the indirect ref, BEFORE resolving
      raw match {
        case PdfRef(n, g) =>
          if (visited.contains((n, g))) return
          visited += ((n, g))
        case _ =>
      }
      doc.resolve(raw) match {
        case PdfArray(items) => items.foreach(visit(_, depth, inheritedPg))
        case d: PdfDict =>
          doc.get(d, "Type") match {
            case PdfName("MCR") | PdfName("OBJR") => // content refs, not nodes
            case _ =>
              val children = doc.get(d, "K") match {
                case PdfArray(items) => items
                case PdfNull => Vector.empty[PdfObject]
                case other => Vector(other)
              }
              val pg = if (d.contains("Pg")) pageIdxOf(d("Pg")) else inheritedPg
              var nMcids = 0
              val mcids = Vector.newBuilder[(Int, Int)]
              children.foreach { c =>
                doc.resolve(c) match {
                  case PdfNumber(v) => nMcids += 1; mcids += ((pg, v.toInt))
                  case cd: PdfDict => doc.get(cd, "Type") match {
                    case PdfName("MCR") =>
                      nMcids += 1
                      val mcrPg = if (cd.contains("Pg")) pageIdxOf(cd("Pg")) else pg
                      doc.get(cd, "MCID") match {
                        case PdfNumber(v) => mcids += ((mcrPg, v.toInt))
                        case _ =>
                      }
                    case PdfName("OBJR") => nMcids += 1
                    case _ =>
                  }
                  case _ =>
                }
              }
              val sType = doc.get(d, "S") match { case PdfName(n) => n; case _ => "" }
              out += Node(idx, depth, sType, str(d, "Alt"),
                str(d, "ActualText"), str(d, "Lang"), nMcids, mcids.result())
              idx += 1
              children.foreach(visit(_, depth + 1, pg))
          }
        case _ => // MCID integers and anything else: content, not a node
      }
    }

    doc.resolve(doc.catalog("StructTreeRoot")) match {
      case root: PdfDict => visit(root("K"), 0, -1)
      case _ =>
    }
    out.result()
  }

  /** Logical-reading-order text (PDF 32000-1 §14.8.2.5): the DFS mcid
    * sequence keys into the page's marked show-text runs — a node's text
    * is its /ActualText replacement when present (§14.9.4), else its
    * mcids' runs in content order; nonempty node texts join with "\n".
    * Multi-column and sidebar layouts read logically even when the content
    * stream interleaves columns. Untagged docs return None — callers fall
    * back to content/geometry order (the extractText default). */
  def readingOrderText(doc: PdfDocument): Option[String] = {
    val nodes = walk(doc)
    if (nodes.isEmpty || doc.pageCount == 0) return None
    // per-PAGE marked-content text (MCIDs are page-scoped, §14.7.5.3);
    // pages interpret lazily and at most once
    val cache = scala.collection.mutable.Map[Int, Map[Int, String]]()
    def byMcid(pg0: Int): Map[Int, String] = {
      val pg = if (pg0 < 0) 0 else pg0 // absent /Pg: single-page convention
      cache.getOrElseUpdate(pg,
        if (pg >= doc.pageCount) Map.empty
        else doc.page(pg).objects()
          .filter(o => o.objType == "text" && o.mcid >= 0)
          .groupBy(_.mcid).view.mapValues(_.map(_.text).mkString).toMap)
    }
    val parts = nodes.flatMap { n =>
      val t =
        if (n.actualText.nonEmpty) n.actualText
        else n.mcids.flatMap { case (pg, m) => byMcid(pg).get(m) }.mkString
      if (t.nonEmpty) Some(t) else None
    }
    if (parts.isEmpty) None else Some(parts.mkString("\n"))
  }
}
