package graft.core

/** Optional content groups (PDF 32000-1 §8.11 "layers"): content wrapped in
  * `/OC <prop> BDC … EMC` or drawn via an XObject with an /OC entry belongs
  * to an OCG; groups listed in the default configuration's /OFF array are
  * hidden. Rendering honors visibility (watermark/alternate-language layers
  * default-off must not paint — the PDFium render path's behavior); TEXT
  * EXTRACTION deliberately ignores it, matching PDFium's text page, which
  * processes all text objects regardless of layer state (the classic
  * "hidden text still extracts" property).
  *
  * Identity is by indirect reference: the /OFF array and the /Properties
  * (or OCMD /OCGs) entries both hold refs to the same OCG dicts, so
  * membership is a (num, gen) set test — no dict equality needed. */
object OptionalContent {

  /** (num, gen) of every default-OFF OCG from the default configuration:
    * /BaseState /OFF hides every /OCGs member except the /ON list
    * (§8.11.4.3 — the shape Acrobat emits); otherwise the /OFF list hides
    * its members. */
  def offRefs(doc: PdfDocument): Set[(Int, Int)] = {
    def refsOf(o: PdfObject): Set[(Int, Int)] = doc.resolve(o) match {
      case PdfArray(items) => items.collect { case PdfRef(n, g) => (n, g) }.toSet
      case _ => Set.empty
    }
    doc.resolve(doc.catalog("OCProperties")) match {
      case ocp: PdfDict => doc.resolve(ocp("D")) match {
        case d: PdfDict =>
          val baseOff = doc.get(d, "BaseState") == PdfName("OFF")
          if (baseOff) refsOf(ocp("OCGs")) -- refsOf(d("ON"))
          else refsOf(d("OFF"))
        case _ => Set.empty
      }
      case _ => Set.empty
    }
  }

  /** All OCGs with name and default visibility, in /OCGs order. */
  def groups(doc: PdfDocument): Vector[(String, Boolean)] = {
    val off = offRefs(doc)
    doc.resolve(doc.catalog("OCProperties")) match {
      case ocp: PdfDict => doc.resolve(ocp("OCGs")) match {
        case PdfArray(items) => items.flatMap { raw =>
          val key = raw match { case PdfRef(n, g) => Some((n, g)); case _ => None }
          doc.resolve(raw) match {
            case g: PdfDict =>
              val name = doc.get(g, "Name") match {
                case s: PdfString => s.asText
                case _ => ""
              }
              Some((name, !key.exists(off.contains)))
            case _ => None
          }
        }
        case _ => Vector.empty
      }
      case _ => Vector.empty
    }
  }

  /** Hidden-ness of an /OC membership expression: `raw` is the UNRESOLVED
    * property value (a ref to an OCG or OCMD, or an inline OCMD dict).
    * An OCG is hidden iff its ref is OFF; an OCMD (default /P /AnyOn) is
    * hidden iff it has OCGs and ALL of them are OFF. Unresolvable → visible
    * (fail open: better to over-render than drop content). */
  def isHidden(doc: PdfDocument, raw: PdfObject, off: Set[(Int, Int)]): Boolean = {
    if (off.isEmpty) return false
    val directOff = raw match {
      case PdfRef(n, g) if off.contains((n, g)) => true
      case _ => false
    }
    if (directOff) return true
    doc.resolve(raw) match {
      case d: PdfDict if doc.get(d, "Type") == PdfName("OCMD") =>
        // /OCGs may be a direct array, an INDIRECT ref to an array
        // (§8.11.2.2), or a ref to a single OCG dict — resolve first,
        // fall back to ref identity only for the single-OCG shape
        val refs = doc.resolve(d("OCGs")) match {
          case PdfArray(items) => items.collect { case PdfRef(n, g) => (n, g) }
          case _: PdfDict => d("OCGs") match {
            case PdfRef(n, g) => Vector((n, g))
            case _ => Vector.empty
          }
          case _ => Vector.empty
        }
        refs.nonEmpty && refs.forall(off.contains)
      case _ => false
    }
  }

  /** Hidden-ness of a BDC operand pair: tag must be /OC; the property is a
    * name into resources /Properties (whose UNRESOLVED entry carries the
    * ref identity) or an inline dict. */
  def bdcHidden(doc: PdfDocument, resources: PdfDict,
                tag: PdfObject, prop: PdfObject,
                off: Set[(Int, Int)]): Boolean = {
    if (off.isEmpty || tag != PdfName("OC")) return false
    prop match {
      case PdfName(propName) =>
        doc.resolve(resources("Properties")) match {
          case props: PdfDict => isHidden(doc, props(propName), off)
          case _ => false
        }
      case d: PdfDict => isHidden(doc, d, off)
      case r: PdfRef => isHidden(doc, r, off)
      case _ => false
    }
  }
}
