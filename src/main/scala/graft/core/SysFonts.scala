package graft.core

/** System-font substitution for UNEMBEDDED non-Standard-14 fonts — the
  * reference's sysfontinfo.py + default_fonts.py analog: map the declared
  * family to the closest platform TrueType so charboxes and rendering use
  * real metrics/outlines instead of synthetic boxes.
  *
  * Classification mirrors default_fonts.py's family buckets: fixed-pitch →
  * a mono face, serif names → a serif face, everything else → sans; bold /
  * italic resolved from the style name and the FontDescriptor /Flags
  * (bit 1 FixedPitch, bit 2 Serif, bit 7 Italic, bit 19 ForceBold,
  * PDF 32000-1 Table 123). The substitute pool is whatever TTFs the host
  * provides (DejaVu on this image); a missing file degrades to None and
  * the caller keeps its synthetic-box behavior. */
object SysFonts {

  private val dir: String =
    sys.env.getOrElse("GRAFT_SYSFONT_DIR", "/usr/share/fonts/truetype/dejavu")

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Option[TrueTypeFont]]()

  private def load(fileBase: String): Option[TrueTypeFont] =
    cache.computeIfAbsent(fileBase, { _ =>
      val f = new java.io.File(dir, fileBase + ".ttf")
      if (!f.isFile) None
      else
        try TrueTypeFont.parse(java.nio.file.Files.readAllBytes(f.toPath))
        catch { case _: Exception => None }
    })

  /** Pick a substitute face for a declared base font, or None when the
    * host has no usable pool. `flags` is FontDescriptor /Flags (0 ok). */
  def substituteFor(baseFont: String, flags: Int): Option[TrueTypeFont] = {
    val n = baseFont.toLowerCase
    val mono = (flags & 1) != 0 ||
      n.contains("mono") || n.contains("consol") || n.contains("courier")
    val serif = !mono && ((flags & 2) != 0 ||
      n.contains("serif") && !n.contains("sans") ||
      n.contains("times") || n.contains("georgia") || n.contains("garamond") ||
      n.contains("book") || n.contains("roman") || n.contains("cambria") ||
      n.contains("palatino") || n.contains("minion"))
    val bold = (flags & (1 << 18)) != 0 ||
      n.contains("bold") || n.contains("black") || n.contains("heavy")
    val italic = (flags & (1 << 6)) != 0 ||
      n.contains("italic") || n.contains("oblique")
    val family = if (mono) "DejaVuSansMono" else if (serif) "DejaVuSerif" else "DejaVuSans"
    // DejaVu style suffixes differ per family (Serif uses Italic, the sans
    // faces use Oblique)
    val slant = if (!italic) "" else if (serif) "Italic" else "Oblique"
    val style = (bold, slant) match {
      case (false, "") => ""
      case (true, "") => "-Bold"
      case (false, s) => "-" + s
      case (true, s) => "-Bold" + s
    }
    load(family + style).orElse(load(family)) // style fallback to regular
  }

  /** Standard-14 core families keep their AFM-derived metrics path — the
    * substitution targets the NON-standard unembedded tail (web fonts,
    * system CJK declarations), per the reference's split between
    * built-in and system fonts. */
  def isStandard14Name(baseFont: String): Boolean = {
    val n = baseFont.toLowerCase
    n.contains("helvetica") || n.contains("times") || n.contains("courier") ||
      n.contains("symbol") || n.contains("zapf") || n.contains("arial")
  }
}
