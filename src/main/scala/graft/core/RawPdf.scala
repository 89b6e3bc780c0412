package graft.core

/** Minimal deterministic raw-PDF assembler for synthesized fixtures.
  *
  * Objects are given as body strings (without the `N 0 obj` / `endobj`
  * wrapper); object numbers are 1-based positions in the sequence. A correct
  * cross-reference table and trailer are computed, so fixtures built here
  * exercise the normal xref path, not the recovery scanner.
  */
object RawPdf {

  /** Assemble object bodies into a complete PDF. `rootNum` is the 1-based
    * object number of the catalog. */
  def assemble(objs: Seq[String], rootNum: Int = 1, version: String = "1.7"): Array[Byte] = {
    val sb = new StringBuilder
    sb.append(s"%PDF-$version\n%âãÏÓ\n")
    val offsets = objs.zipWithIndex.map { case (body, i) =>
      val off = sb.length
      sb.append(s"${i + 1} 0 obj\n").append(body).append("\nendobj\n")
      off
    }
    val xrefAt = sb.length
    sb.append(s"xref\n0 ${objs.length + 1}\n0000000000 65535 f \n")
    offsets.foreach(off => sb.append(f"$off%010d 00000 n \n"))
    sb.append(s"trailer\n<</Size ${objs.length + 1}/Root $rootNum 0 R>>\n")
    sb.append(s"startxref\n$xrefAt\n%%EOF\n")
    sb.toString.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
  }
}
