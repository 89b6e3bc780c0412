package graft.core.html

/** HTML table extraction — `<table>` grids as structured cells, the piece
  * that turns web tables into rows a training pipeline can treat as
  * semi-structured data (table QA, fact extraction, schema induction).
  *
  * Same tokenizer discipline as HtmlLinks/HtmlExtract: one forward scan,
  * comments/CDATA/script/style skipped, entities decoded, whitespace
  * normalized. Nesting is handled with an explicit stack: a nested
  * `<table>` suspends the outer cell (its text belongs to the inner
  * table) and table indices are assigned in document order, outer first.
  * Implicit closes follow the HTML parsing algorithm's recovery rules in
  * their common forms: a new `<tr>`/`<td>`/`<th>` closes an open one, and
  * `</table>` closes any open row/cell. colspan/rowspan attributes are
  * surfaced as written but cells are indexed by occurrence, not by
  * visual grid position. */
object HtmlTables {

  final case class TableCell(
      tableIdx: Int,  // document order, outer-before-inner
      rowIdx: Int,
      colIdx: Int,
      header: Boolean,
      colspan: Int,
      text: String)

  private final class TableCtx(val idx: Int) {
    var row = -1
    var col = -1
    var inCell = false
    var cellHeader = false
    var cellColspan = 1
    val buf = new StringBuilder
  }

  def extractTables(html: String): Vector[TableCell] = {
    val lowerHtml = html.toLowerCase(java.util.Locale.ROOT)
    val out = Vector.newBuilder[TableCell]
    val stack = scala.collection.mutable.Stack[TableCtx]()
    var nextIdx = 0

    def endCell(): Unit = {
      if (stack.nonEmpty) {
        val t = stack.top
        if (t.inCell) {
          out += TableCell(t.idx, t.row, t.col, t.cellHeader, t.cellColspan,
            normWs(t.buf.toString))
          t.inCell = false; t.buf.clear()
        }
      }
    }

    var i = 0
    val n = html.length
    while (i < n) {
      if (html.charAt(i) == '<') {
        if (html.startsWith("<!--", i)) {
          val end = html.indexOf("-->", i + 4); i = if (end < 0) n else end + 3
        } else if (html.startsWith("<![CDATA[", i)) {
          val end = html.indexOf("]]>", i + 9); i = if (end < 0) n else end + 3
        } else {
          val close = html.indexOf('>', i + 1)
          if (close < 0) i = n
          else {
            val rawTag = html.substring(i + 1, close)
            i = close + 1
            val isEnd = rawTag.startsWith("/")
            val body = if (isEnd) rawTag.substring(1) else rawTag
            val name = body.takeWhile(Character.isLetterOrDigit).toLowerCase(java.util.Locale.ROOT)
            if (name.nonEmpty) {
              if (!isEnd) {
                if ((name == "script" || name == "style") && !rawTag.endsWith("/")) {
                  val idx = lowerHtml.indexOf(s"</$name", i)
                  i = if (idx < 0) n else { val gt = html.indexOf('>', idx); if (gt < 0) n else gt + 1 }
                } else name match {
                  case "table" =>
                    stack.push(new TableCtx(nextIdx)); nextIdx += 1
                  case "tr" if stack.nonEmpty =>
                    endCell() // implicit close of a dangling cell
                    val t = stack.top
                    t.row += 1; t.col = -1
                  case ("td" | "th") if stack.nonEmpty =>
                    endCell()
                    val t = stack.top
                    if (t.row < 0) t.row = 0 // cells before any <tr>: row 0
                    t.col += 1
                    t.inCell = true
                    t.cellHeader = name == "th"
                    t.cellColspan = HtmlExtract.attr(body, "colspan")
                      .flatMap(v => scala.util.Try(v.trim.toInt).toOption)
                      .filter(_ >= 1).getOrElse(1)
                  case _ => () // thead/tbody/caption wrappers, unknowns
                }
              } else name match {
                case "table" =>
                  endCell()
                  if (stack.nonEmpty) stack.pop()
                case "td" | "th" => endCell()
                case "tr" if stack.nonEmpty =>
                  endCell()
                case _ => ()
              }
            }
          }
        }
      } else {
        val next = html.indexOf('<', i)
        val end = if (next < 0) n else next
        if (stack.nonEmpty && stack.top.inCell)
          stack.top.buf.append(HtmlExtract.decodeEntities(html.substring(i, end)))
        i = end
      }
    }
    while (stack.nonEmpty) { endCell(); stack.pop() } // truncated tail
    out.result()
  }

  private def normWs(s: String): String =
    s.replaceAll("\\s+", " ").trim
}
