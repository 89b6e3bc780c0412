package graft.core.html

import org.scalatest.funsuite.AnyFunSuite

/** HTML table extraction: grid indexing, header/colspan capture, nesting,
  * implicit closes, malformed tolerance. */
class HtmlTablesSpec extends AnyFunSuite {

  test("basic grid with headers, entities, whitespace normalization") {
    val cells = HtmlTables.extractTables(
      """<table><thead><tr><th> A &amp; B </th><th>C</th></tr></thead>
        |<tbody><tr><td>1</td><td>  two
        |  words </td></tr></tbody></table>""".stripMargin)
    assert(cells == Vector(
      HtmlTables.TableCell(0, 0, 0, header = true, 1, "A & B"),
      HtmlTables.TableCell(0, 0, 1, header = true, 1, "C"),
      HtmlTables.TableCell(0, 1, 0, header = false, 1, "1"),
      HtmlTables.TableCell(0, 1, 1, header = false, 1, "two words")))
  }

  test("implicit closes: unclosed td/tr recover like browsers") {
    val cells = HtmlTables.extractTables(
      "<table><tr><td>a<td>b<tr><td>c</table>")
    assert(cells.map(c => (c.rowIdx, c.colIdx, c.text)) ==
      Vector((0, 0, "a"), (0, 1, "b"), (1, 0, "c")))
  }

  test("nested table indexes separately; outer cell keeps its own text") {
    val cells = HtmlTables.extractTables(
      "<table><tr><td>out1 <table><tr><td>in</td></tr></table> out2</td></tr></table>")
    val outer = cells.filter(_.tableIdx == 0)
    val inner = cells.filter(_.tableIdx == 1)
    assert(inner == Vector(HtmlTables.TableCell(1, 0, 0, header = false, 1, "in")))
    assert(outer == Vector(HtmlTables.TableCell(0, 0, 0, header = false, 1, "out1 out2")))
  }

  test("colspan surfaced; bad values default to 1; script content skipped") {
    val cells = HtmlTables.extractTables(
      """<table><tr><td colspan="3">wide</td><td colspan="x">bad</td>
        |<td><script>var t = "<td>not a cell</td>";</script>s</td></tr></table>""".stripMargin)
    assert(cells.map(c => (c.colIdx, c.colspan, c.text)) ==
      Vector((0, 3, "wide"), (1, 1, "bad"), (2, 1, "s")))
  }

  test("text outside tables ignored; truncated table flushes its open cell") {
    assert(HtmlTables.extractTables("<p>no tables here</p>").isEmpty)
    val cells = HtmlTables.extractTables("<table><tr><td>dangling")
    assert(cells == Vector(HtmlTables.TableCell(0, 0, 0, header = false, 1, "dangling")))
  }
}
