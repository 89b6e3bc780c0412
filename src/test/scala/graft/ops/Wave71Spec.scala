package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.core.PdfDates
import graft.core.html.JsonLd

/** Wave 71: ISO-8601 parsing, article extraction, internal PDF links. */
class Wave71Spec extends AnyFunSuite {

  test("iso-8601: offsets, fractions, range strictness, date-only default") {
    def ep(s: String) = PdfDates.parseIso(s).map(_.epochSec)
    assert(ep("1970-01-01T00:00:00Z").contains(0L))
    assert(ep("1970-01-01").contains(0L))
    assert(ep("2024-03-01T10:30:00+02:00").contains(1709281800L))
    assert(ep("2024-03-01T10:30:00+0200") == ep("2024-03-01T10:30:00+02:00"))
    assert(ep("2024-03-01T08:30:00") == ep("2024-03-01T10:30:00+02:00")) // no-offset = UTC
    assert(ep("2024-03-01T10:30:45.999Z") == ep("2024-03-01T10:30:45Z")) // fraction truncated
    assert(ep("2024-02-30").isEmpty)       // range strict
    assert(ep("2024-13-01").isEmpty)
    assert(ep("2024-03-01T24:00:00").isEmpty)
    assert(ep("03/01/2024").isEmpty)       // wrong format entirely
    // negative offset crosses midnight
    assert(ep("2023-12-31T23:30:00-01:00").contains(
      ep("2024-01-01T00:30:00Z").get))
  }

  test("jsonld articles: type filter, author shapes, name fallback") {
    val html =
      """<script type="application/ld+json">
        |[{"@type":"Product","name":"widget"},
        | {"@type":"Article","name":"Name not headline","author":"Solo"},
        | {"@type":["NewsArticle","Thing"],"headline":"Array type",
        |  "author":[{"@type":"Person","name":"First"},{"name":"Second"}]}]
        |</script>""".stripMargin
    val rs = JsonLd.articles(html)
    assert(rs.length == 2) // Product filtered out
    assert(rs(0).headline == "Name not headline" && rs(0).author == "Solo")
    assert(rs(1).jtype == "NewsArticle" && rs(1).author == "First")
  }
}
