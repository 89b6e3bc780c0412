package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionFixture

/** Wave 78: breadcrumb trails, leftover-markup gate. */
class Wave78Spec extends AnyFunSuite {
  lazy val spark = SparkSessionFixture.spark
  import spark.implicits._

  test("JsonLd.breadcrumbs: object items, string items, position fallback") {
    val g = graft.core.html.JsonLd.breadcrumbs(
      """<html><head><script type="application/ld+json">
        |{"@graph":[{"@type":"BreadcrumbList","itemListElement":[
        | {"@type":"ListItem","position":2,"name":"B","item":{"@id":"u/b"}},
        | {"@type":"ListItem","position":1,"name":"A","item":"u/a"}]}]}
        |</script></head></html>""".stripMargin)
    assert(g.map(c => (c.position, c.name, c.itemUrl)) ==
      Vector((2L, "B", "u/b"), (1L, "A", "u/a")))
    // no position → index+1; no item → empty url; name inside item object
    val f = graft.core.html.JsonLd.breadcrumbs(
      """<script type="application/ld+json">{"@type":"BreadcrumbList",
        |"itemListElement":[{"@type":"ListItem","item":{"@id":"u/x","name":"X"}},
        |{"@type":"ListItem","name":"Y"}]}</script>""".stripMargin)
    assert(f.map(c => (c.position, c.name, c.itemUrl)) ==
      Vector((1L, "X", "u/x"), (2L, "Y", "")))
    // malformed JSON and non-breadcrumb types are silently skipped
    assert(graft.core.html.JsonLd.breadcrumbs(
      """<script type="application/ld+json">{"@type":"Article"</script>""").isEmpty)
  }

  test("markupLeak: family counts and threshold") {
    val rows = Seq(
      (1L, "clean prose with one &amp; entity only"),
      (2L, "<p>raw html</p> with &lt;escaped&gt; and <b>bold</b>"),
      (3L, "wiki {{cite}} {{sfn|x}} plus **bold md** and\n## header"),
      (4L, "[quote]forum[/quote] [img]x[/img]"))
      .toDF("doc_id", "text")
    val out = TextStats.markupLeak(rows).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getBoolean(7))).toMap
    assert(out(1L) == ((1L, 0L, 0L, 0L, 0L, 1L, false)))      // lone entity is fine
    assert(out(2L) == ((2L, 4L, 0L, 0L, 0L, 6L, true)))       // &lt; &gt; + 4 tags
    assert(out(3L) == ((0L, 0L, 2L, 2L, 0L, 4L, true)))       // md bold + \n## + 2 wiki
    assert(out(4L) == ((0L, 0L, 0L, 0L, 4L, 4L, true)))       // bbcode open+close ×2
  }
}
