package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionFixture
import graft.core.MiniJson
import graft.core.html.JsonLd

/** Semantics for the wave-38 operators: the bounded JSON parser, JSON-LD
  * flattening, script segmentation, and DSIR importance weights. */
class StructuredDataSpec extends AnyFunSuite {

  lazy val spark = SparkSessionFixture.spark
  import spark.implicits._

  test("MiniJson: values, escapes, nesting, numbers") {
    assert(MiniJson.parse("""{"a": [1, 2.5, -3e2], "b": "x\ny", "c": null, "d": true}""")
      == Some(Map("a" -> Vector(1.0, 2.5, -300.0), "b" -> "x\ny", "c" -> null, "d" -> true)))
    assert(MiniJson.parse(""""\u00e9\u4e2d"""") == Some("é中"))
    assert(MiniJson.parse("[]") == Some(Vector()))
    assert(MiniJson.parse("{}") == Some(Map()))
  }

  test("MiniJson: malformed input returns None, never throws") {
    for (bad <- Seq("{", "[1,", """{"a": }""", "tru", "01x", "", "\"unclosed",
                    """{"a":1} trailing""", "{\"a\"\n:\u0001}"))
      assert(MiniJson.parse(bad).isEmpty, bad)
  }

  test("MiniJson: nesting bomb is rejected by the depth bound") {
    val bomb = "[" * 10000 + "]" * 10000
    assert(MiniJson.parse(bomb).isEmpty)
    // ...but MaxDepth-1 legitimate nesting parses
    val ok = "[" * 50 + "]" * 50
    assert(MiniJson.parse(ok).isDefined)
  }

  test("JsonLd: block scan honors attr case/quotes and skips non-ld scripts") {
    val html =
      """<p>x</p><script TYPE = 'application/ld+json' async>{"@type":"A"}</script>
        |<script type=application/ld+json>{"@type":"B"}</script>
        |<script type="text/javascript">{"@type":"C"}</script>
        |<SCRIPT type="application/ld+json">{"@type":"D"}</SCRIPT>""".stripMargin
    val items = JsonLd.items(html)
    assert(items.map(_.jtype) == Vector("A", "B", "D"))
    assert(items.forall(_.ok))
  }

  test("JsonLd: @graph, arrays, @type arrays, name/headline fallback, errors") {
    val html =
      """<script type="application/ld+json">{"@graph":[{"@type":"X","name":"n1"},{"@type":"Y","headline":"h2"}]}</script>
        |<script type="application/ld+json">[{"@type":["P","Q"],"name":"n3"},"bare"]</script>
        |<script type="application/ld+json">{"oops"</script>""".stripMargin
    val items = JsonLd.items(html)
    assert(items(0) == JsonLd.Item(0, 0, ok = true, "X", "n1"))
    assert(items(1) == JsonLd.Item(0, 1, ok = true, "Y", "h2"))
    assert(items(2) == JsonLd.Item(1, 0, ok = true, "P", "n3"))
    assert(items(3) == JsonLd.Item(1, 1, ok = true, "", "")) // bare string element
    assert(items(4) == JsonLd.Item(2, 0, ok = false, "", ""))
  }

  test("scriptSegments: neutral chars glue to the current run, boundaries at script changes") {
    val d = Seq((1L, "abc де 中中 xyz")).toDF("doc_id", "text")
    val out = Hygiene.scriptSegments(d)
      .as[(Long, Long, String, Long, Long)].collect().sortBy(_._2)
    // "abc " latin[0,4) | "де " cyr[4,7) | "中中 " cjk[7,10) | "xyz" latin[10,13)
    assert(out.map(r => (r._3, r._4, r._5)).toSeq == Seq(
      ("latin", 0L, 4L), ("cyrillic", 4L, 3L), ("cjk", 7L, 3L), ("latin", 10L, 3L)))
    // all-neutral text → a single 'none' segment
    val none = Hygiene.scriptSegments(Seq((2L, "123 456")).toDF("doc_id", "text"))
      .as[(Long, Long, String, Long, Long)].collect()
    assert(none.toSeq == Seq((2L, 0L, "none", 0L, 7L)))
  }

  test("dsirWeights: target-like documents score above target-unlike ones") {
    // targets (doc_id % 5 == 0 here) are zebra-heavy; doc 7 mimics them,
    // doc 3 is maximally unlike
    val docs = Seq(
      (0L, "zebra quagga zebra quagga zebra"),
      (5L, "quagga zebra quagga zebra quagga"),
      (7L, "zebra quagga zebra"),
      (3L, "apple banana cherry date elderberry fig")).toDF("doc_id", "text")
    val out = Sampling.dsirWeights(docs, buckets = 16, targetModulus = 5)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(7L)._3 > 0, s"mimic should score positive: ${out(7L)}")
    assert(out(3L)._3 < out(7L)._3, "unlike doc must score below the mimic")
    // gram accounting: doc 7 has 3 unigrams + 2 bigrams
    assert(out(7L)._2 == 5)
  }

  test("Microdata: value source order content > href > src > text") {
    import graft.core.html.Microdata
    val props = Microdata.props(
      """<div itemscope itemtype="T">
        |<meta itemprop="a" content="C" src="S">
        |<a itemprop="b" href="H">text</a>
        |<img itemprop="c" src="S2">
        |<span itemprop="d">Plain &lt;text&gt;</span>
        |</div>""".stripMargin)
    val m = props.filter(_.prop != "@type").map(p => p.prop -> p.value).toMap
    assert(m == Map("a" -> "C", "b" -> "H", "c" -> "S2", "d" -> "Plain <text>"))
  }

  test("Microdata: nested item attaches to outer as type-valued prop; innermost owns props") {
    import graft.core.html.Microdata
    val props = Microdata.props(
      """<div itemscope itemtype="Outer"><span itemprop="x">ox</span>
        |<div itemprop="sub" itemscope itemtype="Inner"><span itemprop="y">iy</span></div>
        |<span itemprop="z">oz</span></div>""".stripMargin)
    val byItem = props.groupBy(_.itemIdx)
    assert(byItem(0).map(p => p.prop -> p.value).toSet ==
      Set("@type" -> "Outer", "x" -> "ox", "sub" -> "Inner", "z" -> "oz"))
    assert(byItem(1).map(p => p.prop -> p.value).toSet ==
      Set("@type" -> "Inner", "y" -> "iy"))
  }

  test("Microdata: orphan itemprop dropped, untyped item kept, misnesting tolerated") {
    import graft.core.html.Microdata
    val props = Microdata.props(
      """<span itemprop="orphan">x</span>
        |<div itemscope><b><i itemprop="k">v</b></i></div>
        |<div itemscope itemtype="T2"><span itemprop="m">w</span>""".stripMargin)
    assert(!props.exists(_.prop == "orphan"))
    assert(props.filter(_.itemIdx == 0).map(p => p.prop -> p.value).toSet ==
      Set("@type" -> "", "k" -> "v"))
    // unclosed T2 div still collects its prop
    assert(props.filter(_.itemIdx == 1).map(p => p.prop -> p.value).toSet ==
      Set("@type" -> "T2", "m" -> "w"))
  }

  test("Microdata: bare/unquoted/case-variant attributes and items with no props") {
    import graft.core.html.Microdata
    val props = Microdata.props(
      "<div ITEMSCOPE itemtype=Bare><span ITEMPROP=k>v</span></div><p itemscope></p>")
    assert(props.filter(_.itemIdx == 0).map(p => p.prop -> p.value).toSet ==
      Set("@type" -> "Bare", "k" -> "v"))
    // the propless item still appears in the inventory
    assert(props.filter(_.itemIdx == 1) == Vector(Microdata.Prop(1, "", "@type", "")))
  }

  test("Microdata: attr names inside QUOTED values of other attributes never match") {
    import graft.core.html.Microdata
    // 'content=5' and 'src=x' live inside the href STRING; the tokenizer
    // must pick href, not the embedded impostors (the indexOf-scan bug)
    val props = Microdata.props(
      """<div itemscope itemtype="T"><a itemprop="u" href="/p?q=1 content=5 src=x">t</a></div>""")
    assert(props.filter(_.prop == "u").map(_.value) == Vector("/p?q=1 content=5 src=x"))
  }
}
