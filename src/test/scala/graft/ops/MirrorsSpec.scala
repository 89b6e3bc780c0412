package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionFixture

/** Mirror detection, param-cardinality mining, corpus concentration. */
class MirrorsSpec extends AnyFunSuite {

  lazy val spark = SparkSessionFixture.spark
  import spark.implicits._

  test("mirror pairs: containment, threshold, boilerplate cap") {
    // a.com = {d1..d4}; b.net = {d1..d4} (pure mirror); c.org = {d1, d9}
    // (one shared digest — below minShared); 20 domains share 'boiler'
    // (over the cap — must NOT explode into 190 pairs)
    val pages =
      (1 to 4).map(i => ("a.com", s"d$i")) ++
      (1 to 4).map(i => ("b.net", s"d$i")) ++
      Seq(("c.org", "d1"), ("c.org", "d9")) ++
      (0 until 20).map(i => (s"bulk$i.com", "boiler"))
    val out = Mirrors.domainPairs(pages.toDF("domain", "digest"),
      maxPerDigest = 16, minShared = 2).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("domain_a") == "a.com" && r.getAs[String]("domain_b") == "b.net")
    assert(r.getAs[Long]("n_shared") == 4L)
    assert(r.getAs[Long]("containment_permille") == 1000L, "pure mirror")
  }

  test("mirror pairs: partial containment is n_shared/min-size") {
    val pages = ((1 to 10).map(i => ("big.com", s"x$i")) ++
      (1 to 4).map(i => ("small.org", s"x$i"))).toDF("domain", "digest")
    val r = Mirrors.domainPairs(pages).collect().head
    // 4 shared / min(10,4)=4 → 1000; small.org fully contained in big.com
    assert(r.getAs[Long]("containment_permille") == 1000L)
    assert(r.getAs[Long]("n_shared") == 4L)
  }

  test("param stats: cardinality separates session params from content params") {
    val urls = Seq(
      "https://www.shop.com/p?page=1&sid=aaa",
      "https://www.shop.com/q?page=1&sid=bbb",
      "https://shop.com/r?page=2&sid=ccc",
      "https://other.net/x?lang=en").toDF("url")
    val m = UrlOps.paramStats(urls).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n_urls"), r.getAs[Long]("n_vals"),
         r.getAs[Long]("vals_per_url_permille"))).toMap
    assert(m(("shop.com", "sid")) == ((3L, 3L, 1000L)), "session param: every value distinct")
    assert(m(("shop.com", "page")) == ((3L, 2L, 666L)), "content param: low cardinality")
    assert(m(("other.net", "lang")) == ((1L, 1L, 1000L)))
  }

  test("tag sequence: decoys in script bodies and comments do not perturb the shape") {
    val html = """<html><head><!-- <p>x</p> --><script>a("<iframe>")</script></head>
                 |<body><p>t</p><a href="/x">y</a></body></html>""".stripMargin
    assert(HtmlFeatures.tagSequence(html) == "html,head,script,body,p,a")
    // identical shape, different text → same fingerprint input
    val html2 = html.replace(">t<", ">completely different text<")
    assert(HtmlFeatures.tagSequence(html2) == HtmlFeatures.tagSequence(html))
    assert(HtmlFeatures.tagSequence(null) == "")
  }

  test("sitemap coverage: backlog and orphans both counted") {
    import spark.implicits._
    val entries = Seq(
      ("s", "url", "https://a.com/1"), ("s", "url", "https://a.com/2"),
      ("s", "url", "https://a.com/3"), ("s", "sitemap", "https://a.com/child.xml"))
      .toDF("sitemap", "kind", "loc")
    val crawled = Seq("https://a.com/2", "https://a.com/9", "https://b.net/1")
      .toDF("url")
    val m = Sitemaps.coverage(entries, crawled).collect()
      .map(r => r.getString(0) -> r.toSeq.tail.map(_.asInstanceOf[Long])).toMap
    assert(m("a.com") == Seq(3L, 2L, 1L, 2L, 1L)) // sitemap,crawled,both,backlog,orphan
    assert(m("b.net") == Seq(0L, 1L, 0L, 0L, 1L))
  }

  test("url mentions: punctuation strip, www form, case-folded hosts") {
    import spark.implicits._
    val docs = Seq(
      (1L, "read https://X.Example/a, then (www.y.example/b) now."),
      (2L, "no links here")).toDF("doc_id", "text")
    val out = TextStats.urlMentions(docs).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_urls") == 2L && r.getAs[Long]("n_hosts") == 2L)
    assert(r.getAs[String]("hosts_csv") == "www.y.example,x.example")
  }

  test("concentration: integer HHI and top share") {
    // 8 docs: 4 on a, 2 on b, 1 on c, 1 on d
    val norm = (Seq.fill(4)("a.com") ++ Seq.fill(2)("b.com") ++
      Seq("c.com", "d.com")).zipWithIndex
      .map { case (d, i) => (i.toLong, d) }.toDF("doc_id", "domain")
    val r = Profile.concentration(norm).collect().head
    assert(r.getAs[Long]("n_domains") == 4L)
    assert(r.getAs[Long]("total_docs") == 8L)
    assert(r.getAs[Long]("top_share_permille") == 500L)
    // shares 500,250,125,125 → Σ share² = 250000+62500+15625+15625 = 343750
    // → hhi = 343
    assert(r.getAs[Long]("hhi") == 343L)
  }
}
