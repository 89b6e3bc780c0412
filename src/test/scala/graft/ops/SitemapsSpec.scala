package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionFixture
import java.nio.charset.StandardCharsets.UTF_8

/** Sitemap XML parsing: urlset/sitemapindex, gzip sniffing, entity decode,
  * malformed-tail tolerance, and the distributed entries op. */
class SitemapsSpec extends AnyFunSuite {

  lazy val spark = SparkSessionFixture.spark

  test("urlset entries parse with all leaves as written") {
    val xml =
      """<?xml version="1.0"?><urlset>
        |<url><loc> https://a.example/1 </loc><lastmod>2024-03-04</lastmod>
        |<changefreq>daily</changefreq><priority>0.80</priority></url>
        |<url><loc>https://a.example/2</loc></url>
        |</urlset>""".stripMargin
    val es = Sitemaps.parseSitemap("https://a.example/s.xml", xml.getBytes(UTF_8))
    assert(es.length == 2)
    assert(es(0) == Sitemaps.SitemapEntry("https://a.example/s.xml", "url",
      "https://a.example/1", "2024-03-04", "daily", "0.80"))
    assert(es(1).loc == "https://a.example/2" && es(1).priority == "")
  }

  test("sitemapindex children, attribute-carrying tags, self-closing noise") {
    val xml =
      """<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |<sitemap><loc>https://a.example/s1.xml</loc><lastmod>2024-01-01</lastmod></sitemap>
        |<sitemap><loc>https://a.example/s2.xml</loc></sitemap>
        |</sitemapindex>""".stripMargin
    val es = Sitemaps.parseSitemap("https://a.example/i.xml", xml.getBytes(UTF_8))
    assert(es.map(_.kind).toSet == Set("sitemap"))
    assert(es.map(_.loc) == Vector("https://a.example/s1.xml", "https://a.example/s2.xml"))
  }

  test("gzip payloads sniffed and decoded; garbage yields zero rows") {
    val xml = "<urlset><url><loc>https://a.example/z</loc></url></urlset>"
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos); g.write(xml.getBytes(UTF_8)); g.close()
    val es = Sitemaps.parseSitemap("https://a.example/s.xml.gz", bos.toByteArray)
    assert(es.map(_.loc) == Vector("https://a.example/z"))
    assert(Sitemaps.parseSitemap("x", Array[Byte](1, 2, 3)).isEmpty)
    assert(Sitemaps.parseSitemap("x", null).isEmpty)
    // truncated gzip: parsed prefix of nothing, never a throw
    assert(Sitemaps.parseSitemap("x", bos.toByteArray.take(5)).isEmpty)
  }

  test("entity-encoded locs decode; malformed tail keeps the parsed prefix") {
    val es = Sitemaps.parseSitemap("x",
      "<urlset><url><loc>https://a.example/a?x=1&amp;y=2</loc></url></urlset>".getBytes(UTF_8))
    assert(es.map(_.loc) == Vector("https://a.example/a?x=1&y=2"))
    val trunc = Sitemaps.parseSitemap("x",
      "<urlset><url><loc>https://a.example/ok</loc></url><url><loc>https://a.exa".getBytes(UTF_8))
    assert(trunc.map(_.loc) == Vector("https://a.example/ok"))
  }

  test("entries op: synth fixture set → 28 rows across index/children/edge cases") {
    val out = Sitemaps.entries(Sitemaps.synthSitemaps(spark))
    assert(out.count() == 28)
    import spark.implicits._
    val idx = out.where(org.apache.spark.sql.functions.col("kind") === "sitemap")
      .select("loc").as[String].collect().sorted
    assert(idx.toVector == Vector(
      "https://site0.example/sitemap1.xml", "https://site0.example/sitemap2.xml.gz"))
    // gzipped child contributes its 12 urls
    assert(out.where($"sitemap" === "https://site0.example/sitemap2.xml.gz").count() == 12)
  }
}
