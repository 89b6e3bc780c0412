package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionFixture
import graft.core.html.ImageCaptions
import graft.spark.PageRow

/** Wave 64: tracking pixels, caption quality, font subsetting. */
class Wave64Spec extends AnyFunSuite {

  lazy val spark = SparkSessionFixture.spark
  private val ts = java.sql.Timestamp.valueOf("2020-01-01 00:00:00")

  test("img dimension/style parsing: quoted, bare, junk, css-spaced hidden") {
    val h = """<img src="a" width="10" height=20 style="display: none">
              |<img src="b" width="abc" height="">
              |<img src="c" style="visibility:  hidden">
              |<img src="d" width="10px">""".stripMargin
    val rs = ImageCaptions.scan(h)
    assert(rs(0).width == 10 && rs(0).height == 20 && rs(0).hidden)
    assert(rs(1).width == -1 && rs(1).height == -1 && !rs(1).hidden)
    assert(rs(2).hidden)
    assert(rs(3).width == 10) // leading digits win ("10px" → 10)
  }

  test("tracker host match: exact and subdomain, not substring") {
    import spark.implicits._
    val h = """<img src="https://facebook.com/tr.gif">
              |<img src="https://pixel.facebook.com/tr.gif">
              |<img src="https://notfacebook.com/x.gif">
              |<img src="https://facebook.com.evil.example/x.gif">""".stripMargin
    val rows = Seq(PageRow("https://x.example/", ts, h.getBytes("UTF-8"), null, "en"))
    val rs = HtmlMeta.trackingPixels(spark.createDataset(rows)).collect().sortBy(_.ord)
    assert(rs.map(_.tracker_host).toSeq == Seq(true, true, false, false))
  }

  test("caption quality: caption overrides placeholder alt") {
    import spark.implicits._
    // alt is a placeholder but the figcaption is real → the PAIR is usable
    val h = """<figure><img src="a.jpg" alt="logo">
              |<figcaption>the corporate headquarters at dusk</figcaption></figure>""".stripMargin
    val rows = Seq(PageRow("https://y.example/", ts, h.getBytes("UTF-8"), null, "en"))
    val rs = HtmlMeta.captionQuality(spark.createDataset(rows)).collect()
    assert(rs.length == 1 && rs.head.reason == "ok" && rs.head.usable)
  }
}
