package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionFixture
import org.apache.spark.sql.functions._

/** Frontier integration: harvest → in-degree dedup → anti-join crawled →
  * robots gate → per-domain politeness cap, end to end. */
class FrontierSpec extends AnyFunSuite {

  lazy val spark = SparkSessionFixture.spark

  def run(perDomain: Int = 2) = {
    val pages = Frontier.synthCrawledPages(spark)
    Frontier.nextFrontier(pages, pages.toDF().select(col("url")),
      Frontier.synthFrontierRobots(spark), "graftbot", perDomain)
  }

  test("end-to-end frontier: caps hold, crawled urls gone, robots applied") {
    import spark.implicits._
    val out = run().as[(String, String, Long, Int)].collect()
    assert(out.length == 16)
    assert(out.forall(_._4 <= 2))
    // every site root is the top pick (boilerplate Home links kept for
    // discovery): sites 0-5 have 4 crawled referrers, sites 6-7 have 3
    val roots = out.filter(_._1.endsWith(".example/"))
    assert(roots.length == 8 && roots.forall(_._4 == 1))
    assert(roots.count(_._3 == 4L) == 6 && roots.count(_._3 == 3L) == 2)
    // no crawled url reappears
    val crawled = (0 until 30).map(p => s"https://site${p % 8}.example/a/p$p").toSet
    assert(out.forall(r => !crawled.contains(r._1)))
    // the robots-extra rule dropped site6's /a/p38 candidate
    assert(!out.exists(_._1.contains("/a/p38")))
    // longest-match re-allow still admits /a/p17 on site1
    assert(out.exists(_._1 == "https://site1.example/a/p17?a=1&b=2"))
  }

  test("per-domain cap is a real cutoff: cap 1 keeps only the roots") {
    import spark.implicits._
    val out = run(perDomain = 1).as[(String, String, Long, Int)].collect()
    assert(out.length == 8)
    assert(out.forall(r => r._1.endsWith(".example/") && r._4 == 1))
  }

  test("nofollow links never enter discovery") {
    import spark.implicits._
    val out = run(perDomain = 100).as[(String, String, Long, Int)].collect()
    assert(!out.exists(_._2 == "ads.example"))
  }
}
