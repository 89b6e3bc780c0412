package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionFixture

/** Anchor-text aggregation: count-then-rank, boilerplate excluded,
  * deterministic tie-break, rank-≤-k cut, variant counts. */
class AnchorTextSpec extends AnyFunSuite {

  lazy val spark = SparkSessionFixture.spark

  test("hub corpus: top-k anchors per target with counts and variants") {
    import spark.implicits._
    val links = LinkGraph.outlinks(AnchorText.synthHubCorpus(spark, 60))
    val out = AnchorText.topAnchors(links, 3)
      .orderBy("dst", "rank")
      .as[(String, String, Long, Int, Long)].collect()
    assert(out.length == 30) // 10 hubs × top-3
    val h0 = out.filter(_._1 == "https://hub.example/h0")
    // each slot anchor appears exactly twice per hub (6 pages, p%3 cycles)
    assert(h0.map(r => (r._2, r._3, r._4)).toVector == Vector(
      ("hub anchor 0", 2L, 1), ("hub anchor 1", 2L, 2), ("hub anchor 2", 2L, 3)))
    // 3 slot anchors + 6 singleton "page p pick" variants
    assert(h0.forall(_._5 == 9L))
    // whitespace in the markup is normalized away
    assert(out.forall(r => r._2 == r._2.trim && !r._2.contains("  ")))
    // boilerplate nav anchors never leak into any target's anchor set
    assert(!out.exists(_._2 == "Home"))
  }

  test("large k returns every variant; singletons order by anchor text") {
    import spark.implicits._
    val links = LinkGraph.outlinks(AnchorText.synthHubCorpus(spark, 60))
    val all = AnchorText.topAnchors(links, 100)
      .where(org.apache.spark.sql.functions.col("dst") === "https://hub.example/h3")
      .orderBy("rank").as[(String, String, Long, Int, Long)].collect()
    assert(all.length == 9)
    assert(all.map(_._3).toVector == Vector(2L, 2L, 2L, 1L, 1L, 1L, 1L, 1L, 1L))
    // singleton tail sorted by anchor asc: pages 3,13,23,33,43,53
    assert(all.drop(3).map(_._2).toVector ==
      Vector(3, 13, 23, 33, 43, 53).map(p => s"page $p pick").sortBy(identity[String]))
  }
}
