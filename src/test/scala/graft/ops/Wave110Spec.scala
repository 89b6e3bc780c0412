package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionFixture

/** Wave 110: per-site common-prefix boilerplate detection. */
class Wave110Spec extends AnyFunSuite {
  lazy val spark = SparkSessionFixture.spark

  test("boilerplatePrefix: LCP(min, max) recovers the exact planted header") {
    import spark.implicits._
    val corpus = Seq(
      (0L, "HDR alpha body one"), (1L, "HDR alpha body two"),
      (2L, "HDR beta other text"))
      .map { case (id, t) => (id, 0L, t) }
      .toDF("doc_id", "site", "text")
    val r = TextStats.boilerplatePrefix(corpus).collect()(0)
    // min = "HDR alpha body one", max = "HDR beta other text" → LCP "HDR "
    assert(r.getAs[Long]("n_docs") == 3L)
    assert(r.getAs[Long]("lcp_len") == 4L)
    assert(r.getString(3) == Dedup.md5Hex("HDR "))
  }

  test("boilerplatePrefix: disjoint texts give LCP 0; single doc gives full length") {
    import spark.implicits._
    val corpus = Seq(
      (0L, 1L, "aaa"), (1L, 1L, "zzz"),
      (2L, 2L, "only doc"))
      .toDF("doc_id", "site", "text")
    val out = TextStats.boilerplatePrefix(corpus).orderBy("site").collect()
    assert(out(0).getAs[Long]("lcp_len") == 0L)
    assert(out(0).getString(3) == Dedup.md5Hex(""))
    assert(out(1).getAs[Long]("lcp_len") == 8L)
    assert(out(1).getString(3) == Dedup.md5Hex("only doc"))
  }

  test("corpusWithSitePrefix + detection: the planted nav header is found verbatim") {
    import spark.implicits._
    val docs = (0L until 50L).map(i => (i, s"body text $i unique")).toDF("doc_id", "text")
    val out = TextStats.boilerplatePrefix(TextStats.corpusWithSitePrefix(docs))
      .collect()
    assert(out.length == 25)
    def planted(i: Long) = s"SITE${i % 25} NAV HOME ABOUT | body text $i unique"
    def lcp(a: String, b: String): Int = {
      var i = 0
      while (i < math.min(a.length, b.length) && a(i) == b(i)) i += 1
      i
    }
    out.foreach { r =>
      val site = r.getLong(0)
      val (a, b) = (planted(site), planted(site + 25))
      val (lo, hi) = if (a <= b) (a, b) else (b, a)
      val expected = lcp(lo, hi)
      assert(r.getAs[Long]("lcp_len") == expected.toLong, s"site $site")
      assert(expected >= s"SITE$site NAV HOME ABOUT | ".length, s"site $site")
      assert(r.getString(3) == Dedup.md5Hex(lo.substring(0, expected)))
    }
  }
}
