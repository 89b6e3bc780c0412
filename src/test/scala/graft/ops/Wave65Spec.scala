package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.SparkSessionFixture
import graft.spark.PageRow

/** Wave 65: meta-refresh redirects, PDF lang audit, dedup funnel. */
class Wave65Spec extends AnyFunSuite {

  lazy val spark = SparkSessionFixture.spark
  private val ts = java.sql.Timestamp.valueOf("2020-01-01 00:00:00")

  private def page(u: String, h: String) = PageRow(u, ts, h.getBytes("UTF-8"), null, "en")

  test("meta refresh: first wins, entity decode, url= required, spaces") {
    import spark.implicits._
    val rows = Seq(
      page("https://m.example/a", """<meta http-equiv=refresh content="1;url=/one">
                  |<meta http-equiv=refresh content="2;url=/two">""".stripMargin),
      page("https://m.example/b", """<meta http-equiv="refresh" content="0; url = /sp?a=1&amp;b=2">"""),
      page("https://m.example/c", """<meta http-equiv="refresh" content="3;/no-url-key">"""),
      page("https://m.example/d", """<meta http-equiv="refreshx" content="0;url=/x">"""))
    val rs = HtmlMeta.metaRefresh(spark.createDataset(rows)).collect()
      .map(r => r.url.split('/').last -> r).toMap
    assert(rs("a").delay == 1L && rs("a").target.endsWith("/one")) // first wins
    assert(rs("b").immediate && rs("b").target.endsWith("/sp?a=1&b=2")) // entity decoded
    assert(rs("c").has_refresh && rs("c").target == "") // no url= key → reload
    assert(!rs("d").has_refresh)                        // refreshx is not refresh
  }

  test("dedup funnel: hand corpus — exact removes copies, stage 2 matches pairs+cc") {
    import spark.implicits._
    val long1 = (1 to 40).map(i => s"common prefix sentence alpha beta gamma delta$i").mkString(" ")
    val near1 = long1 + " " // trailing space: md5 differs, shingles barely do
    val other = (1 to 40).map(i => s"completely different content zulu xray$i whiskey victor").mkString(" ")
    val corpus = Seq(
      (1L, long1), (2L, long1),      // exact pair → one removed at stage 1
      (3L, near1),
      (4L, other)).toDF("doc_id", "text")
    val rs = Dedup.dedupFunnel(corpus).orderBy("stage").collect()
    // stage 1 is hand-countable: 4 in, the md5 copy goes
    assert(rs(0).getString(0) == "1_exact" &&
      rs(0).getLong(1) == 4L && rs(0).getLong(2) == 3L && rs(0).getLong(3) == 1L)
    // stage 2 must agree exactly with the fingerprints: the 1↔3 pair is
    // removed iff their simhash hamming ≤ 3 (the 2 boundary grams the
    // trailing space adds flip every bit whose vote margin was within ±2,
    // so ≤3 is NOT guaranteed — compute, don't assume); 4 never pairs
    def fp(t: String) = Dedup.simhash64(Dedup.shingleStrings(t).toSeq, Dedup.shingleHashMd5)
    val ham = java.lang.Long.bitCount(fp(long1) ^ fp(near1))
    val expect2 = if (ham <= 3) 1L else 0L
    assert(rs(1).getString(0) == "2_simhash_cc" &&
      rs(1).getLong(1) == 3L && rs(1).getLong(3) == expect2,
      s"hamming=$ham, funnel=${rs(1)}")
    // double consistency: the full pairs+cc path agrees too
    val surv = corpus.where(col("doc_id") =!= 2L)
    val viaPairs = Dedup.connectedComponents(
        Dedup.simhashPairs(surv).select(col("a"), col("b")))
      .where(col("doc_id") =!= col("cluster_id")).count()
    assert(viaPairs == expect2)
  }
}
