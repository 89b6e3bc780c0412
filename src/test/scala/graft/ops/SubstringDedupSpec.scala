package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionFixture

/** Exact-substring dedup at character granularity (Lee et al. 2022 shape):
  * span detection (Dedup.substringSpans) and span removal
  * (Dedup.substringRewrite), hand-verified on planted duplicates. */
class SubstringDedupSpec extends AnyFunSuite {

  lazy val spark = SparkSessionFixture.spark
  import spark.implicits._

  // 45 distinct chars — no internal repeats, so spans come only from
  // genuine cross/within-doc duplication
  private val P = (('a' to 'z').mkString + "0123456789ABCDEFGHI")
  private val Q = P.substring(0, 40)
  private val docs = Seq(
    (1L, P + "!tail-one##"),        // P shared with doc 2 → span [1,45]
    (2L, "head-two###" + P),        // → span [12,56]
    (3L, "completely different and rather unique sentence zz"),
    (4L, Q + "-|-" + Q))            // WITHIN-doc repeat → two spans
    .toDF("doc_id", "text")

  test("substringSpans: cross-doc and within-doc duplicated spans, merged per doc") {
    assert(P.length == 45)
    val got = Dedup.substringSpans(docs, L = 40)
      .orderBy("doc_id", "span_start")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 1L, 45L, 6L),   // grams at pos 1..6 all duplicated
      (2L, 12L, 56L, 6L),
      (4L, 1L, 40L, 1L),   // leading Q
      (4L, 44L, 83L, 1L))) // trailing Q: gap 43 > L → separate island
  }

  test("substringRewrite: spans cut byte-exactly, untouched docs pass through") {
    def md5(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val got = Dedup.substringRewrite(docs, L = 40)
      .orderBy("doc_id").as[(Long, Long, Long, Long, String)].collect().toSeq
    val d3 = "completely different and rather unique sentence zz"
    assert(got == Seq(
      (1L, 1L, 45L, 11L, md5("!tail-one##")),
      (2L, 1L, 45L, 11L, md5("head-two###")),
      (3L, 0L, 0L, d3.length.toLong, md5(d3)),
      (4L, 2L, 80L, 3L, md5("-|-"))))
  }

  test("adjacent spans merge into one island") {
    // two duplicated 40-grams at gap exactly L merge (contiguous coverage)
    val r = "R" + ('a' to 'z').mkString + "0123456789ABC" // 40 distinct chars
    val s = "S" + ('a' to 'z').mkString + "0123456789ABC"
    assert(r.length == 40 && s.length == 40)
    val d = Seq(
      (1L, r + s),           // hits at pos 1 and 41, gap 40 → ONE island [1,80]
      (2L, "x" + r + "y" + s)) // provide the duplicate occurrences
      .toDF("doc_id", "text")
    val got = Dedup.substringSpans(d, L = 40)
      .orderBy("doc_id", "span_start")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got.head == ((1L, 1L, 80L, 2L)))
  }
}
