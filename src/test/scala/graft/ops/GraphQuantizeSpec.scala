package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSessionFixture

/** Integer TrustRank (Graph.trustRankInt), PQ encoding (Quantize.pqEncode)
  * and the politeness fetch planner (Recrawl fetch-plan trio). */
class GraphQuantizeSpec extends AnyFunSuite {

  lazy val spark = SparkSessionFixture.spark
  import spark.implicits._

  test("trustRankInt: hand-computed two-round trajectory, spam scores zero") {
    // ring 0→1→2→0 plus spam node 3→0; only node 0 is a trusted seed
    val nodes = Seq((0L, true), (1L, false), (2L, false), (3L, false))
      .toDF("id", "is_seed")
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L), (3L, 0L)).toDF("src", "dst")
    val r2 = Graph.trustRankInt(nodes, edges, iters = 2)
      .orderBy("id").as[(Long, Boolean, Long)].collect().toSeq
    // s1 = [150000, 850000, 0, 0]; s2 = [150000+.85*850000? no: contribs
    // into 0 come from 2 (score 0) and 3 (score 0) → s2(0)=150000;
    // s2(1)=floor(.85*150000)=127500; s2(2)=floor(.85*850000)=722500; s2(3)=0
    assert(r2 == Seq(
      (0L, true, 150000L), (1L, false, 127500L),
      (2L, false, 722500L), (3L, false, 0L)))
    // trust never reaches the spam node (no in-links from trusted side)
    val r5 = Graph.trustRankInt(nodes, edges, iters = 5)
      .where(col("id") === 3).select("score").as[Long].head()
    assert(r5 == 0L)
  }

  test("hitsInt: hand-computed one-round hubs/authorities with max normalization") {
    val nodes = Seq(0L, 1L, 2L, 3L).toDF("id")
    val edges = Seq((0L, 1L), (0L, 2L), (3L, 1L)).toDF("src", "dst")
    val out = Graph.hitsInt(nodes, edges, iters = 1)
      .orderBy("id").as[(Long, Long, Long)].collect().toSeq
    // a1 raw: n1=2e6, n2=1e6 → max-norm: n1=1e6, n2=5e5
    // h1 raw: n0=auth1+auth2=1.5e6, n3=auth1=1e6 → n0=1e6, n3=666666
    assert(out == Seq(
      (0L, 1000000L, 0L), (1L, 0L, 1000000L),
      (2L, 0L, 500000L), (3L, 666666L, 0L)))
  }

  test("winnowPairs: shared spans pair up, unrelated docs don't") {
    val shared = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (1L, shared + " with tail one"),
      (2L, "lead text then " + shared),
      (3L, "zq xv qp wk jn bb cc dd ee ff gg hh ii jj kk ll mm nn oo"))
      .toDF("doc_id", "text")
    val out = TextStats.winnowPairs(docs, minShared = 3)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out.map(p => (p._1, p._2)) == Seq((1L, 2L)))
    assert(out.head._3 >= 3L)
  }

  /** Reference PQ encode: same formula in plain Scala. */
  private def pqRef(emb: Seq[Float], dim: Int, m: Int): Seq[(Long, Long, Long)] = {
    val d0 = dim / m
    (0 until m).map { s =>
      val packed = (0 until 16).map { j =>
        val dist = (s * d0 until (s + 1) * d0).map { t =>
          val q = math.floor(emb(t).toDouble * 1000).toLong
          val cv = ((j * 31 + t * 17) % 2001) - 1000L
          (q - cv) * (q - cv)
        }.sum
        dist * 16 + j
      }.min
      (s.toLong, packed % 16, packed >> 4)
    }
  }

  test("pqEncode matches the reference fold on varied vectors") {
    val vecs = Seq(
      (1L, Array.tabulate(64)(t => math.sin(t * 0.7).toFloat)),
      (2L, Array.fill(64)(0.0f)),
      (3L, Array.tabulate(64)(t => (if (t % 2 == 0) 1.0f else -1.0f))),
      (4L, Array.tabulate(64)(t => (t - 32) / 33.0f)))
    val got = Quantize.pqEncode(vecs.toDF("vec_id", "embedding"))
      .orderBy("vec_id", "sub").as[(Long, Long, Long, Long)].collect().toSeq
    val expect = vecs.flatMap { case (id, e) =>
      pqRef(e.toSeq, 64, 4).map { case (s, c, err) => (id, s, c, err) }
    }
    assert(got == expect)
  }

  test("adcTopK matches a reference ADC scan (codes → asymmetric distances → top-k)") {
    val vecs = (0L until 30L).map(id =>
      (id, Array.tabulate(64)(t => math.sin(id * 1.3 + t * 0.41).toFloat)))
    val got = Quantize.adcTopK(vecs.toDF("vec_id", "embedding"), nQueries = 3, k = 4)
      .orderBy("vec_id", "rank").as[(Long, Long, Long, Long)].collect().toSeq
    // reference: encode every vector with pqRef, score every (query, vec)
    val codes = vecs.map { case (id, e) => id -> pqRef(e.toSeq, 64, 4).map(_._2) }.toMap
    def adc(qe: Array[Float], cs: Seq[Long]): Long =
      (0 until 4).map { s =>
        (s * 16 until (s + 1) * 16).map { t =>
          val q = math.floor(qe(t).toDouble * 1000).toLong
          val cv = ((cs(s) * 31 + t * 17) % 2001) - 1000L
          (q - cv) * (q - cv)
        }.sum
      }.sum
    val expect = (0L until 3L).flatMap { qid =>
      val qe = vecs(qid.toInt)._2
      vecs.filter(_._1 != qid)
        .map { case (cid, _) => (cid, adc(qe, codes(cid))) }
        .sortBy { case (cid, d) => (d, cid) }.take(4).zipWithIndex
        .map { case ((cid, d), r) => (qid, (r + 1).toLong, cid, d) }
    }
    assert(got == expect)
  }

  test("corpusGate: first-failing reason precedence") {
    val good = (1 to 60).map(i => s"tok$i").mkString(" ") +
      " the and of that have with be to"
    val repeated = (("spam " * 80) + "the and of that have with be to " +
      (1 to 20).map(i => s"w$i").mkString(" ")).trim
    val short = "the and of"
    val docs = Seq((1L, good), (2L, repeated), (3L, short)).toDF("doc_id", "text")
    val out = TextStats.corpusGate(docs).orderBy("doc_id")
      .select("doc_id", "reason", "keep").as[(Long, String, Boolean)].collect().toSeq
    assert(out(0) == ((1L, "keep", true)))
    assert(out(1)._2 == "top_unigram" && !out(1)._3) // repetition cap fires
    assert(out(2) == ((3L, "gopher", false)))        // too short → gopher first
  }

  test("wetExport: byte-exact WET conversion record (md5 pinned via reference build)") {
    val docs = Seq((7L, "Hello, WET world."), (8L, "")).toDF("doc_id", "text")
    val got = graft.spark.Warc.wetExport(docs).orderBy("url")
      .as[(String, Long, Long, String)].collect().toSeq
    val expect = Seq(7L -> "Hello, WET world.", 8L -> "").map { case (id, text) =>
      val url = s"https://example.com/doc/$id"
      val rec = s"WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: $url\r\n" +
        s"Content-Length: ${text.getBytes("UTF-8").length}\r\n\r\n$text\r\n\r\n"
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(rec.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      (url, text.getBytes("UTF-8").length.toLong, rec.getBytes("UTF-8").length.toLong, md5)
    }.sortBy(_._1)
    assert(got == expect)
  }

  test("crawlDelayFor: group selection, overwrite, invalid values") {
    val txt =
      """User-agent: *
        |Crawl-delay: 5
        |Disallow: /tmp
        |
        |User-agent: graftbot
        |Crawl-delay: banana
        |Crawl-delay: 2
        |Allow: /
        |""".stripMargin
    assert(Robots.crawlDelayFor(txt, "graftbot/1.0") == Some(2L))
    assert(Robots.crawlDelayFor(txt, "otherbot") == Some(5L))
    assert(Robots.crawlDelayFor("User-agent: *\nDisallow: /x", "any").isEmpty)
    assert(Robots.crawlDelayFor("User-agent: *\nCrawl-delay: -3", "any").isEmpty)
    // rulesFor unchanged by the delay-aware refactor
    assert(Robots.rulesFor(txt, "graftbot") == Vector(Robots.Rule(true, "/")))
    assert(Robots.rulesFor(txt, "nobody") == Vector(Robots.Rule(false, "/tmp")))
  }

  test("fetchPlan: delay-spaced offsets per domain, broadcast delays") {
    val sched = Seq(
      ("a.com", "https://a.com/1", 1L), ("a.com", "https://a.com/2", 2L),
      ("b.org", "https://b.org/1", 1L))
      .toDF("domain", "url_canon", "rnk")
    val delays = Seq(("a.com", 3L), ("b.org", 1L)).toDF("domain", "delay_s")
    val out = Recrawl.fetchPlan(sched, delays, workers = 8)
      .orderBy("domain", "rnk")
      .select("domain", "rnk", "delay_s", "fetch_offset_ms")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("a.com", 1L, 3L, 0L), ("a.com", 2L, 3L, 3000L), ("b.org", 1L, 1L, 0L)))
    // queue is stable per domain and within worker range
    val qs = Recrawl.fetchPlan(sched, delays, workers = 8)
      .select("domain", "queue").distinct().as[(String, Long)].collect().toMap
    assert(qs.size == 2 && qs.values.forall(q => q >= 0 && q < 8))
  }

  test("ivfAdcTopK matches a reference router+ADC scan") {
    val vecs = (0L until 40L).map(id =>
      (id, Array.tabulate(64)(t => math.cos(id * 0.9 + t * 0.33).toFloat)))
    val got = Quantize.ivfAdcTopK(vecs.toDF("vec_id", "embedding"), nQueries = 3, k = 4)
      .orderBy("vec_id", "rank").as[(Long, Long, Long, Long)].collect().toSeq
    def cellDist(e: Array[Float], j: Int): Long =
      (0 until 64).map { t =>
        val q = math.floor(e(t).toDouble * 1000).toLong
        val cv = ((j * 53 + t * 29) % 2001) - 1000L
        (q - cv) * (q - cv)
      }.sum
    val cells = vecs.map { case (id, e) =>
      id -> (0 until 16).map(j => cellDist(e, j) * 16 + j).min % 16
    }.toMap
    val codes = vecs.map { case (id, e) => id -> pqRef(e.toSeq, 64, 4).map(_._2) }.toMap
    def adc(qe: Array[Float], cs: Seq[Long]): Long =
      (0 until 4).map { s =>
        (s * 16 until (s + 1) * 16).map { t =>
          val q = math.floor(qe(t).toDouble * 1000).toLong
          val cv = ((cs(s) * 31 + t * 17) % 2001) - 1000L
          (q - cv) * (q - cv)
        }.sum
      }.sum
    val expect = (0L until 3L).flatMap { qid =>
      val qe = vecs(qid.toInt)._2
      val probes = (0 until 16).map(j => cellDist(qe, j) * 16 + j).sorted.take(4)
        .map(_ % 16).toSet
      vecs.filter { case (cid, _) => cid != qid && probes.contains(cells(cid)) }
        .map { case (cid, _) => (cid, adc(qe, codes(cid))) }
        .sortBy { case (cid, d) => (d, cid) }.take(4).zipWithIndex
        .map { case ((cid, d), r) => (qid, (r + 1).toLong, cid, d) }
    }
    assert(got == expect)
  }
}
