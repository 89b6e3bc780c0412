package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSessionFixture

/** SURT keys + CDX capture index (ops/CdxIndex.scala), recrawl scheduling
  * (ops/Recrawl.scala), and corpus BPE encoding (Tokenizer.bpeEncode). */
class CrawlIndexSpec extends AnyFunSuite {

  lazy val spark = SparkSessionFixture.spark
  import spark.implicits._

  test("surtKey: host reversal, port retention, path+query carried") {
    val rows = Seq(
      "https://www.site7.com/p/3?a=1&b=2",
      "http://site2.net:8080/",
      "https://a.b.co.uk/x",
      "https://single/")
      .toDF("url_canon")
      .select(CdxIndex.surtKey(col("url_canon")).as("surt"))
      .as[String].collect().toSeq
    assert(rows == Seq(
      "com,site7,www)/p/3?a=1&b=2",
      "net,site2:8080)/",
      "uk,co,b,a)/x",
      "single)/"))
  }

  test("surtKey sorts a domain's subtree contiguously") {
    val urls = Seq(
      "https://www.ex.com/a", "https://ex.com/z", "https://mail.ex.com/q",
      "https://exa.com/m", "https://ex.org/a")
    val surts = urls.toDF("url_canon")
      .select(CdxIndex.surtKey(col("url_canon")).as("s"))
      .as[String].collect().sorted.toSeq
    // all com,ex* keys are adjacent; the org key sorts away from them
    val exComBlock = surts.zipWithIndex.filter(_._1.startsWith("com,ex)")).map(_._2)
    assert(exComBlock == (exComBlock.min to exComBlock.max))
    assert(surts.count(_.startsWith("com,ex")) == 4)
  }

  test("cdx build: algebraic rollup with deterministic latest capture") {
    val caps = Seq(
      ("https://ex.com/a", 100L, "d1"),
      ("https://ex.com/a", 300L, "d2"),
      ("https://ex.com/a", 200L, "d1"),
      ("https://ex.com/b", 50L, "d9"))
      .toDF("url_canon", "warc_ts", "digest")
    val out = CdxIndex.build(caps).orderBy("surt")
      .as[(String, Long, Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      ("com,ex)/a", 3L, 2L, 100L, 300L, "d2"),
      ("com,ex)/b", 1L, 1L, 50L, 50L, "d9")))
  }

  test("recrawl schedule: lag-based change count, Laplace priority, per-domain top-k") {
    // u1: A A B B → 1 change; u2: A B C D → 3; u3 (other domain): A A A A → 0
    def hist(u: String, dom: String, md5s: Seq[String]) =
      md5s.zipWithIndex.map { case (m, k) => (u, dom, k.toLong, m) }
    val h = (hist("u1", "d1", Seq("A", "A", "B", "B")) ++
      hist("u2", "d1", Seq("A", "B", "C", "D")) ++
      hist("u3", "d2", Seq("A", "A", "A", "A")))
      .toDF("url_canon", "domain", "snap_k", "content_md5")
    val out = Recrawl.schedule(h, topK = 1).orderBy("domain")
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("d1", "u2", 4L, 3L, 875000L, 1L),  // (2*3+1)*1e6 / 8
      ("d2", "u3", 4L, 0L, 125000L, 1L))) // (2*0+1)*1e6 / 8
  }

  test("bpeEncode: hand-computed per-doc pins") {
    val docs = Seq(
      (1L, "the thin cat"),
      (2L, "AB c4t and"),
      (3L, "")).toDF("doc_id", "text")
    val out = Tokenizer.bpeEncode(docs).orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // the → [the] (t,h then th,e); thin → [th,in]; cat → [c,a,t] unmerged
    // AB → OOV 2; c4t → OOV 3; and → [and] (a,n then an,d)
    assert(out == Seq(
      (1L, 3L, 6L, 2L, 14L),
      (2L, 3L, 6L, 1L, 14L),
      (3L, 0L, 0L, 0L, 0L)))
  }

  test("bpeEncode column path equals applyMerge reference on varied words") {
    val words = Seq("the", "theater", "north", "and", "stand", "intone",
      "resting", "ingest", "zzz", "a", "ther", "inging", "eres", "anand")
    val expected = words.map { w =>
      val toks = Tokenizer.PinnedMerges.foldLeft(w.toVector.map(_.toString)) {
        case (t, (a, b)) => Tokenizer.applyMerge(t, a, b)
      }
      toks.length.toLong
    }
    val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val out = Tokenizer.bpeEncode(docs).as[(Long, Long, Long, Long, Long)].head()
    assert(out._2 == words.length.toLong)
    assert(out._3 == expected.sum)
    assert(out._5 == expected.map(t => t * t).sum)
  }
}
