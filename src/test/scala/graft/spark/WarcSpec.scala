package graft.spark

import java.nio.charset.StandardCharsets.UTF_8
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionFixture

/** WARC container parsing: plain + gzip-member forms, framing edge cases,
  * truncation tolerance, and the narrow plan shape of the ingest. */
class WarcSpec extends AnyFunSuite {

  lazy val spark = SparkSessionFixture.spark

  private def rec(i: Int, body: String): Array[Byte] =
    Warc.buildRecord(s"https://example.com/doc/$i", "2024-01-01T00:00:00Z",
      body.getBytes(UTF_8))

  test("plain concatenation round-trips; bodies byte-exact; headers parsed") {
    val blob = rec(1, "hello world") ++ rec(2, "second\r\nbody with CRLF") ++ rec(3, "")
    val rs = Warc.parseAll(blob)
    assert(rs.length == 3)
    assert(rs.map(_.targetUri) == Vector(
      "https://example.com/doc/1", "https://example.com/doc/2", "https://example.com/doc/3"))
    assert(new String(rs(1).body, UTF_8) == "second\r\nbody with CRLF")
    assert(rs(2).body.isEmpty)
    assert(rs.forall(_.recType == "response"))
    assert(rs.forall(_.warcDate == "2024-01-01T00:00:00Z"))
  }

  test("gzip-member container (the Common-Crawl form) parses identically") {
    val bodies = Seq("alpha", "beta beta", "éü unicode")
    val plain = bodies.zipWithIndex.map { case (b, i) => rec(i, b) }
    val gz = plain.map(Warc.gzipMember).reduce(_ ++ _)
    val rs = Warc.parseAll(gz)
    assert(rs.length == 3)
    assert(rs.map(r => new String(r.body, UTF_8)) == bodies.toVector)
    // identical result to the plain form
    val rp = Warc.parseAll(plain.reduce(_ ++ _))
    assert(rs.map(_.targetUri) == rp.map(_.targetUri))
    assert(rs.zip(rp).forall { case (a, b) => a.body.sameElements(b.body) })
  }

  test("truncation and garbage: parsed prefix survives, never throws") {
    val blob = rec(1, "complete record") ++ rec(2, "this one is cut")
    val cut = java.util.Arrays.copyOf(blob, blob.length - 10)
    assert(Warc.parseAll(cut).map(_.targetUri) == Vector("https://example.com/doc/1"))
    assert(Warc.parseAll(Array.fill[Byte](100)(0x42)).isEmpty)
    assert(Warc.parseAll(Array.emptyByteArray).isEmpty)
    assert(Warc.parseAll(null).isEmpty)
    // truncated gzip member: first member still yields its record
    val gz = Warc.gzipMember(rec(1, "a")) ++
      Warc.gzipMember(rec(2, "b")).take(5)
    assert(Warc.parseAll(gz).map(_.targetUri) == Vector("https://example.com/doc/1"))
  }

  test("records(): narrow flatMap, zero Exchange; md5 matches bodies") {
    import spark.implicits._
    val blob = rec(7, "payload seven") ++ rec(8, "payload eight")
    val df = Seq((0L, Warc.gzipMember(rec(7, "payload seven")) ++
        Warc.gzipMember(rec(8, "payload eight"))),
      (1L, blob)).toDF("blob_id", "warc")
    val out = Warc.records(df)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(400))
    val rows = out.collect().sortBy(r => (r.blob_id, r.rec_idx))
    assert(rows.length == 4)
    // same logical records in both container forms → same md5s
    assert(rows.filter(_.blob_id == 0L).map(_.body_md5).toSeq ==
      rows.filter(_.blob_id == 1L).map(_.body_md5).toSeq)
    val expectedMd5 = java.security.MessageDigest.getInstance("MD5")
      .digest("payload seven".getBytes(UTF_8)).map(x => f"$x%02x").mkString
    assert(rows.head.body_md5 == expectedMd5)
    assert(rows.head.n_bytes == "payload seven".length.toLong)
  }

  test("wat export: pinned record md5, JSON escaping, null-payload totality") {
    val pages = graft.ops.LinkGraph.synthCorpus(spark, 40)
    val byUrl = Warc.watExport(pages).collect().map(r => r.url -> r).toMap
    val p0 = byUrl("https://site0.example/a/p0")
    assert(p0.title == "Page 0" && p0.n_links == 5L)
    assert(p0.rec_md5 == "d6628ff8b1ee5860a5070b02ffcd4d17") // session-pinned
    assert(p0.rec_len == p0.json_len + 135L, "framing overhead is fixed for this url")

    // quotes and backslashes in title/links must escape, not corrupt JSON
    import spark.implicits._
    val tricky = Seq(graft.spark.PageRow("https://t.example/x",
      new java.sql.Timestamp(0L),
      """<html><head><title>A "B" \ C</title></head><body></body></html>"""
        .getBytes(UTF_8), null, "en")).toDS()
    val tr = Warc.watExport(tricky).collect().head
    assert(tr.title == "A \"B\" \\ C")
    assert(tr.json_len > 0)
    // a null payload still emits a (titleless, linkless) record
    val nul = Seq(graft.spark.PageRow("https://t.example/null",
      new java.sql.Timestamp(0L), null, null, "en")).toDS()
    val nr = Warc.watExport(nul).collect().head
    assert(nr.title == "" && nr.n_links == 0L && nr.rec_len > 0L)
  }
}
