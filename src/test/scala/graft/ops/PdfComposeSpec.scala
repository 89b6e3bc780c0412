package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionFixture
import graft.spark.{PageRow, PagesTable}

/** Composed PDF pipelines: portfolio recursion, TOC chunking. */
class PdfComposeSpec extends AnyFunSuite {

  lazy val spark = SparkSessionFixture.spark
  import spark.implicits._

  test("portfolio: writer-attached PDF re-extracts; non-PDF reported; depth bounded") {
    val rows = Seq(PageRow("p://1", new java.sql.Timestamp(0L),
      PdfCompose.synthPortfolio(), null, "en")).toDS()
    val out = PdfCompose.portfolioExtract(rows).collect()
      .map(r => r.att_name -> r).toMap
    assert(out("inner.pdf").is_pdf && out("inner.pdf").n_pages == 3L)
    assert(out("inner.pdf").text_prefix.startsWith("Page\n1"))
    assert(!out("note.txt").is_pdf && out("note.txt").n_chars == 21L)
    // depth bound: a portfolio INSIDE a portfolio is listed, not recursed
    val host2 = graft.core.PdfDocument.load(PagesTable.fixture("text.pdf")).toOption.get
    val nested = graft.core.PdfWriter.writeEdited(host2, graft.core.EditSpec(
      newAttachments = Seq(("level1.pdf", PdfCompose.synthPortfolio()))))
    val out2 = PdfCompose.portfolioExtract(
      Seq(PageRow("p://2", new java.sql.Timestamp(0L), nested, null, "en")).toDS())
      .collect()
    assert(out2.length == 1 && out2.head.att_name == "level1.pdf" && out2.head.is_pdf)
  }

  test("hreflang: decoys skipped, quote/attr variance parsed, clusters self-consistent") {
    val alts = Hreflang.extractAlternates(
      """<html><head><!-- <link rel="alternate" hreflang="xx" href="https://no/"> -->
        |<link href='https://t/x/de' hreflang='de' rel='alternate'>
        |<link HREFLANG="fr" REL="alternate" HREF="https://t/x/fr">
        |<link rel="stylesheet" href="/css"></head>
        |<body><link rel="alternate" hreflang="zz" href="https://body/"></body></html>"""
        .stripMargin, "https://t/x/de")
    assert(alts.map(a => (a.hreflang, a.href)) ==
      Vector(("de", "https://t/x/de"), ("fr", "https://t/x/fr")))
    val out = Hreflang.clusters(Hreflang.synthMultilingual(spark, 5)).collect()
    assert(out.length == 5)
    out.foreach { r =>
      assert(r.getAs[Long]("n_pages") == 3L)
      assert(r.getAs[String]("langs_csv") == "de,en,fr")
    }
  }

  test("wet shards: incremental digest equals whole-string digest; shards partition the corpus") {
    val docs = (0L until 50L).map(i => (i, s"text body $i")).toDF("doc_id", "text")
    val out = graft.spark.Warc.wetShards(docs, nShards = 4).collect()
    assert(out.map(_.n_records).sum == 50L)
    assert(out.map(_.shard).toSet == Set(0L, 1L, 2L, 3L))
    // recompute shard 1's digest from the whole concatenated string
    val recs = (0L until 50L).filter(_ % 4 == 1).map { i =>
      val t = s"text body $i"
      s"WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: https://example.com/doc/$i\r\nContent-Length: ${t.length}\r\n\r\n$t\r\n\r\n"
    }.mkString
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(recs.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map(x => f"$x%02x").mkString
    assert(out.find(_.shard == 1L).get.shard_md5 == md5)
  }

  test("header/footer: fixtures behave, single-page docs never flag") {
    val out = PdfCompose.headerFooterScan(
      PagesTable.ofFixtures(spark, Seq("multipage.pdf", "empty.pdf")))
      .collect().map(r => r.url -> r).toMap
    val mp = out("fixture://multipage.pdf")
    assert(mp.repeated_lines == "Page" && mp.n_lines_removed == 1L)
    assert(mp.chars_removed == 12L && mp.chars_kept == 3L)
    // a 1-page doc can't have "repeated" lines (n >= 2 gate)
    val ep = out("fixture://empty.pdf")
    assert(ep.n_lines_removed == 0L)
  }

  test("header/footer: 600-permille boundary is inclusive, below-threshold lines survive") {
    // synthesized 5-page doc: 'HDR' on pages 0-2 (exactly 3/5 = 600‰ →
    // flagged under >=, a '>' regression fails here); 'RARE' on 1/5 stays
    val contents = (0 until 5).map { i =>
      val hdr = if (i < 3) "BT /F1 12 Tf 72 720 Td (HDR) Tj 0 -30 Td (u" + i + ") Tj ET"
                else if (i == 3) "BT /F1 12 Tf 72 720 Td (RARE) Tj 0 -30 Td (u" + i + ") Tj ET"
                else "BT /F1 12 Tf 72 720 Td (u" + i + ") Tj ET"
      hdr
    }
    val fontRef = 3 + 2 * contents.length
    val objs = Vector.newBuilder[Array[Byte]]
    objs += "<</Type/Catalog/Pages 2 0 R>>".getBytes
    val kids = contents.indices.map(i => s"${3 + 2 * i} 0 R").mkString(" ")
    objs += s"<</Type/Pages/Kids[$kids]/Count ${contents.length}>>".getBytes
    contents.zipWithIndex.foreach { case (c, i) =>
      objs += (s"<</Type/Page/Parent 2 0 R/MediaBox[0 0 612 792]" +
        s"/Resources<</Font<</F1 $fontRef 0 R>>>>/Contents ${4 + 2 * i} 0 R>>").getBytes
      objs += (s"<</Length ${c.length}>>\nstream\n$c\nendstream").getBytes
    }
    objs += "<</Type/Font/Subtype/Type1/BaseFont/Helvetica>>".getBytes
    val pdf = graft.core.SynthPdf.build(objs.result())
    val rows = Seq(PageRow("synth://hdr", new java.sql.Timestamp(0L), pdf, null, "en")).toDS()
    val r = PdfCompose.headerFooterScan(rows).collect().head
    assert(r.n_pages == 5L)
    assert(r.repeated_lines == "HDR", s"got '${r.repeated_lines}'")
    assert(r.chars_removed == 9L) // 'HDR' ×3
  }

  test("dau/wau: trailing window distinct, stickiness bounds") {
    import spark.implicits._
    val ts = (d: Int, u: Long) =>
      (new java.sql.Timestamp(1704067200000L + d * 86400000L), u)
    // user 1 daily; user 2 only day 0; user 3 only day 8
    val ev = (0 to 9).map(d => ts(d, 1L)) ++ Seq(ts(0, 2L), ts(8, 3L))
    val df = ev.toDF("ts", "user_id")
    val m = Relational.dauWau(df).collect()
      .map(r => r.getDate(0).toString -> (r.getAs[Long]("dau"), r.getAs[Long]("wau"))).toMap
    assert(m("2024-01-01") == ((2L, 2L)))  // day 0: users 1,2
    assert(m("2024-01-05") == ((1L, 2L)))  // day 4 window covers day 0's user 2
    assert(m("2024-01-08") == ((1L, 1L)))  // day 7: user 2 aged out
    assert(m("2024-01-09") == ((2L, 2L)))  // day 8: users 1,3
    m.values.foreach { case (dau, wau) => assert(dau <= wau) }
  }

  test("toc chunks: spans partition the document in order, char sums match pages") {
    val out = PdfCompose.tocChunks(PagesTable.ofFixtures(spark, Seq("toc.pdf")))
      .collect().sortBy(_.idx)
    assert(out.length == 9)
    assert(out.head.title == "One" && out.head.page_from == 0L)
    // a section never starts before the previous one
    out.sliding(2).foreach { case Array(a, b) =>
      assert(b.page_from >= a.page_from)
    }
    // same-page siblings share the span; the last section runs to the end
    assert(out.last.page_to == 1L)
    // malformed TOC (cycle) must not hang or throw
    val circ = PdfCompose.tocChunks(PagesTable.ofFixtures(spark, Seq("toc_circular.pdf")))
      .collect()
    assert(circ.length >= 0)
  }

  test("revisionReport: %%EOF inside content data never throws; real revisions parse") {
    import spark.implicits._
    // a content stream that CONTAINS the %%EOF marker bytes in a string
    val cs = "BT /F1 12 Tf 1 0 0 1 72 700 Tm (fake %%EOF inside) Tj ET"
    val tricky = graft.core.RawPdf.assemble(Seq(
      "<</Type/Catalog/Pages 2 0 R>>",
      "<</Type/Pages/Kids[3 0 R]/Count 1>>",
      "<</Type/Page/Parent 2 0 R/MediaBox[0 0 612 792]/Contents 4 0 R" +
        "/Resources<</Font<</F1 5 0 R>>>>>>",
      s"<</Length ${cs.length}>>\nstream\n$cs\nendstream",
      "<</Type/Font/Subtype/Type1/BaseFont/Helvetica>>"))
    val rows = Seq(graft.spark.PageRow("t://x",
      new java.sql.Timestamp(0L), tricky, null, "en")).toDS()
    val out = PdfCompose.revisionReport(rows).collect().sortBy(_.rev_idx)
    // two markers: the embedded bytes and the real EOF; the LAST revision
    // is the complete document and must parse with the full text
    assert(out.length == 2)
    assert(out.last.ok && out.last.text == "fake %%EOF inside")
    // the mid-stream prefix either fails cleanly or recovers -- no throw
    assert(out.head.rev_idx == 0L)
  }

  test("Signatures.scan: nested Kids, missing ByteRange, unsigned field") {
    import graft.core._
    val pdf = RawPdf.assemble(Seq(
      "<</Type/Catalog/Pages 2 0 R/AcroForm<</Fields[4 0 R 6 0 R]>>>>",
      "<</Type/Pages/Kids[3 0 R]/Count 1>>",
      "<</Type/Page/Parent 2 0 R/MediaBox[0 0 100 100]>>",
      // parent node whose KID is the signature field
      "<</T(grp)/Kids[5 0 R]>>",
      "<</FT/Sig/T(inner)/V<</Type/Sig/SubFilter/adbe.x509.rsa_sha1/Name(B)>>>>",
      // unsigned signature field: FT Sig, no /V
      "<</FT/Sig/T(blank)>>"))
    val doc = PdfDocument.load(pdf).toOption.get
    val sigs = Signatures.scan(doc, pdf.length.toLong)
    assert(sigs.map(_.fieldName) == Vector("inner"))
    assert(sigs.head.byteRange.isEmpty && !sigs.head.coversFile
      && sigs.head.trailingBytes == -1L)
    assert(sigs.head.subFilter == "adbe.x509.rsa_sha1")
  }

  test("Signatures: crafted near-empty ByteRange must NOT report covers_file") {
    import graft.core._
    // hole [16, len-16) is vastly wider than the /Contents blob: almost
    // nothing is digested even though ranges touch both file ends
    def sig(a: Long, b: Long, c: Long, d: Long) = RawPdf.assemble(Seq(
      "<</Type/Catalog/Pages 2 0 R/AcroForm<</Fields[4 0 R]>>>>",
      "<</Type/Pages/Kids[3 0 R]/Count 1>>",
      "<</Type/Page/Parent 2 0 R/MediaBox[0 0 100 100]>>",
      "<</FT/Sig/T(s)/V<</Type/Sig/ByteRange[" + s"$a $b $c $d" +
        "]/Contents<deadbeef>>>>>"))
    val probe = sig(0, 16, 999999, 16)
    val len = probe.length.toLong
    val crafted = sig(0, 16, len - 16, 16) // same digit widths not needed: re-scan
    val doc = PdfDocument.load(crafted).toOption.get
    val out = Signatures.scan(doc, crafted.length.toLong)
    assert(out.length == 1)
    assert(!out.head.coversFile,
      s"hole ${out.head.byteRange} certified despite digesting almost nothing")
  }
}
