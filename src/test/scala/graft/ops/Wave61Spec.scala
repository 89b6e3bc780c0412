package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionFixture
import graft.core.{PdfDocument, Rect, Redact, Reports, SynthPdf}

/** Wave 61: PDF redaction, paper-size classification, link prediction. */
class Wave61Spec extends AnyFunSuite {

  lazy val spark = SparkSessionFixture.spark

  test("redaction: partial-line rect drops only overlapped words; writer fill painted") {
    val doc = PdfDocument.load(SynthPdf.redactPdf, "").toOption.get
    val tp = doc.page(0).textPage
    // the secret line spans x≈50..~190 at y∈[676,691]; clip only its left half
    val half = Rect(45, 676, 100, 694)
    val t = Redact.redactedText(tp, Seq(half))
    assert(!t.contains("SECRET"))
    assert(t.contains("123-45-6789")) // right half of the line survives
    assert(t.contains("public line one") && t.contains("public line two"))

    // writer-side: fill op present, object gone, secret unextractable
    val out = Redact.applyRedactions(doc, 0, Seq(Rect(45, 676, 400, 694)))
    val doc2 = PdfDocument.load(out, "").toOption.get
    val content = new String(doc2.page(0).contentBytes,
      java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(content.contains("re f"))
    assert(!doc2.page(0).textPage.text.contains("SECRET"))
    // a rect hitting nothing removes nothing
    val noop = Redact.applyRedactions(doc, 0, Seq(Rect(400, 10, 500, 20)))
    val doc3 = PdfDocument.load(noop, "").toOption.get
    assert(doc3.page(0).textPage.text.contains("SECRET"))
  }

  test("paper size: tolerance boundary, rotation-aware landscape") {
    assert(Reports.paperSize(595.3, 841.9) == "a4")
    assert(Reports.paperSize(841.9, 595.3) == "a4")    // landscape same paper
    assert(Reports.paperSize(596.5, 842.0) == "a4")    // inside ±1.5
    assert(Reports.paperSize(597.0, 842.0) == "other") // outside
    assert(Reports.paperSize(612.0, 1008.0) == "legal")
    assert(Reports.paperSize(100.0, 100.0) == "other")
  }

  test("link prediction: exact tiny graph and hub cap") {
    import spark.implicits._
    // triangle 1-2-3 plus pendant 3-4: candidates are exactly (1,4),(2,4)
    val e1 = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("src", "dst")
    val r1 = Graph.linkPredict(e1, maxDeg = 8, topN = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(r1.toSet == Set((1L, 4L, 1L, 333333L), (2L, 4L, 1L, 333333L)))

    // star: center 0, leaves 1..20 — cap 8 keeps only the 8 smallest
    // leaves' wedges: C(8,2)=28 pairs, ra = 1e6/20 = 50000 each
    val star = (1L to 20L).map(i => (0L, i)).toDF("src", "dst")
    val r2 = Graph.linkPredict(star, maxDeg = 8, topN = 100).collect()
    assert(r2.length == 28)
    assert(r2.forall(r => r.getLong(2) == 1L && r.getLong(3) == 50000L))
    assert(r2.forall(r => r.getLong(0) <= 8L && r.getLong(1) <= 8L))
  }
}
