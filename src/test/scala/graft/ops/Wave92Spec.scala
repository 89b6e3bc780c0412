package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionFixture

/** Wave 92: semantic eval decontamination, PDF/A + tagged conformance. */
class Wave92Spec extends AnyFunSuite {
  lazy val spark = SparkSessionFixture.spark

  test("semantic decontamination: planted near-copy flags, orthogonal doesn't") {
    import spark.implicits._
    // eval 0 = e1 axis, eval 1 = e2 axis; corpus: 20 ≈ eval0 (cos ~0.995),
    // 21 ⊥ both evals, 22 anti-parallel to eval1 (cos −1 → not flagged)
    val rows = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)),
      (1L, Seq(0f, 1f, 0f, 0f)),
      (20L, Seq(10f, 1f, 0f, 0f)),
      (21L, Seq(0f, 0f, 1f, 0f)),
      (22L, Seq(0f, -1f, 0f, 0f)))
    val out = Similarity.semanticDecontaminate(
        rows.toDF("vec_id", "embedding"), nEval = 2, threshold = 0.8)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("nearest_eval"), r.getAs[Double]("max_cos"),
          r.getAs[Boolean]("contaminated"))).toMap
    assert(out(20L)._1 == 0L && out(20L)._3, "near-copy of eval0 must flag")
    assert(!out(21L)._3, "orthogonal vector must not flag")
    assert(out(22L)._1 == 0L && out(22L)._2 == 0.0 && !out(22L)._3,
      "anti-parallel picks the higher (zero) cosine eval, unflagged")
  }

  test("conformance: PDF/A, tagged-only, and plain docs triage correctly") {
    val pdfa = graft.core.PdfDocument.load(graft.spark.SynthFixtures.pdfaPdf, "")
      .toOption.get
    assert(graft.core.Reports.conformance(pdfa) == ("1", "B", true, "en-US", 1))
    val tagged = graft.core.PdfDocument.load(graft.spark.SynthFixtures.taggedPdf, "")
      .toOption.get
    assert(graft.core.Reports.conformance(tagged) == ("", "", true, "", 0))
    val plain = graft.core.PdfDocument.load(graft.core.SynthPdf.multiPage(1), "")
      .toOption.get
    assert(graft.core.Reports.conformance(plain) == ("", "", false, "", 0))
  }
}
