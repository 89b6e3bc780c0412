package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionFixture

/** Wave 111: span-level decontamination, per-doc n-gram novelty, and the
  * embedding variance-spectrum / effective-rank audit. */
class Wave111Spec extends AnyFunSuite {
  lazy val spark = SparkSessionFixture.spark

  test("contaminationSpans: contiguous hits merge into one span with the exact word length") {
    import spark.implicits._
    val bench = Seq((100L, "b1 b2 b3 b4 b5 b6 b7 b8 b9 b10")).toDF("doc_id", "text")
    val docs = Seq(
      (0L, "x1 x2 b1 b2 b3 b4 b5 b6 b7 b8 b9 b10 y1"), // 10 shared words → 3 grams, 1 span
      (1L, "clean text with no benchmark overlap at all here"),
      (2L, "b1 b2 b3 b4 b5 b6 b7 b8 gap gap gap gap gap gap gap gap b3 b4 b5 b6 b7 b8 b9 b10"))
      .toDF("doc_id", "text")
    val out = TextStats.contaminationSpans(docs, bench, n = 8)
      .orderBy("doc_id").collect()
    assert(out.length == 2) // doc 1 is clean → absent
    // doc 0: grams at pos 3,4,5 (1-based) are benchmark grams → one island of 3
    assert(out(0).getLong(0) == 0L)
    assert(out(0).getAs[Long]("n_hit_grams") == 3L)
    assert(out(0).getAs[Long]("n_spans") == 1L)
    assert(out(0).getAs[Long]("max_span_words") == 10L) // 3 + 7
    // doc 2: two separated quotes → two islands of 1 gram each
    assert(out(1).getLong(0) == 2L)
    assert(out(1).getAs[Long]("n_hit_grams") == 2L)
    assert(out(1).getAs[Long]("n_spans") == 2L)
    assert(out(1).getAs[Long]("max_span_words") == 8L) // 1 + 7
  }

  test("ngramNovelty: first occurrence wins, duplicates score zero, short docs sentinel -1") {
    import spark.implicits._
    val docs = Seq(
      (0L, "w1 w2 w3 w4 w5 w6 w7 w8"),        // 1 gram, first → 1000
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8"),        // exact dup → 0
      (2L, "short doc"),                       // <8 words → -1
      (3L, "w1 w2 w3 w4 w5 w6 w7 w8 w9"))     // grams: seen + new → 500
      .toDF("doc_id", "text")
    val out = TextStats.ngramNovelty(docs, n = 8).orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getAs[Long]("n_grams"),
      r.getAs[Long]("n_novel"), r.getAs[Long]("novel_pm"))).toSeq == Seq(
      (0L, 1L, 1L, 1000L),
      (1L, 1L, 0L, 0L),
      (2L, 0L, 0L, -1L),
      (3L, 2L, 1L, 500L)))
  }

  test("dimVariance: exact integer spectrum, share permille, PR=1000 when one dim carries all variance") {
    import spark.implicits._
    val emb = Seq(
      (0L, Seq(0.0f, 1.0f, 2.0f)),
      (1L, Seq(0.0f, 3.0f, 2.0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.dimVariance(emb).orderBy("d").collect()
    // q rows: [0,1000,2000] and [0,3000,2000]; n=2
    // d0: var_num = 2·0 − 0² = 0 ; d1: 2·(1e6+9e6) − 4000² = 4e6 ; d2: 2·8e6 − 4000² = 0
    assert(out.map(_.getAs[Long]("var_num")).toSeq == Seq(0L, 4000000L, 0L))
    assert(out.map(_.getAs[Long]("share_pm")).toSeq == Seq(0L, 1000L, 0L))
    // all variance on one dim → participation ratio exactly 1 → 1000 permille
    assert(out.forall(_.getAs[Long]("er_pm") == 1000L))
    assert(out.forall(_.getAs[Long]("n_vecs") == 2L))
  }

  test("dimVariance: isotropic two-dim case gives effective rank 2.0 and floor quantization matches negatives") {
    import spark.implicits._
    val emb = Seq(
      (0L, Seq(1.0f, -0.0015f)),
      (1L, Seq(-1.0f, 0.0015f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.dimVariance(emb).orderBy("d").collect()
    // floor(-0.0015·1000) = −2, floor(0.0015·1000) = 1 (floor, NOT trunc)
    assert(out(1).getAs[Long]("sum_q") == -1L)
    // d0: var = 2·2e6 − 0 = 4e6; d1: 2·5 − 1 = 9 → PR = (4e6+9)²·1000 // (16e12+81)
    val v0 = out(0).getAs[Long]("var_num"); val v1 = out(1).getAs[Long]("var_num")
    assert((v0, v1) == (4000000L, 9L))
    val expected = ((BigInt(v0 + v1).pow(2) * 1000) /
      (BigInt(v0).pow(2) + BigInt(v1).pow(2))).toLong
    assert(out(0).getAs[Long]("er_pm") == expected)
  }
}
