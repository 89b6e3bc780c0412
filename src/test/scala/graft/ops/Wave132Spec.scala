package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionFixture
import org.apache.spark.sql.functions._

/** Wave 132: Jaccard threshold curve and split-conformal length bounds. */
class Wave132Spec extends AnyFunSuite {
  lazy val spark = SparkSessionFixture.spark

  test("thresholdCurve: monotone non-increasing in the threshold; zeros kept") {
    import spark.implicits._
    // same-block docs with jaccard ≈ 11/13 (0.846) and ≈ 6/18 (0.33):
    // only the near-dup pair survives high thresholds
    val base = "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"
    val docs = Seq(
      (0L, base),
      (1L, base + " extra1 extra2"),           // high-overlap pair with 0
      (2L, "w0 w1 w2 w3 w4 w5 q1 q2 q3 q4 q5 q6 q7"))
      .toDF("doc_id", "text")
    val out = Dedup.thresholdCurve(docs).orderBy("threshold_pm").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.map(_._1).toSeq == Seq(500L, 600L, 700L, 800L, 900L))
    val pairs = out.map(_._2)
    assert(pairs.zip(pairs.tail).forall { case (a, b) => a >= b })
    // pair (0,1): trigram shingles 11 shared / 13 union = 846pm →
    // qualifies at 500-800, not 900
    assert(out(0)._2 >= 1L && out(3)._2 >= 1L)
    assert(out(4) == ((900L, 0L, 0L)))
  }

  test("thresholdCurve: n_docs counts distinct endpoints") {
    import spark.implicits._
    val t = "s0 s1 s2 s3 s4 s5 s6 s7 s8 s9"
    val docs = Seq((0L, t), (1L, t), (2L, t)).toDF("doc_id", "text")
    val out = Dedup.thresholdCurve(docs).orderBy("threshold_pm").collect()
    // identical docs: 3 pairs, 3 distinct docs at every threshold
    out.foreach { r =>
      assert(r.getLong(1) == 3L && r.getLong(2) == 3L)
    }
  }

  test("conformalBounds: hand ranks on a tiny calibration set") {
    import spark.implicits._
    // even ids (calibration): values 1..10 → n=10;
    // lo rank = max(1, 11·50 div 1000) = 1 → v=1;
    // hi rank = min(10, (11·950+999) div 1000) = 10 → v=10
    val docs = ((0 until 20 by 2).zip(1 to 10).map { case (id, v) =>
      (id.toLong, Seq.fill(v)("t").mkString(" ")) } ++
      Seq((1L, "a b c"), (3L, ("z " * 30).trim), (5L, "only one")))
      .toDF("doc_id", "text")
    val r = StatTests.conformalBounds(docs).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((10L, 3L, 1L, 10L)))
    // test half: 3, 30, 2 tokens → covered: 3 and 2 → 666pm
    assert(r.getLong(4) == 666L)
  }

  test("conformalBounds: realized coverage honors the guarantee on iid-ish data") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.01/documents.parquet")
      .select(col("doc_id"), col("text"))
    val r = StatTests.conformalBounds(docs).collect().head
    // α = 0.1 → expect ≥ ~900‰ coverage; allow finite-sample slack
    assert(r.getLong(4) >= 850L, s"coverage ${r.getLong(4)}")
    assert(r.getLong(2) <= r.getLong(3))
  }
}
