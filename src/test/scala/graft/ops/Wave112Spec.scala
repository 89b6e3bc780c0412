package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionFixture

/** Wave 112: filtered vector search — pre-filter ground truth vs
  * post-filter overfetch, per-rank hit evidence. */
class Wave112Spec extends AnyFunSuite {
  lazy val spark = SparkSessionFixture.spark

  private def emb(rows: (Long, Seq[Float])*) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("filteredTopK: pre-filter ranks within the tag; post-filter finds them when overfetch suffices") {
    val e = emb(
      0L -> Seq(1f, 0f),    // query, tag 0
      1L -> Seq(1f, 0f),    // tag 1, cos 1.0
      2L -> Seq(1f, 0.1f),  // tag 0, cos ≈ 0.9950
      3L -> Seq(1f, 0.2f),  // tag 1, cos ≈ 0.9806
      4L -> Seq(0f, 1f),    // tag 0, cos 0
      5L -> Seq(-1f, 0f))   // tag 1, cos −1
    val out = Similarity.filteredTopK(e, nQueries = 1, k = 2, nTags = 2, overfetch = 2)
      .orderBy("rank").collect()
    assert(out.map(r => (r.getAs[Long]("rank"), r.getAs[Long]("neighbor_id"),
      r.getAs[Boolean]("post_hit"))).toSeq == Seq((1L, 2L, true), (2L, 4L, true)))
    assert(out(0).getAs[Double]("sim") == 0.995)
    assert(out(1).getAs[Double]("sim") == 0.0)
  }

  test("filteredTopK: a selective tag starves the overfetched heap — post_hit goes false") {
    // every tag-1 vector ties the query exactly, so the unfiltered top-4
    // holds only tag-1 rows and post-filtering returns nothing
    val e = emb(
      0L -> Seq(1f, 0f),
      1L -> Seq(1f, 0f), 3L -> Seq(1f, 0f), 5L -> Seq(1f, 0f), 7L -> Seq(1f, 0f),
      2L -> Seq(0f, 1f),  // tag 0, cos 0
      4L -> Seq(1f, 1f))  // tag 0, cos ≈ 0.7071
    val out = Similarity.filteredTopK(e, nQueries = 1, k = 2, nTags = 2, overfetch = 2)
      .orderBy("rank").collect()
    assert(out.map(r => (r.getAs[Long]("rank"), r.getAs[Long]("neighbor_id"),
      r.getAs[Boolean]("post_hit"))).toSeq == Seq((1L, 4L, false), (2L, 2L, false)))
    assert(out(0).getAs[Double]("sim") == 0.7071)
  }

  test("filteredTopK: a tag with fewer than k corpus rows returns fewer ranks, never sentinel fills") {
    val e = emb(
      0L -> Seq(1f, 0f),
      1L -> Seq(1f, 0f),   // tag 1
      2L -> Seq(1f, 0.1f)) // tag 0 — the only same-tag candidate
    val out = Similarity.filteredTopK(e, nQueries = 1, k = 2, nTags = 2, overfetch = 2)
      .collect()
    assert(out.length == 1)
    assert(out(0).getAs[Long]("neighbor_id") == 2L)
    assert(out(0).getAs[Boolean]("post_hit"))
  }
}
