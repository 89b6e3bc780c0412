package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionFixture

/** Wave 99: reciprocal-rank fusion of lexical retrieval runs. */
class Wave99Spec extends AnyFunSuite {
  lazy val spark = SparkSessionFixture.spark

  test("rrfFuse: hand credits — overlap doc wins, ties break by doc_id") {
    import spark.implicits._
    val r1 = Seq((0L, 10L, 1), (0L, 11L, 2)).toDF("query_id", "doc_id", "rank")
    val r2 = Seq((0L, 11L, 1), (0L, 12L, 2)).toDF("query_id", "doc_id", "rank")
    val out = Retrieval.rrfFuse(Seq(r1, r2), k = 10).orderBy("fused_rank")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rrf_micro"),
        r.getAs[Long]("n_runs"), r.getAs[Int]("fused_rank")))
    // doc 11: 1e6//62 + 1e6//61 = 16129 + 16393 = 32522 (both runs);
    // doc 10: 16393; doc 12: 16129
    assert(out.toSeq == Seq(
      (11L, 32522L, 2L, 1), (10L, 16393L, 1L, 2), (12L, 16129L, 1L, 3)))
  }

  test("tfTopK: plain tf sums, doc_id tie-break, k bound") {
    import spark.implicits._
    val docs = Seq((1L, "a a b"), (2L, "a b b c"), (3L, "z z z"))
      .toDF("doc_id", "text")
    val q = Seq((0L, "a c")).toDF("query_id", "qtext")
    val out = Retrieval.tfTopK(docs, q, k = 2).orderBy("rank").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("score_micro"),
        r.getAs[Int]("rank")))
    // d1: tf(a)=2 → 2; d2: tf(a)+tf(c)=2 → tie, doc_id asc wins; d3 absent
    assert(out.toSeq == Seq((1L, 2L, 1), (2L, 2L, 2)))
  }

  test("rrf end-to-end: fused list is k-bounded and every row's credit is recomputable") {
    import spark.implicits._
    val docs = (0L until 40L).map(i =>
      (i, if (i % 3 == 0) "scan table fast scan" else "other words here"))
      .toDF("doc_id", "text")
    val q = Seq((0L, "table scan fast")).toDF("query_id", "qtext")
    val b = Retrieval.bm25TopK(docs, q, 10).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("rank")).toMap
    val t = Retrieval.tfTopK(docs, q, 10).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("rank")).toMap
    val fused = Retrieval.rrfFuse(Seq(
      Retrieval.bm25TopK(docs, q, 10), Retrieval.tfTopK(docs, q, 10)), k = 10)
      .collect()
    assert(fused.length <= 10 && fused.nonEmpty)
    fused.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val expect = b.get(id).map(rk => 1000000L / (60L + rk)).getOrElse(0L) +
        t.get(id).map(rk => 1000000L / (60L + rk)).getOrElse(0L)
      assert(r.getAs[Long]("rrf_micro") == expect)
      val expectRuns = (b.contains(id), t.contains(id)) match {
        case (true, true) => 2L
        case (false, false) => 0L
        case _ => 1L
      }
      assert(r.getAs[Long]("n_runs") == expectRuns)
    }
  }
}
