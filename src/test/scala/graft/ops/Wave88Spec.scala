package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionFixture

/** Wave 88: graded-relevance retrieval eval (nDCG@k over phrase-graded
  * judgments), plus the frozen discount table's defining law. */
class Wave88Spec extends AnyFunSuite {
  lazy val spark = SparkSessionFixture.spark

  test("discount table IS floor(1e6/log2(i+1)) — literals match the law") {
    Retrieval.NdcgDiscU.zipWithIndex.foreach { case (d, i0) =>
      val i = i0 + 1
      val expect = (1e6 / (math.log(i + 1) / math.log(2))).toLong
      assert(d == expect, s"rank $i: literal $d != recomputed $expect")
    }
    assert(Retrieval.NdcgDiscU == Retrieval.NdcgDiscU.sorted.reverse,
      "discounts must decrease with rank")
  }

  test("ndcg: hand-computed grades and ladder on a tiny corpus") {
    import spark.implicits._
    // query 0 = "x y z"; grades: all-terms=1, +"x y"=1, +"y z"=1
    //  d0: "x y z"         → rel 3 (all terms + both bigrams)
    //  d1: "x y q z"       → rel 2 (all terms + bigram "x y")
    //  d2: "z q x q y"     → rel 1 (all terms, no bigrams)
    //  d3: "x q q"         → rel 0 (not judged)
    //  d4: "y z"           → rel 1 ("y z" bigram, missing term x → 0+0+1)
    val docs = Seq(
      (0L, "x y z"), (1L, "x y q z"), (2L, "z q x q y"),
      (3L, "x q q"), (4L, "y z")).toDF("doc_id", "text")
    val queries = Seq((0L, "x y z")).toDF("query_id", "qtext")
    val out = Retrieval.ndcgEval(docs, queries, k = 10).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getAs[Long]("n_judged") == 4L)
    // ideal ladder: rels sorted desc = 3,2,1,1 → IDCG =
    //   7·disc(1) + 3·disc(2) + 1·disc(3) + 1·disc(4)
    val D = Retrieval.NdcgDiscU
    val idcg = 7 * D(0) + 3 * D(1) + 1 * D(2) + 1 * D(3)
    assert(r.getAs[Long]("idcg_u") == idcg)
    // DCG: gains follow the BM25 ranking joined to rel (rank from the
    // actual run), but the metric's bounds must hold regardless
    val ndcg = r.getAs[Long]("ndcg_pm")
    assert(ndcg >= 0 && ndcg <= 1000)
    // the ranked list covers all 4 judged docs (k=10 > pool), so DCG uses
    // every judged gain exactly once → DCG equals IDCG iff the ranking is
    // ideal; either way DCG ≤ IDCG and > 0 here
    val dcg = r.getAs[Long]("dcg_u")
    assert(dcg > 0 && dcg <= idcg)
  }

  test("hard negatives: positive is best phrase hit, negatives skip it") {
    import spark.implicits._
    val docs = Seq(
      (0L, "x y z"),        // rel 3 — the positive
      (1L, "x y q z"),      // rel 2
      (2L, "z q x q y"),    // rel 1 — a hard negative (all terms, no phrase)
      (3L, "x x x q q"),    // rel 0 — unigram-heavy hard negative
      (4L, "y z"),          // rel 1
      (5L, "q w e")).toDF("doc_id", "text")
    val queries = Seq((0L, "x y z")).toDF("query_id", "qtext")
    val out = Retrieval.bm25HardNegatives(docs, queries, kCand = 10, kNeg = 3)
      .orderBy("neg_ord").collect()
    assert(out.length == 3)
    val posDoc = out(0).getAs[Long]("pos_doc_id")
    assert(posDoc == 0L || posDoc == 1L) // whichever rel>=2 doc BM25 ranks higher
    val negs = out.map(_.getAs[Long]("neg_doc_id")).toSet
    assert(negs.subsetOf(Set(2L, 3L, 4L)), s"negatives must be rel<=1 docs: $negs")
    assert(!negs.contains(posDoc) && !negs.contains(1L),
      "rel>=2 docs can never be negatives")
    // neg ranks strictly increase with neg_ord (rank-ordered mining)
    val ranks = out.map(_.getAs[Int]("neg_rank"))
    assert(ranks.sameElements(ranks.sorted))
  }

  test("ndcg: perfect ranking scores exactly 1000 permille") {
    import spark.implicits._
    // single judged doc → any ranking that retrieves it is ideal
    val docs = Seq(
      (0L, "x y z"), (1L, "q w e"), (2L, "r t u")).toDF("doc_id", "text")
    val queries = Seq((0L, "x y z")).toDF("query_id", "qtext")
    val r = Retrieval.ndcgEval(docs, queries, k = 10).collect()(0)
    assert(r.getAs[Long]("n_judged") == 1L)
    assert(r.getAs[Long]("ndcg_pm") == 1000L)
  }
}
