package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionFixture

/** Wave 70: simhash-vs-jaccard eval, partition modularity. */
class Wave70Spec extends AnyFunSuite {

  lazy val spark = SparkSessionFixture.spark

  test("simhash eval: identical pair is TP, disjoint pair is neither") {
    import spark.implicits._
    val a = (1 to 40).map(i => s"shared sentence alpha beta gamma$i").mkString(" ")
    val b = (1 to 40).map(i => s"different corpus entirely zulu$i xray").mkString(" ")
    val df = Seq((1L, a), (2L, a), (3L, b)).toDF("doc_id", "text")
    val r = Dedup.simhashEval(df).collect()(0)
    // (1,2) identical: jaccard 1.0 AND hamming 0 → exactly one TP, no FP
    assert(r.getLong(2) == 1L && r.getLong(3) == 0L && r.getLong(4) == 0L)
    assert(r.getLong(5) == 1000L && r.getLong(6) == 1000L)
  }

  test("modularity: perfect communities positive, anti-communities negative") {
    import spark.implicits._
    // two disjoint triangles, partition = the triangles → strongly positive
    val tri2 = Seq((0L,1L),(1L,2L),(0L,2L),(10L,11L),(11L,12L),(10L,12L)).toDF("src","dst")
    val goodPart = Seq(0L,1L,2L,10L,11L,12L).map(i => (i, i / 10)).toDF("id","cluster")
    val good = Graph.modularity(tri2, goodPart).collect()(0)
    assert(good.getLong(1) > 0L, s"community partition must score positive: $good")
    // same graph, partition slicing ACROSS the triangles → negative
    val badPart = Seq(0L,1L,2L,10L,11L,12L).map(i => (i, i % 3)).toDF("id","cluster")
    val bad = Graph.modularity(tri2, badPart).collect()(0)
    assert(bad.getLong(1) < good.getLong(1))
    // q_den = 4m² with m=6
    assert(good.getLong(0) == 6L && good.getLong(2) == 144L)
  }
}
