package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionFixture

/** Wave 126: deterministic source interleave and rank-blend quality. */
class Wave126Spec extends AnyFunSuite {
  lazy val spark = SparkSessionFixture.spark

  test("trainInterleave: strict round-robin while all sources active") {
    import spark.implicits._
    val docs = (0L until 12L).map(i => (i, s"s${i % 3}"))
      .toDF("doc_id", "source")
    val out = PipelinePlan.trainInterleave(docs, take = 12)
      .orderBy("position").collect()
      .map(r => (r.getLong(0), r.getString(2)))
    // 4 docs per source → position order cycles s0,s1,s2 four times
    assert(out.map(_._2).toSeq ==
      Seq("s0", "s1", "s2", "s0", "s1", "s2", "s0", "s1", "s2",
        "s0", "s1", "s2"))
    // no repeats within any window of 3 while all sources live
    out.map(_._2).sliding(3).foreach(w => assert(w.toSet.size == 3))
  }

  test("trainInterleave: exhausted source drops out of the tail") {
    import spark.implicits._
    val docs = Seq((0L, "a"), (1L, "a"), (2L, "a"), (3L, "b"))
      .toDF("doc_id", "source")
    val out = PipelinePlan.trainInterleave(docs, take = 4)
      .orderBy("position").collect().map(_.getString(2)).toSeq
    // round 1: a,b ; rounds 2,3: a alone
    assert(out == Seq("a", "b", "a", "a"))
  }

  test("qualityRankBlend: hand ranks inside one language") {
    import spark.implicits._
    // 3 en docs with strictly increasing signals on all three axes:
    // tokens 2/3/4, all-distinct words, periods 0/1/2
    val docs = Seq(
      (0L, "aa bb", "en"),
      (1L, "aa bb. cc", "en"),
      (2L, "aa bb. cc. dd", "en")).toDF("doc_id", "text", "lang")
    val out = PipelinePlan.qualityRankBlend(docs).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // ranks 0/1/2 of n=3 → 0, 500, 1000 pm on tok and period axes;
    // distinct ratio is 1000 for all → ties by doc_id → 0,500,1000
    assert(out(0) == ((0L, 0L, 0L, 0L, 0L)))
    assert(out(1) == ((1L, 500L, 500L, 500L, 500L)))
    assert(out(2) == ((2L, 1000L, 1000L, 1000L, 1000L)))
  }

  test("qualityRankBlend: singleton language guards the n−1 divisor") {
    import spark.implicits._
    val docs = Seq((5L, "only doc here.", "zz")).toDF("doc_id", "text",
      "lang")
    val r = PipelinePlan.qualityRankBlend(docs).collect().head
    assert((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)) ==
      ((0L, 0L, 0L, 0L)))
  }
}
