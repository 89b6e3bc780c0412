package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionFixture

/** Wave 120: gate-cascade cost planner and serpentine shard balance. */
class Wave120Spec extends AnyFunSuite {
  lazy val spark = SparkSessionFixture.spark

  test("gateRates: hand corpus — each flag fires exactly as constructed") {
    import spark.implicits._
    val long = ("tok " * 50).trim                      // 50 tokens
    val docs = Seq(
      s"$long the a thing a query",                    // passes all
      "short doc query",                               // r1 (3 toks), r2, r3
      s"$long the a thing a thing",                    // r4 (no query)
      s"$long query thing the thing").toDF("text")     // r3 (no ' a ')
    val out = PipelinePlan.gateRates(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out("g1_short") == ((1L, 250L)))
    assert(out("g2_stopword") == ((10L, 250L)))
    assert(out("g3_article") == ((25L, 500L)))
    assert(out("g4_scan") == ((60L, 250L)))
  }

  test("gateCascadePlan: ordering by cost-to-kill and exact cost chain") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet").select("text")
    val rows = PipelinePlan.gateCascadePlan(docs).orderBy("rank_opt")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L))
    // ordering: ratio_micro ascending (ties impossible with distinct costs)
    assert(rows.map(_._5).toSeq == rows.map(_._5).sorted.toSeq)
    // replay the chain independently from (cost, reject) pairs
    var s = 1000L; var c = 0L
    rows.foreach { case (_, _, cost, rej, _, survBefore, cum) =>
      assert(survBefore == s)
      c += cost * s
      assert(cum == c)
      s = s * (1000L - rej) / 1000L
    }
  }

  test("shardBalance: serpentine placement equalizes 16..1 into 4 shards") {
    import spark.implicits._
    val docs = (1 to 16).map(i => (i.toLong, "x" * (17 - i)))
      .toDF("doc_id", "text")
    val out = PipelinePlan.shardBalance(docs, k = 4).orderBy("shard")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // 16+9+8+1 = 15+10+7+2 = 14+11+6+3 = 13+12+5+4 = 34 → skew 1000 each
    assert(out.toSeq == Seq(
      (0L, 4L, 34L, 1000L), (1L, 4L, 34L, 1000L),
      (2L, 4L, 34L, 1000L), (3L, 4L, 34L, 1000L)))
  }

  test("shardBalance: skew sums to ~k·1000 and ties break by doc_id") {
    import spark.implicits._
    val docs = (1 to 11).map(i => (i.toLong, "y" * (1 + i % 3)))
      .toDF("doc_id", "text")
    val out = PipelinePlan.shardBalance(docs, k = 3).collect()
    val total = out.map(_.getLong(2)).sum
    assert(out.map(_.getLong(1)).sum == 11L)
    val skews = out.map(r => r.getLong(2) * 3000 / total)
    assert(out.map(_.getLong(3)).toSet == skews.toSet)
    // determinism under equal sizes
    val again = PipelinePlan.shardBalance(docs, k = 3).collect()
      .map(_.toSeq).toSet
    assert(again == out.map(_.toSeq).toSet)
  }
}
