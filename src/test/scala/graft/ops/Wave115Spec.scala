package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionFixture

/** Wave 115: PMI collocation mining (decimal-exact lift) and
  * blocked-Levenshtein title near-dup. */
class Wave115Spec extends AnyFunSuite {
  lazy val spark = SparkSessionFixture.spark

  test("pmiCollocations: hand corpus — lift values and (lift, w1, w2) order") {
    import spark.implicits._
    val docs = Seq("a b a b a c").toDF("text")
    // tokens a,b,a,b,a,c → N=6; c_a=3 c_b=2 c_c=1
    // pairs: (a,b)×2 (b,a)×2 (a,c)×1
    val out = TextStats.pmiCollocations(docs, minPair = 1, minWord = 1, k = 10)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq(
      ("a", "b", 2L, 3L, 2L, 2000000L),   // 1e6·2·6/(3·2)
      ("a", "c", 1L, 3L, 1L, 2000000L),   // 1e6·1·6/(3·1) — w2 tie-break
      ("b", "a", 2L, 2L, 3L, 2000000L)))  // 1e6·2·6/(2·3)
  }

  test("pmiCollocations: thresholds drop rare pairs and rare words") {
    import spark.implicits._
    val docs = Seq(("x y x y x y x y x y z q")).toDF("text")
    // (x,y)×5 passes minPair=5; (y,x)×4, (y,z)×1, (z,q)×1 dropped;
    // minWord=5: x=5 y=5 pass, z=1 q=1 would drop any surviving pair
    val out = TextStats.pmiCollocations(docs, minPair = 5, minWord = 5, k = 10)
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getString(0), r.getString(1), r.getLong(2)) == ("x", "y", 5L))
    // N=12, lift = 1e6·5·12/(5·5) = 2_400_000
    assert(r.getLong(5) == 2400000L)
  }

  test("lift arithmetic stays exact beyond BIGINT range (DECIMAL(38,0) path)") {
    // web-scale counts: N=1e12, c_pair=1e9, c1=c2=1e10 —
    // numerator 1e6·1e9·1e12 = 1e27 overflows int64 by 9 digits;
    // exact lift = 1e27 / 1e20 = 1e7
    val out = spark.sql(
      """SELECT CAST((CAST(1000000 AS DECIMAL(38,0))
        |  * CAST(1000000000 AS DECIMAL(38,0))
        |  * CAST(1000000000000 AS DECIMAL(38,0)))
        | div (CAST(10000000000 AS DECIMAL(38,0))
        |  * CAST(10000000000 AS DECIMAL(38,0))) AS BIGINT)""".stripMargin)
      .collect().head.getLong(0)
    assert(out == 10000000L)
  }

  test("titleCorpus: first-7-word titles; mutation only at doc_id%41==3") {
    import spark.implicits._
    val docs = Seq(
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota"),
      (5L, "one two three four five six seven eight"),
      (44L, "ay bee cee dee ee eff gee")).toDF("doc_id", "text")
    val out = Dedup.titleCorpus(docs).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(out(3L) == "alpha beta gamma delta epsilon zeta eta")
    assert(out(44L) == "ay bee cee dee ee eff gee")
    // 44 % 41 = 3 → mutated too; 3 → mutated; 5 → not
    assert(out(500003L) == "Alpha beta gamma delta epsilon zeta et")
    assert(out(500044L) == "Ay bee cee dee ee eff ge")
    assert(!out.contains(500005L))
    assert(out.size == 5)
  }

  test("titleNearDup: planted mutation found at dist 2, natural near-title at dist 1, unrelated absent") {
    import spark.implicits._
    val docs = Seq(
      (3L, "alpha beta gamma delta epsilon zeta eta theta"),
      (10L, "spark table scan fast"),
      (11L, "spark table scan fest"),
      (20L, "completely unrelated content words here now")).toDF("doc_id", "text")
    val pairs = Dedup.titleNearDup(Dedup.titleCorpus(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs == Set((3L, 500003L, 2L), (10L, 11L, 1L)))
  }

  test("titleNearDup: block cap is deterministic — lowest (id mod 500000) survive") {
    import spark.implicits._
    // 5 same-prefix titles at pairwise dist ≤ 2; cap 3 keeps ids 1,2,3 only
    val docs = (1L to 5L).map(i => (i, s"prefix word number $i"))
      .toDF("doc_id", "text")
    val pairs = Dedup.titleNearDup(Dedup.titleCorpus(docs), maxBlock = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }
}
