package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionFixture

/** Wave 119: bootstrap CI and k-anonymity/l-diversity release gates. */
class Wave119Spec extends AnyFunSuite {
  lazy val spark = SparkSessionFixture.spark

  test("bootstrapCI: constant corpus → degenerate CI at the exact mean") {
    import spark.implicits._
    // every doc has exactly 4 tokens → every resample mean is 4000 milli
    val docs = (0L until 20L).map(i => (i, "w x y z")).toDF("doc_id", "text")
    val r = Sampling.bootstrapCI(docs, nReps = 40).collect().head
    assert(r.getLong(0) == 20L && r.getLong(1) == 40L)
    assert(r.getLong(2) == 4000L && r.getLong(3) == 4000L &&
      r.getLong(4) == 4000L)
  }

  test("bootstrapCI: CI brackets the point mean and is ordered") {
    import spark.implicits._
    val docs = (0L until 50L).map(i =>
      (i, Seq.fill((i % 7 + 1).toInt)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val r = Sampling.bootstrapCI(docs, nReps = 200).collect().head
    val (lo, med, hi) = (r.getLong(2), r.getLong(3), r.getLong(4))
    assert(lo <= med && med <= hi)
    // point mean: tokens i%7+1 over 50 docs → sum = 7*(1+..+7)+1*1? compute:
    val exact = (0L until 50L).map(i => i % 7 + 1).sum * 1000 / 50
    assert(lo < exact + 600 && hi > exact - 600)
    assert(hi - lo > 0) // non-degenerate spread for a varying corpus
  }

  test("bootstrapCI: deterministic across runs") {
    import spark.implicits._
    val docs = (0L until 30L).map(i =>
      (i, Seq.fill((i % 5 + 1).toInt)("t").mkString(" ")))
      .toDF("doc_id", "text")
    val a = Sampling.bootstrapCI(docs, nReps = 80).collect().head.toSeq
    val b = Sampling.bootstrapCI(docs, nReps = 80).collect().head.toSeq
    assert(a == b)
  }

  private def cust(rows: (Long, String, Int, Double, String)*) = {
    import spark.implicits._
    rows.toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal",
      "c_mktsegment")
  }

  test("kAnonymity: class sizes, diversity, and negative-balance bucketing") {
    val rows = cust(
      (1L, "a", 1, -500.00, "AUTO"),      // cents -50000 → bucket 0
      (2L, "b", 1, -400.00, "AUTO"),      // bucket 0, same segment
      (3L, "c", 1, 500.00, "AUTO"),       // cents 50000 → bucket 1
      (4L, "d", 1, 600.00, "STEEL"),      // bucket 1
      (5L, "e", 1, 700.00, "AUTO"),       // bucket 1
      (6L, "f", 1, 800.00, "STEEL"),      // bucket 1
      (7L, "g", 1, 900.00, "AUTO"))       // bucket 1 → k=5, l=2
    val out = Privacy.kAnonymity(rows).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getBoolean(4), r.getBoolean(5))).toMap
    assert(out((1L, 0L)) == ((2L, 1L, true, true)))   // k=2<5, l=1<2
    assert(out((1L, 1L)) == ((5L, 2L, false, false))) // k=5, l=2 → clean
  }

  test("releaseGate: verdict flips when a violating class exists") {
    val clean = cust((1L to 5L).map(k =>
      (k, s"n$k", 1, 100.0, if (k % 2 == 0) "AUTO" else "STEEL")): _*)
    val g1 = Privacy.releaseGate(clean).collect().head
    assert(g1.getLong(0) == 1L && g1.getBoolean(5))
    val dirty = cust(
      (1L, "a", 1, 100.0, "AUTO"), (2L, "b", 1, 100.0, "STEEL"),
      (3L, "c", 1, 100.0, "AUTO"), (4L, "d", 1, 100.0, "STEEL"),
      (5L, "e", 1, 100.0, "AUTO"),
      (6L, "lone", 2, 100.0, "AUTO"))  // nation 2: k=1, l=1
    val g2 = Privacy.releaseGate(dirty).collect().head
    assert(g2.getLong(0) == 2L && !g2.getBoolean(5))
    assert(g2.getLong(1) == 1L)        // k_min = 1
    assert(g2.getLong(3) == 1L)        // one row re-identifiable
  }
}
