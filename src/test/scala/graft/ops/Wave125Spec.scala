package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionFixture

/** Wave 125: truncation curve, feature-hash audit, Hamilton allocation. */
class Wave125Spec extends AnyFunSuite {
  lazy val spark = SparkSessionFixture.spark

  test("truncationCurve: hand token masses at every cap") {
    import spark.implicits._
    // docs with 10, 40, 100, 300 tokens (total 450)
    val docs = Seq(10, 40, 100, 300)
      .map(n => Seq.fill(n)("w").mkString(" ")).toDF("text")
    val out = PipelinePlan.truncationCurve(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5))).toMap
    // cap 32: truncated 3, kept 10+32·3=106 → 235pm; intact 250pm
    assert(out(32L) == ((3L, 250L, 106L, 235L)))
    // cap 64: truncated 2, kept 10+40+64+64=178 → 395pm; intact 500pm
    assert(out(64L) == ((2L, 500L, 178L, 395L)))
    // cap 128: truncated 1, kept 10+40+100+128=278 → 617pm
    assert(out(128L) == ((1L, 750L, 278L, 617L)))
    // cap 256: truncated 1, kept 10+40+100+256=406 → 902pm
    assert(out(256L) == ((1L, 750L, 406L, 902L)))
  }

  test("featureHashAudit: tiny bucket space forces collisions; counts add up") {
    import spark.implicits._
    val docs = Seq("aa bb cc dd ee ff gg hh", "aa aa bb").toDF("text")
    // 8 distinct words, 2 buckets → heavy collisions guaranteed
    val r = PipelinePlan.featureHashAudit(docs, buckets = 2L)
      .collect().head
    assert(r.getLong(0) == 8L)                        // vocab
    assert(r.getLong(1) <= 2L && r.getLong(1) >= 1L)  // occupied
    // with 8 words in ≤2 buckets every occupied bucket collides
    assert(r.getLong(3) == 8L && r.getLong(4) == 1000L)
    assert(r.getLong(5) == 1000L)
  }

  test("featureHashAudit: huge bucket space → zero collisions") {
    import spark.implicits._
    val docs = Seq("alpha beta gamma delta").toDF("text")
    val r = PipelinePlan.featureHashAudit(docs, buckets = 1L << 30)
      .collect().head
    assert(r.getLong(2) == 0L && r.getLong(4) == 0L && r.getLong(5) == 0L)
  }

  test("hamiltonAllocation: exact seats, largest remainders win the leftovers") {
    import spark.implicits._
    // counts: a=5, b=3, c=2 over slots 7 → quotas 3.5, 2.1, 1.4 →
    // base 3,2,1 (sum 6), leftover 1 → largest remainder: a (.5)
    val docs = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(2)("c"))
      .toDF("lang")
    val out = PipelinePlan.hamiltonAllocation(docs, slots = 7L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(4), r.getLong(5))).toMap
    assert(out("a") == ((3L, 1L, 4L)))
    assert(out("b") == ((2L, 0L, 2L)))
    assert(out("c") == ((1L, 0L, 1L)))
  }

  test("hamiltonAllocation: allocations always sum to slots exactly") {
    import spark.implicits._
    val docs = (0 until 97).map(i => s"lang${i % 7}").toDF("lang")
    val out = PipelinePlan.hamiltonAllocation(docs, slots = 100L).collect()
    assert(out.map(_.getLong(5)).sum == 100L)
    assert(out.map(_.getLong(1)).sum == 97L)
  }
}
