package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionFixture

/** Wave 104: cross-fit label-noise audit, per-segment uplift. */
class Wave104Spec extends AnyFunSuite {
  lazy val spark = SparkSessionFixture.spark

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  test("crossFitDisagreement: a planted label flip shows up as off-diagonal mass") {
    import spark.implicits._
    // fold 0 (even doc_id) clean: y matches sign(x1). fold 1 has doc 1
    // MILDLY mislabeled (y=-1, x1=+2). Hand-traced fits at round 6:
    // w0 = (28,0,0,0) (clean, converges round 1); w1 = (10,0,0,0) (the
    // noisy point shaves 2 per round but stays positive) — so fold 1
    // scored by w0 flags doc 1, and fold 0 scored by w1 stays clean.
    val feats = Seq(
      (0L, 1L, 10L, 0L, 0L, 0L), (2L, -1L, -10L, 0L, 0L, 0L),
      (4L, 1L, 8L, 0L, 0L, 0L),
      (1L, -1L, 2L, 0L, 0L, 0L), (3L, 1L, 12L, 0L, 0L, 0L),
      (5L, -1L, -10L, 0L, 0L, 0L))
      .toDF("doc_id", "y", "x1", "x2", "x3", "x4")
    val out = Classifier.crossFitDisagreement(feats)
      .orderBy("fold", "y", "pred").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq(
      (0L, -1L, -1L, 1L, 3L, 333L),
      (0L, 1L, 1L, 2L, 3L, 666L),
      (1L, -1L, -1L, 1L, 3L, 333L),
      (1L, -1L, 1L, 1L, 3L, 333L), // the planted flip, caught out-of-sample
      (1L, 1L, 1L, 1L, 3L, 333L)))
  }

  test("upliftBySegment: orthogonal strata, intent-to-treat zeros, exact milli uplift") {
    import spark.implicits._
    val base = (0L to 7L).map(u => (ts(u), u, "view", 1.0))
    val purchases = Seq(
      (ts(100L), 0L, "purchase", 1.00), (ts(100L), 1L, "purchase", 3.00),
      (ts(100L), 3L, "purchase", 2.00))
    val events = (base ++ purchases)
      .toDF("ts", "user_id", "event_type", "value")
    val out = Relational.upliftBySegment(events).orderBy("segment").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq(
      (0L, 1L, 1L, 100000L, 300000L, 200000L),
      (1L, 1L, 1L, 0L, 200000L, 200000L),
      (2L, 1L, 1L, 0L, 0L, 0L),
      (3L, 1L, 1L, 0L, 0L, 0L)))
  }
}
