package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionFixture

/** Wave 90: classifier calibration bins, empirical-Bayes CTR smoothing. */
class Wave90Spec extends AnyFunSuite {
  lazy val spark = SparkSessionFixture.spark

  test("calibration: hand-computed bins with unit weights") {
    import spark.implicits._
    // w = (1,0,0,0) → score = x1. Rows: x1 = 100 (y=1), 500 (y=-1),
    // 1000 (y=1). sMax = 1000 → scale = 2, half = 1000.
    // p_pm = (clamp(s) + 1000) div 2 → 550, 750, 1000; bins 5, 7, 9 (10 capped)
    val feats = Seq(
      (0L, 1L, 100L, 0L, 0L, 0L),
      (1L, -1L, 500L, 0L, 0L, 0L),
      (2L, 1L, 1000L, 0L, 0L, 0L))
      .toDF("doc_id", "y", "x1", "x2", "x3", "x4")
    val out = Classifier.calibrationBins(feats, (1L, 0L, 0L, 0L))
      .orderBy("bin").collect()
    val m = out.map(r => r.getAs[Long]("bin") ->
      (r.getAs[Long]("n"), r.getAs[Long]("mean_pred_pm"),
        r.getAs[Long]("obs_pos_pm"), r.getAs[Long]("gap_pm"))).toMap
    assert(m.keySet == Set(5L, 7L, 9L))
    assert(m(5L) == (1L, 550L, 1000L, 450L))
    assert(m(7L) == (1L, 750L, 0L, 750L))
    assert(m(9L) == (1L, 1000L, 1000L, 0L))
  }

  test("calibration: negative margins clamp into bin 0, never error") {
    import spark.implicits._
    // scores −2000 and +2000: scale = 4, clamp to ±2000 → p_pm 0 / 1000
    val feats = Seq(
      (0L, -1L, -2000L, 0L, 0L, 0L),
      (1L, 1L, 2000L, 0L, 0L, 0L))
      .toDF("doc_id", "y", "x1", "x2", "x3", "x4")
    val out = Classifier.calibrationBins(feats, (1L, 0L, 0L, 0L))
      .orderBy("bin").collect()
    assert(out.map(_.getAs[Long]("bin")).toSeq == Seq(0L, 9L))
    assert(out(0).getAs[Long]("mean_pred_pm") == 0L)
    assert(out(1).getAs[Long]("mean_pred_pm") == 1000L)
  }

  test("ctr smoothing: sparse cohort shrinks to prior, dense keeps rate") {
    import spark.implicits._
    // cohorts (user_id % 40): cohort 0 = users 0/40 — 100 views 50 clicks;
    // cohort 1 = user 1 — 1 view 1 click. global p0 = 51*1000/101 = 504
    val rows =
      (1 to 100).map(i => (i.toLong, if (i % 2 == 0) 40L else 0L, "view")) ++
        (1 to 50).map(i => (1000L + i, 0L, "click")) ++
        Seq((2000L, 1L, "view"), (2001L, 1L, "click"))
    val events = rows.toDF("event_id", "user_id", "event_type")
    val out = Relational.ctrSmoothed(events, mPseudo = 100L, cohorts = 40)
      .collect().map(r => r.getAs[Long]("cohort") ->
        (r.getAs[Long]("views"), r.getAs[Long]("clicks"),
          r.getAs[Long]("raw_pm"), r.getAs[Long]("smoothed_pm"))).toMap
    assert(out(0L) == (100L, 50L, 500L, (50L * 1000 + 100 * 504) / 200))
    // sparse cohort: raw 1000, smoothed pulled nearly all the way to 504
    assert(out(1L)._3 == 1000L)
    assert(out(1L)._4 == (1L * 1000 + 100 * 504) / 101)
    // one observation against 100 pseudo-counts: the sparse cohort lands
    // within 5 permille of the prior despite a raw estimate of 1000
    assert(math.abs(out(1L)._4 - 504L) <= 5L)
  }
}
