package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionFixture

/** Wave 101: binned ROC/AUC, converting journey paths. */
class Wave101Spec extends AnyFunSuite {
  lazy val spark = SparkSessionFixture.spark

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  test("rocBins: perfect separation gives AUC 1e6; points are cumulative from the top bin") {
    import spark.implicits._
    // w = (1,0,0,0): score = x1. positives at x1=400 (bin 9 after scaling),
    // negatives at x1=-400 (bin 0). sMax=400 → scale=1, half=500:
    // p_pm(pos) = 900 → bin 9; p_pm(neg) = 100 → bin 1
    val feats = Seq(
      (1L, 1L, 400L, 0L, 0L, 0L), (2L, 1L, 400L, 0L, 0L, 0L),
      (3L, -1L, -400L, 0L, 0L, 0L), (4L, -1L, -400L, 0L, 0L, 0L))
      .toDF("doc_id", "y", "x1", "x2", "x3", "x4")
    val out = Classifier.rocBins(feats, (1L, 0L, 0L, 0L)).orderBy("thr_bin")
      .collect()
    assert(out.length == 2)
    val byBin = out.map(r => r.getAs[Long]("thr_bin") ->
      (r.getAs[Long]("tp"), r.getAs[Long]("fp"), r.getAs[Long]("tpr_pm"),
        r.getAs[Long]("fpr_pm"), r.getAs[Long]("auc_micro"))).toMap
    // bin 9 (high threshold): tp=2 fp=0 → (1000, 0); bin 1: tp=2 fp=2
    assert(byBin(9L) == (2L, 0L, 1000L, 0L, 1000000L))
    assert(byBin(1L) == (2L, 2L, 1000L, 1000L, 1000000L))
  }

  test("rocBins: useless classifier (all scores equal) gives AUC 500000") {
    import spark.implicits._
    // all scores 0 → one bin at 500; single ROC point (1000,1000);
    // trapezoid from (0,0): 1000·(1000+0) // 2 = 500000
    val feats = Seq(
      (1L, 1L, 0L, 0L, 0L, 0L), (2L, -1L, 0L, 0L, 0L, 0L))
      .toDF("doc_id", "y", "x1", "x2", "x3", "x4")
    val out = Classifier.rocBins(feats, (1L, 0L, 0L, 0L)).collect()
    assert(out.length == 1)
    assert(out(0).getAs[Long]("auc_micro") == 500000L)
  }

  test("conversionPaths: hand journeys — rollup, direct-conversion empty path, top-k ties") {
    import spark.implicits._
    // u0: click→purchase; u1: click (no purchase); u2: view→click→purchase;
    // u3: purchase only (direct, path ''); u4: view only
    val events = Seq(
      (ts(0L), 0L, 0L, "click", 1.0), (ts(10L), 0L, 1L, "purchase", 1.0),
      (ts(0L), 1L, 2L, "click", 1.0),
      (ts(0L), 2L, 3L, "view", 1.0), (ts(10L), 2L, 4L, "click", 1.0),
      (ts(20L), 2L, 5L, "purchase", 1.0),
      (ts(0L), 3L, 6L, "purchase", 1.0),
      (ts(0L), 4L, 7L, "view", 1.0))
      .toDF("ts", "user_id", "event_id", "event_type", "value")
    val out = Relational.conversionPaths(events).collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_users"),
        r.getAs[Long]("n_conv"), r.getAs[Long]("conv_pm")))
    // click: 2 users (u0 conv, u1 not) → 500pm; the rest 1 user each;
    // ties on n_users=1 order by path asc: "" < "view" < "view>click"
    assert(out.toSeq == Seq(
      ("click", 2L, 1L, 500L),
      ("", 1L, 1L, 1000L),
      ("view", 1L, 0L, 0L),
      ("view>click", 1L, 1L, 1000L)))
  }

  test("conversionPaths: sequences cap at maxSteps and truncate at first purchase") {
    import spark.implicits._
    // u5: 10 views then purchase → path = 8 views; u6: click, purchase,
    // then more clicks — path is just "click"
    val u5 = (0L until 10L).map(i => (ts(i), 5L, 100L + i, "view", 1.0)) :+
      ((ts(50L), 5L, 120L, "purchase", 1.0))
    val u6 = Seq((ts(0L), 6L, 200L, "click", 1.0),
      (ts(1L), 6L, 201L, "purchase", 1.0),
      (ts(2L), 6L, 202L, "click", 1.0), (ts(3L), 6L, 203L, "click", 1.0))
    val events = (u5 ++ u6).toDF("ts", "user_id", "event_id", "event_type", "value")
    val out = Relational.conversionPaths(events).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_conv")).toMap
    assert(out == Map(
      Seq.fill(8)("view").mkString(">") -> 1L,
      "click" -> 1L))
  }
}
