package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionFixture

/** Wave 105: sequential experiment monitoring, time-to-convert. */
class Wave105Spec extends AnyFunSuite {
  lazy val spark = SparkSessionFixture.spark

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  test("sequentialMonitor: span-proportional looks, cumulative counts, no false cross") {
    import spark.implicits._
    // span [0,99] → look = s*5 div 100; arm0 purchase at s=0 (look 0),
    // arm1 purchase at s=99 (look 4)
    val events = Seq(
      (ts(0L), 0L, "purchase", 1.0), (ts(99L), 1L, "purchase", 1.0))
      .toDF("ts", "user_id", "event_type", "value")
    val out = Relational.sequentialMonitor(events).orderBy("look").collect()
      .map(r => (r.getAs[Long]("look"), r.getAs[Long]("n_a"),
        r.getAs[Long]("n_b"), r.getAs[Long]("z2_micro"),
        r.getAs[Boolean]("cross")))
    assert(out.toSeq == Seq(
      (0L, 1L, 0L, 1000000L, false),
      (4L, 1L, 1L, 0L, false)))
  }

  test("sequentialMonitor: a one-sided burst crosses the Pocock bound at the first look") {
    import spark.implicits._
    val burst = (0L until 30L).map(u => (ts(u % 20), u * 2, "purchase", 1.0))
    val late = Seq((ts(99L), 1L, "purchase", 1.0))
    val events = (burst ++ late).toDF("ts", "user_id", "event_type", "value")
    val out = Relational.sequentialMonitor(events).orderBy("look").collect()
      .map(r => (r.getAs[Long]("look"), r.getAs[Long]("n_a"),
        r.getAs[Long]("n_b"), r.getAs[Long]("z2_micro"),
        r.getAs[Boolean]("cross")))
    // look 0: 30 vs 0 → 900e6/30 = 30e6 > 5822569; look 4 carries forward
    assert(out.toSeq == Seq(
      (0L, 30L, 0L, 30000000L, true),
      (4L, 30L, 1L, 27129032L, true)))
  }

  test("timeToConvert: bucket boundaries, direct converts at delay 0, cumulative permille") {
    import spark.implicits._
    val events = Seq(
      (ts(0L), 0L, "view", 1.0), (ts(1800L), 0L, "purchase", 1.0),
      (ts(0L), 1L, "view", 1.0), (ts(100000L), 1L, "purchase", 1.0),
      (ts(0L), 2L, "view", 1.0), // never converts
      (ts(0L), 3L, "purchase", 1.0)) // purchase IS the first event
      .toDF("ts", "user_id", "event_type", "value")
    val out = Relational.timeToConvert(events).orderBy("bucket").collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_users"),
        r.getAs[Long]("cum_users"), r.getAs[Long]("cum_pm")))
    assert(out.toSeq == Seq(
      ("a_1h", 2L, 2L, 666L),
      ("d_7d", 1L, 3L, 1000L)))
  }
}
