package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionFixture

/** Wave 109: RFM segmentation. */
class Wave109Spec extends AnyFunSuite {
  lazy val spark = SparkSessionFixture.spark

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  test("rfmSegments: hand segments on the pinned boundaries") {
    import spark.implicits._
    val day = 86400L
    // corpus end = 20d. u0: active today, 50 events, $150 → 333.
    // u1: last at 10d (recency 10d → 1), 2 events, one $15 purchase → 112.
    // u2: last at 19d (1d → 3), 1 event, no purchase → 311.
    val u0 = (0 until 49).map(i => (ts(20L * day - i), 0L, "view", 1.0)) :+
      ((ts(20L * day), 0L, "purchase", 150.00))
    val u1 = Seq((ts(10L * day), 1L, "view", 1.0),
      (ts(10L * day - 5), 1L, "purchase", 15.00))
    val u2 = Seq((ts(19L * day), 2L, "view", 1.0))
    val events = (u0 ++ u1 ++ u2).toDF("ts", "user_id", "event_type", "value")
    val out = Relational.rfmSegments(events).orderBy("segment").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (112L, 1L, 1500L, 333L),
      (311L, 1L, 0L, 333L),
      (333L, 1L, 15000L, 333L)))
  }

  test("rfmSegments: boundary values land on the upper bucket (>= semantics)") {
    import spark.implicits._
    // exactly 10 events, exactly $10 purchase, last event 7 days back →
    // R2 F2 M2 = 222
    val day = 86400L
    val u = (0 until 9).map(i => (ts(i.toLong), 5L, "view", 1.0)) :+
      ((ts(0L), 5L, "purchase", 10.00))
    // a second user pins corpus end 7 days after u's last event
    val pin = Seq((ts(7L * day), 6L, "view", 1.0))
    val events = (u ++ pin).toDF("ts", "user_id", "event_type", "value")
    val out = Relational.rfmSegments(events).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(222L) == 1L) // u
    assert(out(311L) == 1L) // the pin user: recent, 1 event, no purchase
  }
}
