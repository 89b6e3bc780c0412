package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionFixture

/** Wave 98: Markov removal-effect attribution, discounted LTV cohorts. */
class Wave98Spec extends AnyFunSuite {
  lazy val spark = SparkSessionFixture.spark

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  test("markovAttribution: hand chain — absorption probs and removal effects") {
    import spark.implicits._
    // journeys: u0 click→conv, u1 click→null, u2 view→click→conv,
    // u3 direct conv, u4 view→null. Hand-iterated fixed point:
    // p_base = 599999; removing click → 200000, removing view → 466666
    val events = Seq(
      (ts(0L), 0L, 0L, "click", 1.0), (ts(10L), 0L, 1L, "purchase", 1.0),
      (ts(0L), 1L, 2L, "click", 1.0),
      (ts(0L), 2L, 3L, "view", 1.0), (ts(10L), 2L, 4L, "click", 1.0),
      (ts(20L), 2L, 5L, "purchase", 1.0),
      (ts(0L), 3L, 6L, "purchase", 1.0),
      (ts(0L), 4L, 7L, "view", 1.0))
      .toDF("ts", "user_id", "event_id", "event_type", "value")
    val out = Relational.markovAttribution(events).orderBy("channel").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      "click" -> (599999L, 200000L, 399999L),
      "view" -> (599999L, 466666L, 133333L)))
  }

  test("markovAttribution: journey truncates at FIRST purchase; event_id breaks ts ties") {
    import spark.implicits._
    // u6: click, purchase, view, purchase — the view AFTER conversion must
    // not become a channel; same-ts events order by event_id
    val events = Seq(
      (ts(0L), 6L, 10L, "click", 1.0), (ts(0L), 6L, 11L, "purchase", 1.0),
      (ts(5L), 6L, 12L, "view", 1.0), (ts(9L), 6L, 13L, "purchase", 1.0))
      .toDF("ts", "user_id", "event_id", "event_type", "value")
    val out = Relational.markovAttribution(events).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getString(0) == "click")
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) ==
      (1000000L, 0L, 1000000L))
  }

  test("ltvCohorts: gamma chain discounts by whole days since first event") {
    import spark.implicits._
    // u0 (cohort 0): purchases $10 at d0 and d2 → 1000·1e6 + 1000·902500
    // → ltv = 1902 (floor of 1902.5); u1 (cohort 1): no purchases
    val events = Seq(
      (ts(0L), 0L, "signup", 0.0),
      (ts(5L), 0L, "purchase", 10.00),
      (ts(86400L * 2), 0L, "purchase", 10.00),
      (ts(86400L), 1L, "view", 3.00))
      .toDF("ts", "user_id", "event_type", "value")
    val out = Relational.ltvCohorts(events).orderBy("cohort_day").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((0L, 1L, 2000L, 1902L), (1L, 1L, 0L, 0L)))
  }

  test("ltvCohorts: day offsets cap at the end of the gamma chain") {
    import spark.implicits._
    // purchase 200 days after the first event uses g_63 = the capped tail
    val g63 = Iterator.iterate(1000000L)(g => g * 950L / 1000L)
      .drop(63).next()
    val events = Seq(
      (ts(0L), 0L, "signup", 0.0),
      (ts(86400L * 200), 0L, "purchase", 100.00))
      .toDF("ts", "user_id", "event_type", "value")
    val r = Relational.ltvCohorts(events).collect()(0)
    assert(r.getLong(2) == 10000L)
    assert(r.getLong(3) == 10000L * g63 / 1000000L)
  }
}
